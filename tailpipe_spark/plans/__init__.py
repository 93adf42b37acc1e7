from tailpipe_spark.plans.pruning import time_range_to_partition_predicate

__all__ = ["time_range_to_partition_predicate"]
