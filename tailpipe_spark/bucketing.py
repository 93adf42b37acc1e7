"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Spark's
answer is bucketing: write both tables bucketed by the join key into the
session catalog (`bucketBy(n, key).sortBy(key).saveAsTable`), and a join
on that key becomes a zero-exchange SortMergeJoin — each task reads
bucket i of both sides. This module wraps that layout for engine tables
(the reference has no equivalent: DuckDB single-node never shuffles;
bucketing is the Spark-native translation of "co-locate by key").

Bucket count: pick ~(table_size / 256 MB) rounded to a power of two,
and the SAME count on both sides of an intended join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table in the Spark catalog."""
    w = df.write.bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.mode(mode).format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs Catalyst plans this with no Exchange on
    either side (verify with ``.explain`` — tests pin it)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
