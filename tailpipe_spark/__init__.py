"""tailpipe_spark — a PySpark-native log-analytics engine.

A from-scratch engine with the query and data-processing capabilities of
turbot/tailpipe (see SURVEY.md), re-expressed Spark-first:

- ingest: pluggable sources/formats (jsonl, delimited, regex, grok) →
  ``tp_*`` enrichment → hive-partitioned Parquet
  (tp_partition / tp_index / tp_year / tp_month)
- catalog: JSON manifest of tables, schemas, files, snapshots
- query: full Spark SQL surface over registered views, with CLI-style
  time/index/partition filters
- maintenance: compaction (overlap detect → time-ordered rewrite →
  small-file merge), delete, vacuum
- extras: dedup / similarity / text-analysis operators for large-scale
  training-data pipelines

Everything is DataFrame-declarative so Catalyst/AQE pick physical plans;
Python UDFs appear only where built-ins genuinely can't express the op.
"""

__version__ = "0.1.0"

from tailpipe_spark.catalog import Catalog
from tailpipe_spark.collect import collect, collect_incremental
from tailpipe_spark.compact import compact_table
from tailpipe_spark.config import (
    ColumnConfig,
    FormatConfig,
    PartitionConfig,
    SourceConfig,
    TableConfig,
)
from tailpipe_spark.session import build_session, load_tables, read_table, register_views

__all__ = [
    "Catalog",
    "ColumnConfig",
    "FormatConfig",
    "PartitionConfig",
    "SourceConfig",
    "TableConfig",
    "build_session",
    "collect",
    "collect_incremental",
    "compact_table",
    "load_tables",
    "read_table",
    "register_views",
    "__version__",
]
