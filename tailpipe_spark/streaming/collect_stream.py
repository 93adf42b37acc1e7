"""Structured Streaming ingest + windowed aggregation.

The reference's collection is incremental batch with persisted
per-partition state (SURVEY.md §1.1 'Stream'); the Spark-native
equivalent offers both:

- ``collect(...)`` (batch, tailpipe_spark.collect) with watermark state
  — the drop-in semantics match
- ``stream_collect`` here: ``readStream`` over a landing directory →
  the same mapping/enrichment plan → partitioned parquet sink with a
  checkpoint. Exactly-once per file, resumable from the checkpoint —
  the collection-state JSON generalized to Spark's own offset log.

Windowed aggregations use event-time watermarks so late data is bounded
and state is evicted — the 100 TB-stream answer to the reference's
"query after collect" model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tailpipe_spark.catalog import PARTITION_COLS, Catalog
from tailpipe_spark.config import PartitionConfig, TableConfig
from tailpipe_spark.enrich import enrich_tp, with_partition_columns


def stream_collect(
    spark: SparkSession,
    catalog: Catalog,
    table: TableConfig,
    partition: PartitionConfig,
    source_dir: str,
    source_schema: T.StructType,
    timestamp_source: str = "tp_timestamp",
    fmt: str = "json",
    trigger_available_now: bool = True,
):
    """Stream JSONL/CSV chunks from ``source_dir`` into the table.

    Returns the StreamingQuery. With ``trigger_available_now`` the query
    drains everything currently in the directory and stops — the
    incremental-batch collection mode of the reference; without it the
    stream runs continuously, picking up new chunk files as plugins
    drop them.
    """
    from tailpipe_spark.collect import apply_table_mapping

    reader = spark.readStream.schema(source_schema)
    src = reader.json(source_dir) if fmt == "json" else reader.csv(source_dir)

    df = (
        apply_table_mapping(src, table)
        if table.columns or table.map_fields != ["*"]
        else src
    )
    if timestamp_source != "tp_timestamp":
        df = df.withColumn("tp_timestamp", F.col(timestamp_source))
    if partition.filter:
        df = df.filter(F.expr(partition.filter))
    df = enrich_tp(df, table=table.name, partition=partition.name,
                   index_expr=partition.tp_index)
    # streaming append drops rows with null required timestamp (cannot
    # partition on null tp_year); the batch path reports+drops the same
    df = df.filter(F.col("tp_timestamp").isNotNull())
    df = with_partition_columns(df)

    # register the table in the manifest BEFORE the stream starts so
    # list_tables/register_views/schema checks see streaming tables too
    # (they previously bypassed the catalog; the checkpoint remains the
    # source of truth for stream progress)
    from tailpipe_spark.schema import to_type_string

    out_schema = {
        f.name: to_type_string(f.dataType)
        for f in df.schema.fields
        # layout columns stay out of the manifest, matching the batch
        # path (ensure_table sees the pre-partition-column schema there)
        if f.name not in ("tp_year", "tp_month")
    }
    catalog.ensure_table(table.name, out_schema)
    catalog.record_snapshot(
        "stream_start", {"table": table.name, "partition": partition.name}
    )

    checkpoint = f"{catalog.metadata_dir}/checkpoints/{table.name}.{partition.name}"
    w = (
        df.writeStream.format("parquet")
        .option("path", catalog.table_dir(table.name))
        .option("checkpointLocation", checkpoint)
        .partitionBy(*PARTITION_COLS)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "tp_timestamp",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time window aggregation with a watermark
    (works on both streaming and batch frames)."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(win.alias("w"), *(group_cols or []))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    key: str,
    ts_col: str = "tp_timestamp",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows via ``F.session_window`` — the
    streaming-native twin of operators.sessionize."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
