"""Partitioned Parquet writer + range delete.

Physical layout = the reference's DuckLake partition key
``(tp_partition, tp_index, year(tp_timestamp), month(tp_timestamp))``
(reference: internal/database/ducklake_table.go:38-41), materialized as
hive columns tp_partition/tp_index/tp_year/tp_month.

Scale notes:
- appends go straight to partition dirs — no global shuffle; Spark
  writes one file per task per partition, and the compactor merges
  small files later (same split as the reference: fast ingest, async
  compaction).
- deletes are partition-scoped rewrites using dynamic partition
  overwrite, so only affected partitions are touched (A18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailpipe_spark.catalog import PARTITION_COLS, Catalog
from tailpipe_spark.enrich import with_partition_columns


def append(catalog: Catalog, table: str, df: DataFrame) -> None:
    """Append enriched rows (must carry tp_* columns) to the table."""
    out = with_partition_columns(df)
    (
        out.write.partitionBy(*PARTITION_COLS)
        .mode("append")
        .parquet(catalog.table_dir(table))
    )


def delete_range(
    catalog: Catalog,
    spark: SparkSession,
    table: str,
    partition: str,
    time_from=None,
    time_to=None,
) -> int:
    """Delete rows of one tp_partition within [time_from, time_to]
    (reference: internal/database/cleanup.go:14-51). Returns rows
    deleted. Only partitions containing the range are rewritten.

    Survivors are written to a staging dir OUTSIDE the table tree, then
    swapped in per partition key — the write job reads the old files
    while they still exist, so no cache-based materialization is needed
    and a crash never leaves tmp output where a reader would scan it."""
    import os
    import shutil

    df = catalog.read_table(spark, table).filter(F.col("tp_partition") == partition)
    cond = F.lit(True)
    if time_from is not None:
        cond = cond & (F.col("tp_timestamp") >= F.lit(time_from))
    if time_to is not None:
        cond = cond & (F.col("tp_timestamp") <= F.lit(time_to))

    doomed = df.filter(cond)
    n = doomed.count()
    if n == 0:
        return 0
    survivors = df.filter(~cond)
    # Rewrite only partition keys that held doomed rows.
    affected = [
        tuple(r)
        for r in doomed.select("tp_partition", "tp_index", "tp_year", "tp_month")
        .distinct()
        .collect()
    ]
    keep = None
    for p, i, y, mo in affected:
        c = (
            (F.col("tp_partition") == p)
            & (F.col("tp_index") == i)
            & (F.col("tp_year") == y)
            & (F.col("tp_month") == mo)
        )
        keep = c if keep is None else (keep | c)
    staged = catalog.new_staging_dir(f"{table}.delete")
    (
        survivors.filter(keep)
        .write.partitionBy(*PARTITION_COLS)
        .mode("overwrite")
        .parquet(staged)
    )
    for p, i, y, mo in affected:
        rel = os.path.join(
            f"tp_partition={p}", f"tp_index={i}", f"tp_year={y}", f"tp_month={mo}"
        )
        src = os.path.join(staged, rel)
        dst = os.path.join(catalog.table_dir(table), rel)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        if os.path.isdir(src):  # absent = every row in this key was doomed
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
    shutil.rmtree(staged, ignore_errors=True)
    catalog.record_snapshot(
        "delete", {"table": table, "partition": partition, "rows": n}
    )
    return n
