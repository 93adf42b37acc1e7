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
    deleted. Only partitions containing the range are rewritten."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
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
    # Rewrite only partitions that held doomed rows; read their
    # survivors and overwrite those partition dirs dynamically.
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
    rewrite = survivors.filter(keep)
    # Collect survivor keys BEFORE the overwrite: the plan reads the old
    # files, which the write below replaces.
    with_rows = {
        tuple(r)
        for r in rewrite.select("tp_partition", "tp_index", "tp_year", "tp_month")
        .distinct()
        .collect()
    }
    rewrite = rewrite.cache()
    rewrite.count()  # materialize before the files underneath change
    (
        rewrite.write.partitionBy(*PARTITION_COLS)
        .mode("overwrite")
        .parquet(catalog.table_dir(table))
    )
    rewrite.unpersist()
    # Dynamic overwrite only replaces partitions that receive rows; a
    # fully-deleted partition writes nothing, so drop its dir explicitly.
    import os
    import shutil
    for key in set(affected) - with_rows:
        p, i, y, mo = key
        d = os.path.join(
            catalog.table_dir(table),
            f"tp_partition={p}", f"tp_index={i}", f"tp_year={y}", f"tp_month={mo}",
        )
        if os.path.isdir(d):
            shutil.rmtree(d)
    catalog.record_snapshot(
        "delete", {"table": table, "partition": partition, "rows": n}
    )
    return n
