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

Product path (r11): ``compact --bucket-by col[:N]`` rewrites a
cataloged table into this layout through the staged-swap path
(compact.bucket_rewrite), the manifest records the spec, and
``Catalog.read_table`` serves scans through a session-catalog
registration that carries it — see tests/test_bucketed_layout.py.

Layout guidance (SCALE_PROOF §product-path A/B, sf10): bucket the
tables whose JOINS dominate — the co-location deletes the fact
exchanges (q05 SMJ 8→6, q03 3→1) that are the network bill at cluster
scale. Keep plain time-clustering where time-range FILTERS dominate:
single-node, the hive-month × bucket file product (84×32 ≈ 2.7k files
at sf10) costs more in scan overhead than the exchanges it saves
(q03 regressed 47% single-node; q05 was parity). Both layouts are
per-table choices and compaction is sticky to whichever is recorded.
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
