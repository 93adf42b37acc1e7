"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg`` family).

Why this matters at 100 TB: an exact COUNT(DISTINCT) over a year of
events must shuffle every distinct key once per query. A sketch rollup
pays that cost once per bucket at ingest; any later rollup — per week,
per month, all time — is a tiny union of fixed-size (≈2^lgk bytes)
binary sketches with NO rescan of raw data, and HLL union is lossless:
the merged sketch is byte-identical to sketching the concatenated
input, so accuracy does not degrade with rollup depth.

Pairs with streaming/rollup.py: store the sketch column in the bucket
table and distinct counts become continuously aggregable like sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(col, lgk: int = 12) -> Column:
    """Aggregate expression: HLL sketch of ``col`` (binary, ~2^lgk B)."""
    return F.hll_sketch_agg(col, F.lit(lgk))


def union_estimate(sketch_col) -> Column:
    """Aggregate expression: merge sketches and read the estimate."""
    return F.hll_sketch_estimate(F.hll_union_agg(sketch_col))


def sketch_buckets(
    df: DataFrame,
    bucket_expr: Column,
    key_col: str,
    group_cols: list[str] | None = None,
    lgk: int = 12,
) -> DataFrame:
    """Per-bucket sketches: (bucket, *group_cols, sketch). One shuffle
    on the bucket/group keys; the output is bucket-count sized."""
    return df.groupBy(bucket_expr.alias("bucket"), *(group_cols or [])).agg(
        distinct_sketch(F.col(key_col), lgk).alias("sketch")
    )


def rollup_estimate(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge bucket sketches up to ``group_cols`` granularity and
    estimate — never touches raw data."""
    g = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    return g.agg(
        union_estimate(F.col("sketch")).cast("long").alias("approx_distinct")
    )
