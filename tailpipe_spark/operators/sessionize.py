"""Gap-based sessionization.

Classic log-analytics operator (the reference exposes it through DuckDB
window SQL; here it's a first-class DataFrame op). One shuffle on the
key, one sort on time; session ids are assigned with lag + cumulative
sum of gap-break flags — fully incremental, no driver-side state, and
the same plan shape works as `applyInPandasWithState`-free Structured
Streaming via `F.session_window` (see tailpipe_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Add a per-key session index (0-based) that increments whenever
    the gap since the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(key).orderBy(F.col(time_col).asc())
    gap_us = F.unix_micros(F.col(time_col)) - F.unix_micros(
        F.lag(F.col(time_col)).over(w)
    )
    is_break = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("__brk", is_break).withColumn(
        session_col, F.sum("__brk").over(w) - 1
    ).drop("__brk")


def session_stats(
    df: DataFrame, key: str, time_col: str, gap_seconds: int
) -> DataFrame:
    """Per-key session summary: sessions, events, longest session span."""
    s = sessionize(df, key, time_col, gap_seconds)
    per_session = s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max(time_col)) - F.unix_micros(F.min(time_col)))
            / F.lit(1_000_000.0)
        ).alias("span_sec"),
    )
    return per_session.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("span_sec").alias("max_span_sec"),
    )
