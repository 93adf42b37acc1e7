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


def merge_intervals(
    df: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping-or-touching intervals per key (interval
    union, the gaps-and-islands rewrite): returns one row per merged
    island with (key, island_start, island_end, n_rows).

    Classic in log/timeseries analytics (outage windows, session
    spans, span-coverage audits). Plan shape: ONE shuffle on the key,
    per-key sort, two window passes — a row starts a new island iff
    its start lies strictly after the running max of all previous
    ends (touching endpoints merge); the island id is the running
    count of starts. No self-join, no interval pair materialization —
    the same cumulative-max trick dedup's span coverage uses
    (operators/dedup.py duplicated_span_coverage), promoted to a
    standalone keyed operator. Per-key windows parallelize across
    keys; a single hot key degrades to that key's row count, not the
    corpus.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "__new_island",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy(key, "__island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_rows"),
    ).drop("__island")
