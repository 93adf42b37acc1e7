"""Timestamp-range → partition-column predicate rewrite.

DuckLake partitions by ``year(tp_timestamp), month(tp_timestamp)`` as
expressions, so time-range predicates prune files natively
(reference: internal/database/ducklake_table.go:38-41, SURVEY.md §4).
Spark partition columns are plain columns (tp_year/tp_month), so a
``tp_timestamp >= X AND tp_timestamp < Y`` filter alone scans every
partition. This helper derives the implied
``(tp_year, tp_month)`` bounds and ANDs them in — Catalyst then prunes
partition directories at planning time, which is the difference between
"scan 100 TB" and "scan one month" on the big cluster.

This is the one quasi-optimizer piece the engine owns (SURVEY.md §4
calls it out); everything else is Catalyst built-ins.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ym(d: datetime | date) -> int:
    return d.year * 12 + (d.month - 1)


def time_range_to_partition_predicate(
    time_from: datetime | date | None,
    time_to: datetime | date | None,
    year_col: str = "tp_year",
    month_col: str = "tp_month",
) -> Column | None:
    """Predicate on (tp_year, tp_month) implied by an inclusive
    tp_timestamp range. Linearizes to year*12+month so the bound is a
    single comparison Catalyst can push into partition pruning."""
    lin = F.col(year_col) * 12 + (F.col(month_col) - 1)
    cond = None
    if time_from is not None:
        cond = lin >= _ym(time_from)
    if time_to is not None:
        upper = lin <= _ym(time_to)
        cond = upper if cond is None else (cond & upper)
    return cond


def apply_pruned_time_filter(
    df: DataFrame,
    time_from: datetime | None = None,
    time_to: datetime | None = None,
    ts_col: str = "tp_timestamp",
    keep_null_lower: bool = True,
) -> DataFrame:
    """Exact tp_timestamp range filter + the partition-pruning rewrite.

    The row-level predicate keeps NULL timestamps on the lower bound
    (reference: internal/collector/collector.go:228-239); the partition
    predicate is only added when the table carries layout columns.
    """
    c = F.col(ts_col)
    if time_from is not None:
        lower = c >= F.lit(time_from)
        if keep_null_lower:
            lower = c.isNull() | lower
        df = df.filter(lower)
    if time_to is not None:
        df = df.filter(c <= F.lit(time_to))
    if {"tp_year", "tp_month"}.issubset(df.columns):
        part = time_range_to_partition_predicate(time_from, time_to)
        if part is not None:
            if keep_null_lower:
                # null-timestamp rows live in the hive default partition
                # (tp_year=null); the partition predicate must not undo
                # the row filter's null-keep
                part = F.col("tp_year").isNull() | part
            df = df.filter(part)
    return df
