"""Query-time filter surface: --from/--to/--index/--partition semantics
(reference: cmd/connect.go:262-412).

- from/to: ``tp_timestamp`` range; NULL timestamps are KEPT by the lower
  bound (so bad rows surface as validation errors instead of silently
  vanishing — reference: internal/collector/collector.go:228-239) and
  relative forms like ``T-7d`` are resolved against now().
- index/partition: ``*`` wildcards rewritten to SQL ``LIKE`` '%'
  patterns, OR-combined.

These filters land directly on tp_* columns, so with the materialized
(tp_partition, tp_index, tp_year, tp_month) layout plus the pruning
rewrite (plans.pruning) they become partition-pruned parquet scans.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REL = re.compile(r"^T-(\d+)([smhdwy])$", re.IGNORECASE)
_UNITS = {
    "s": "seconds",
    "m": "minutes",
    "h": "hours",
    "d": "days",
    "w": "weeks",
}


def parse_time(value: str, now: datetime | None = None) -> datetime:
    """Absolute ISO timestamps or relative ``T-7d`` style offsets."""
    m = _REL.match(value.strip())
    if m:
        now = now or datetime.now(timezone.utc)
        qty, unit = int(m.group(1)), m.group(2).lower()
        if unit == "y":
            return now - timedelta(days=365 * qty)
        return now - timedelta(**{_UNITS[unit]: qty})
    return datetime.fromisoformat(value)


def wildcard_to_like(pattern: str) -> str:
    """``*`` → ``%`` (reference: cmd/connect.go:372-399)."""
    return pattern.replace("*", "%")


def time_range_condition(
    time_from: str | None,
    time_to: str | None,
    ts_col: str = "tp_timestamp",
    now: datetime | None = None,
) -> Column | None:
    cond = None
    c = F.col(ts_col)
    if time_from:
        f = parse_time(time_from, now)
        lower = c.isNull() | (c >= F.lit(f.replace(tzinfo=None)))
        cond = lower
    if time_to:
        t = parse_time(time_to, now)
        upper = c <= F.lit(t.replace(tzinfo=None))
        cond = upper if cond is None else (cond & upper)
    return cond


def pattern_condition(patterns: list[str] | None, col: str) -> Column | None:
    """OR-combined LIKE conditions with wildcard rewrite."""
    if not patterns:
        return None
    cond = None
    for p in patterns:
        like = F.col(col).cast("string").like(wildcard_to_like(p))
        cond = like if cond is None else (cond | like)
    return cond


def apply_query_filters(
    df: DataFrame,
    time_from: str | None = None,
    time_to: str | None = None,
    index_patterns: list[str] | None = None,
    partition_patterns: list[str] | None = None,
    now: datetime | None = None,
) -> DataFrame:
    for cond in (
        time_range_condition(time_from, time_to, now=now),
        pattern_condition(index_patterns, "tp_index"),
        pattern_condition(partition_patterns, "tp_partition"),
    ):
        if cond is not None:
            df = df.filter(cond)
    # derive the implied (tp_year, tp_month) bounds so Catalyst prunes
    # partition DIRECTORIES, not just rows — without this a --from/--to
    # query scans every month of the table (plans/pruning.py rationale)
    if (time_from or time_to) and {"tp_year", "tp_month"}.issubset(df.columns):
        from tailpipe_spark.plans.pruning import time_range_to_partition_predicate

        part = time_range_to_partition_predicate(
            parse_time(time_from, now) if time_from else None,
            parse_time(time_to, now) if time_to else None,
        )
        if part is not None:
            # null tp_year rows (null-timestamp hive default partition)
            # stay, mirroring the row filter's null-keep lower bound
            df = df.filter(F.col("tp_year").isNull() | part)
    return df
