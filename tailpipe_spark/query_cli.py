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
    """Absolute ISO timestamps or relative ``T-7d`` style offsets.

    Offset-aware inputs convert to UTC (the session timezone) — merely
    stripping tzinfo would shift the bound by the offset."""
    m = _REL.match(value.strip())
    if m:
        now = now or datetime.now(timezone.utc)
        qty, unit = int(m.group(1)), m.group(2).lower()
        if unit == "y":
            return now - timedelta(days=365 * qty)
        return now - timedelta(**{_UNITS[unit]: qty})
    t = datetime.fromisoformat(value)
    if t.tzinfo is not None:
        t = t.astimezone(timezone.utc).replace(tzinfo=None)  # naive UTC
    return t


def wildcard_to_like(pattern: str) -> str:
    """``*`` → ``%`` (reference: cmd/connect.go:372-399). Literal
    ``%``/``_``/``\\`` in the user pattern are escaped first — LIKE's
    default backslash escape — so ``a_b`` matches only 'a_b'."""
    escaped = (
        pattern.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    )
    return escaped.replace("*", "%")


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
    # the time range (row filter + the (tp_year, tp_month) partition-dir
    # pruning rewrite, null-keep on the lower bound) is ONE shared
    # implementation — plans.pruning.apply_pruned_time_filter
    from tailpipe_spark.plans.pruning import apply_pruned_time_filter

    df = apply_pruned_time_filter(
        df,
        time_from=parse_time(time_from, now) if time_from else None,
        time_to=parse_time(time_to, now) if time_to else None,
    )
    for cond in (
        pattern_condition(index_patterns, "tp_index"),
        pattern_condition(partition_patterns, "tp_partition"),
    ):
        if cond is not None:
            df = df.filter(cond)
    return df
