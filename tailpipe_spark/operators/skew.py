"""Skew-tolerant joins via key salting.

AQE's skew-join splitting (enabled in build_session) handles most skew
at runtime; salting is the explicit fallback for pathological keys
(e.g. the one tenant producing 40% of log rows) and for aggregations:

- ``salted_join``: replicate the small side ``salt`` ways; shard the
  big side's hot keys across salt buckets. The shuffle then spreads a
  hot key over ``salt`` reducers instead of one straggler.
- ``two_phase_agg``: count/sum by (key, salt) first (parallel), then
  re-aggregate by key — the classic skewed-groupBy rewrite. (Partial
  map-side aggregation already does this for algebraic aggs; the
  explicit form matters for count-distinct-style state.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(salt: int):
    """Uniform [0, salt) bucket per row — shared by both skew rewrites.

    AQE-safety (the distributed_cumsum class of bug — two consumers of
    one nondeterministic exchange disagreeing after an AQE re-plan):
    this column IS nondeterministic (monotonically_increasing_id is
    partition-placement-dependent, so a re-executed stage can assign a
    row a DIFFERENT salt), but both rewrites are salt-assignment-
    INVARIANT, so no plan change can surface it. ``two_phase_agg`` is a
    linear chain with a single consumer: whatever salt each row gets,
    it lands in exactly one (key, salt) cell and phase 2 merges ALL
    cells — count/sum/min/max are partition-of-the-multiset invariant
    (for ``sum`` over doubles that holds up to FP reorder, the generic
    double-sum caveat; the registry entry routes doubles through a
    decimal cast so even the reorder is exact). ``salted_join``
    replicates the small side over ALL salt values, so any salt the
    big row draws matches exactly one replica — the join result is the
    plain equi-join verbatim under every assignment. Neither rewrite
    ever JOINS two frames that both derive from the same salt column,
    which is the shape that actually broke distributed_cumsum. Pinned
    by tests/test_aqe_multiconsumer.py (AQE forced on, results
    compared to AQE off)."""
    return F.abs(F.xxhash64(F.monotonically_increasing_id()) % salt).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed and
    ``small`` is too large to broadcast. Output columns = big's + small's
    (minus the duplicate key).

    Only ``inner`` and ``left`` (big-side-preserving) joins are valid:
    the small side is replicated ``salt`` ways, so a right/full outer
    would emit each unmatched small-side row once per replica."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}); "
            "the replicated small side breaks right/full outer semantics"
        )
    big_s = big.withColumn("__salt", _salt_col(salt))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: ``aggs`` is [(col, fn, alias)] with fn in
    {count, sum, min, max, count_distinct-approx}. Phase 1 aggregates by
    (key, salt); phase 2 merges per key."""
    salted = df.withColumn("__salt", _salt_col(salt))
    phase1_exprs, phase2_exprs = [], []
    for col, fn, alias in aggs:
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(f"__p_{alias}"))
            phase2_exprs.append(F.sum(f"__p_{alias}").alias(alias))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"__p_{alias}"))
            phase2_exprs.append(F.sum(f"__p_{alias}").alias(alias))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"__p_{alias}"))
            phase2_exprs.append(F.min(f"__p_{alias}").alias(alias))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"__p_{alias}"))
            phase2_exprs.append(F.max(f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"unsupported agg fn {fn!r}")
    p1 = salted.groupBy(key, "__salt").agg(*phase1_exprs)
    return p1.groupBy(key).agg(*phase2_exprs)
