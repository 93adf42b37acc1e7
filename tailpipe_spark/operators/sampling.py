"""Deterministic sampling / splitting for training-data pipelines.

Beyond the reference's own surface (project brief "training-data
pipeline" extras): a 100 TB corpus needs train/val/test splits, holdout
sampling, and source-mixture balancing that are

- **deterministic**: re-running the pipeline yields byte-identical
  membership (no rand(); seeds don't survive re-partitioning);
- **stable under growth**: adding documents never flips the assignment
  of an existing document (hash-based, not row_number-based);
- **row-local**: split assignment is a projection over md5 — no
  shuffle, no global coordination, scales linearly.

The hash bucket is the first 4 hex chars of ``md5(salt ':' id)``
compared as lowercase-hex *strings* (lexicographic == numeric for
fixed-width lowercase hex), which every SQL engine replays
bit-identically — the same portability trick as the md5 MinHash twin
(dedup.py:438).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash-space granularity: 4 hex chars = 65536 buckets
_SPACE = 1 << 16


def _bucket_hex(id_col: Column, salt: str) -> Column:
    """First 4 hex chars of the salted md5 — a uniform draw from 65536
    buckets, portable to any engine with md5()."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 4
    )


def _hex4(n: int) -> str:
    return format(n, "04x")


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, str]]:
    """Map split weights to cumulative hex thresholds.

    ``{"train": .9, "val": .05, "test": .05}`` →
    ``[("train","e666"), ("val","f333"), ("test","ffff")]`` — each split
    owns the bucket range [prev, threshold); rounding error (at most
    1/65536 per split) goes to the last split.
    """
    total = sum(weights.values())
    out, acc = [], 0.0
    names = list(weights)
    sentinel = _hex4(_SPACE - 1) + "g"  # > any 4-char hex bucket
    for name in names[:-1]:
        acc += weights[name] / total
        n = int(acc * _SPACE)
        if n >= _SPACE:
            # cumulative weight hit 1.0 on a NON-final split: clamping
            # to 'ffff' would leak bucket ffff (~1/65536 of ids) into
            # the next split (r7 ADVICE); the catch-all sentinel makes
            # this split absorb every remaining id exactly, and the
            # later zero-weight splits match nothing.
            out.append((name, sentinel))
        else:
            out.append((name, _hex4(n)))
    out.append((names[-1], sentinel))
    return out


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/val/test (or arbitrary) split column.

    Row-local (scan+project, zero shuffle); changing ``salt`` redraws
    the whole assignment, which is the supported way to re-split.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    h = _bucket_hex(F.col(id_col), salt)
    expr = None
    for name, upper in split_boundaries(weights):
        cond = h < upper
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def sample_fraction(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (hash threshold).

    Unlike ``df.sample``, membership is a pure function of the id, so
    it is reproducible across runs, partitionings, and engines.
    """
    n = int(fraction * _SPACE)
    if n >= _SPACE:
        # fraction >= 1.0: format(65536,'04x') is 5 chars and string-
        # compares BELOW most 4-char buckets (r6 ADVICE) — keep all.
        return df
    return df.filter(_bucket_hex(F.col(id_col), salt) < _hex4(n))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    salt: str = "strat-v1",
) -> DataFrame:
    """Deterministic n-per-group sample: rank by salted hash within each
    group (id as tiebreak — md5 collisions on 4 hex chars are common at
    corpus scale) and keep the first n. One shuffle on ``group_col``;
    for skewed groups the window never materializes the group, it
    streams rank-limited."""
    w = Window.partitionBy(group_col).orderBy(
        _bucket_hex(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_group)
        .drop("__rk")
    )


def mixture_rates(
    df: DataFrame,
    group_col: str,
    size_col: str,
    target_share: float,
) -> DataFrame:
    """Per-group sampling rates that cap any group at ``target_share``
    of the corpus (by ``size_col`` mass, e.g. chars or tokens) — the
    standard source-mixture balancing step before training.

    rate = min(1, target_share * total / group_mass). Two aggregations
    (per-group + global) with the global total joined back as a
    broadcast single row; group masses use exact long sums so the rates
    are engine-portable.
    """
    per_group = df.groupBy(group_col).agg(
        F.sum(F.col(size_col)).alias("group_mass")
    )
    total = df.agg(F.sum(F.col(size_col)).alias("total_mass"))
    return (
        per_group.crossJoin(F.broadcast(total))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.lit(target_share)
                * F.col("total_mass").cast("double")
                / F.col("group_mass").cast("double"),
            ),
        )
        .select(group_col, "group_mass", "rate")
    )
