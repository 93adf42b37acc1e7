"""Similarity search over embedding columns (``array<float>``).

- brute-force top-k: exact baseline. Probe vectors broadcast to every
  partition (a literal / broadcast join), corpus side streams — one
  pass, no shuffle except the final top-k (TakeOrderedAndProject).
- LSH-bucketed search: random-hyperplane signatures → candidates share
  a bucket → exact re-rank inside buckets. Corpus pass is linear; the
  pairwise work collapses from n² to the bucket collision volume —
  the 100 TB path. Hyperplanes are derived deterministically from a
  seed via xxhash64 so signatures are reproducible without shipping a
  matrix.

Exactness: dot/norm accumulate through a decimal cast (see
functions.exact) so similarity values are bit-stable across partition
orders and across engines — required by the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(30,15)"


def _exact_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)),
        F.lit(0).cast(_DEC),
        lambda acc, v: (acc + v).cast(_DEC),
    ).cast("double")


def _exact_sq_norm(a):
    return F.aggregate(
        F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC)),
        F.lit(0).cast(_DEC),
        lambda acc, v: (acc + v).cast(_DEC),
    ).cast("double")


def exact_cosine(a, b, round_digits: int | None = 12):
    """Deterministic cosine similarity between two array columns.

    Rounded to ``round_digits`` decimals by default: the decimal casts
    guarantee order-independence *within* Spark, but double→decimal
    rounding-mode differences across engines can still flip the last
    ulp, so cross-engine-comparable values are rounded at 1e-12.
    """
    c = _exact_dot(a, b) / (F.sqrt(_exact_sq_norm(a)) * F.sqrt(_exact_sq_norm(b)))
    return F.round(c, round_digits) if round_digits is not None else c


def brute_force_topk(
    corpus: DataFrame,
    probe: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe row.

    ``probe`` must be small (it is broadcast); the corpus can be
    arbitrarily large. Returns (probe_id, vec_id, cosine) with a
    deterministic tiebreak on vec_id.
    """
    p = probe.select(
        F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__pvec")
    )
    scored = corpus.join(F.broadcast(p), corpus[id_col] != p[probe_id_col]).select(
        probe_id_col,
        id_col,
        exact_cosine(F.col(vec_col), F.col("__pvec")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def hyperplane_signature(vec_col, num_planes: int = 16, seed: int = 42):
    """Random-hyperplane LSH signature as an int column.

    Plane p's normal component for dimension d is a deterministic
    pseudo-random ±1 derived from xxhash64(seed, p, d) — no matrix to
    broadcast, reproducible everywhere.
    """
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda x, d: x.cast("double")
                * F.when(
                    F.xxhash64(F.lit(seed), F.lit(p), d).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        )
    return sig


def lsh_topk(
    corpus: DataFrame,
    probe: DataFrame,
    k: int = 10,
    num_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k: candidates share >=1 LSH band with the probe,
    then exact cosine re-rank within candidates."""
    assert num_planes % bands == 0
    width = num_planes // bands
    mask = (1 << width) - 1

    def banded(df, idc):
        s = df.withColumn("__sig", hyperplane_signature(F.col(vec_col), num_planes))
        chunk_cols = [
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("__sig"), i * width).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for i in range(bands)
        ]
        return s.select(
            F.col(id_col).alias(idc),
            F.col(vec_col).alias(f"__v_{idc}"),
            F.explode(F.array(*chunk_cols)).alias("c"),
        ).select(idc, f"__v_{idc}", "c.band", "c.bv")

    cb = banded(corpus, "cand_id")
    pb = banded(probe, probe_id_col)
    cands = (
        cb.join(F.broadcast(pb), ["band", "bv"])
        .where(F.col("cand_id") != F.col(probe_id_col))
        .select(probe_id_col, "cand_id", f"__v_{probe_id_col}", "__v_cand_id")
        .distinct()
    )
    scored = cands.select(
        probe_id_col,
        F.col("cand_id").alias(id_col),
        exact_cosine(F.col("__v_cand_id"), F.col(f"__v_{probe_id_col}")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
