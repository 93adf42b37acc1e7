"""Similarity-search queries over ``embeddings`` (array<float>, dim 64).

The exact path accumulates dot/norm in 1e-12 fixed-point (floor of the
scaled product, summed as integers — operators.similarity._exact_dot)
so values are bit-identical to the DuckDB oracle at primitive speed;
the LSH path is approximate by construction and gets a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailpipe_spark.operators import similarity as sim
from tailpipe_spark.queries import QuerySpec

_PROBE_ID = 0
_K = 10

#: DuckDB twin of the fixed-point folds: floor((x*y)*1e12) summed as
#: integers, back to value units — every step bit-identical to Spark's
_F = "1000000000000"


def _fxp(prod: str) -> str:
    return f"CAST(SUM(CAST(FLOOR(({prod}) * {_F}) AS BIGINT)) AS DOUBLE) / {_F}"


def _q12(expr: str) -> str:
    """DuckDB twin of similarity.quantize12: scale -> integer round ->
    unscale, bit-identical to Spark (plain ROUND(x, 12) is not)."""
    return f"CAST(ROUND(({expr}) * {_F}) AS BIGINT) / {_F}"


_DOT = _fxp("CAST(x AS DOUBLE) * CAST(y AS DOUBLE)")
_SQX = _fxp("CAST(x AS DOUBLE) * CAST(x AS DOUBLE)")
_SQY = _fxp("CAST(y AS DOUBLE) * CAST(y AS DOUBLE)")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailpipe_spark.session import read_table

    return read_table(spark, f"{sf_dir}/embeddings.parquet")


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == _PROBE_ID)
    out = sim.brute_force_topk(emb, probe, k=_K)
    return out.select("probe_id", "vec_id", "cosine").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )


SIM_TOPK_SQL = f"""
WITH pairs AS (
  SELECT p.vec_id AS probe_id, e.vec_id,
         unnest(e.embedding) AS x, unnest(p.embedding) AS y
  FROM embeddings e, (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id = {_PROBE_ID}) p
  WHERE e.vec_id <> {_PROBE_ID}),
stats AS (
  SELECT probe_id, vec_id,
         {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pairs GROUP BY probe_id, vec_id),
scored AS (
  SELECT probe_id, vec_id, {_q12("dotp / (SQRT(nx) * SQRT(ny))")} AS cosine
  FROM stats)
SELECT probe_id, vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT {_K}
"""


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH buckets + exact re-rank
    (rows-only: bucketing is engine-specific)."""
    emb = _emb(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == _PROBE_ID)
    out = sim.lsh_topk(emb, probe, k=_K, num_planes=16, bands=4)
    return out.select("probe_id", "vec_id", "cosine").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )


def sim_lsh_topk_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH ANN chain in PORTABLE mode, oracle-checked end to end:
    hyperplane signatures from a literal md5 sign matrix with
    fixed-point projections (integer sums — order-free, so any engine
    replays them), 4-band bucketing, candidate join, exact
    fixed-point cosine re-rank. The xxhash64 signature sibling
    (sim_lsh_topk) stays the fast engine default, recall-pinned by
    pytest."""
    emb = _emb(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == _PROBE_ID)
    out = sim.lsh_topk(
        emb, probe, k=_K, num_planes=16, bands=4, portable_dim=64
    )
    return out.select("probe_id", "vec_id", "cosine").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )


def _lsh_md5_sql() -> str:
    """Oracle generated from the SAME sign matrix as the Spark plan."""
    signs = sim.hyperplane_signs(16, 64)
    rows = ", ".join(
        f"({p}, {d}, {signs[p][d]})" for p in range(16) for d in range(64)
    )
    width = 4  # 16 planes / 4 bands
    return f"""
WITH signs(p, d, s) AS (VALUES {rows}),
planes AS (
  SELECT e.vec_id, s.p,
         SUM(CAST(FLOOR(CAST(e.embedding[s.d + 1] AS DOUBLE) * s.s * {_F}) AS BIGINT)) AS fx
  FROM embeddings e CROSS JOIN signs s
  GROUP BY e.vec_id, s.p),
sigs AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN fx > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS sig
  FROM planes GROUP BY vec_id),
bandsx AS (
  SELECT vec_id, b.b AS band, (sig >> (b.b * {width})) & {(1 << width) - 1} AS bv
  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) b),
cand AS (
  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
  FROM bandsx c JOIN bandsx p ON c.band = p.band AND c.bv = p.bv
  WHERE p.vec_id = {_PROBE_ID} AND c.vec_id <> {_PROBE_ID}),
pairs AS (
  SELECT cand.probe_id, cand.cand_id,
         unnest(e.embedding) AS x, unnest(pe.embedding) AS y
  FROM cand
  JOIN embeddings e ON e.vec_id = cand.cand_id
  JOIN embeddings pe ON pe.vec_id = cand.probe_id),
stats AS (
  SELECT probe_id, cand_id AS vec_id,
         {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pairs GROUP BY probe_id, vec_id),
scored AS (
  SELECT probe_id, vec_id, {_q12("dotp / (SQRT(nx) * SQRT(ny))")} AS cosine
  FROM stats)
SELECT probe_id, vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT {_K}
"""


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    norm = sim.quantize12(F.sqrt(sim._exact_sq_norm(F.col("embedding"))))
    per_row = emb.select("label", norm.alias("norm"))
    # norms are 1e-12-quantized, so the cross-row sum is exact (and
    # engine-identical) in integer units of the quantum; a decimal cast
    # of the rounded double would re-round its true binary value and
    # drift by an ulp per boundary row across engines
    sum_fx = (
        F.sum(F.round(F.col("norm") * F.lit(1e12)).cast("long")).cast("double")
        / F.lit(1e12)
    )
    return (
        per_row.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            sum_fx.alias("sum_norm"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
        .orderBy("label")
    )


EMB_NORM_SQL = f"""
WITH per_row AS (
  SELECT label,
         {_q12(f'SQRT({_SQX})')} AS norm
  FROM (SELECT label, vec_id, unnest(embedding) AS x FROM embeddings)
  GROUP BY label, vec_id)
SELECT label, COUNT(*) AS n_vectors,
       CAST(SUM(CAST(ROUND(norm * {_F}) AS BIGINT)) AS DOUBLE) / {_F} AS sum_norm,
       MIN(norm) AS min_norm, MAX(norm) AS max_norm
FROM per_row GROUP BY label ORDER BY label
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs baseline; the
    LSH-restricted variant is sim_ivf_topk/sim_lsh_topk territory)."""
    from tailpipe_spark.operators.similarity import cosine_pairs_threshold

    emb = _emb(spark, sf_dir)
    # pinned exact: the oracle replays all pairs; the operator's default
    # auto-flips to LSH above AUTO_LSH_THRESHOLD vectors
    return cosine_pairs_threshold(emb, threshold=0.4, use_lsh=False).orderBy(
        "id_a", "id_b"
    )


DEDUP_EMB_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         unnest(a.embedding) AS x, unnest(b.embedding) AS y
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
stats AS (
  SELECT id_a, id_b, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pairs GROUP BY id_a, id_b)
SELECT id_a, id_b, {_q12('dotp / (SQRT(nx) * SQRT(ny))')} AS cosine
FROM stats
WHERE {_q12('dotp / (SQRT(nx) * SQRT(ny))')} >= 0.4
ORDER BY id_a, id_b
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantized cluster shortlist + exact re-rank.
    Hash-checked end to end: seeds are the 8 lowest ids, the one Lloyd
    refinement uses FIXED-POINT means (order-free integer sums — see
    ivf_index), assignments/shortlist/re-rank use the fixed-point
    cosine — so the oracle replays the entire chain bit-identically:
    an approximate ALGORITHM is still a deterministic one."""
    from tailpipe_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == _PROBE_ID)
    out = ivf_topk(emb, probe, k=_K, nlist=8, nprobe=3)
    return out.select("probe_id", "vec_id", "cosine").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )


_KMEANS_K = 8


def emb_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step over deterministic seed centroids (the
    k lowest vec_ids, refine_iters=0 so centroid floats stay raw and the
    oracle can replay them); per-cluster membership + cosine stats. The
    full iterative refinement is operators.similarity.ivf_index —
    engine-specific averaged floats, covered rows-only by sim_ivf_topk."""
    emb = _emb(spark, sf_dir)
    cents = sim.ivf_index(emb, nlist=_KMEANS_K, refine_iters=0)
    assigned = sim.assign_clusters(emb, cents, score_col="cosine")
    sum_fx = (
        F.sum(F.round(F.col("cosine") * F.lit(1e12)).cast("long")).cast("double")
        / F.lit(1e12)
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            sum_fx.alias("sum_cosine"),
            F.min("cosine").alias("min_cosine"),
            F.max("cosine").alias("max_cosine"),
        )
        .orderBy("cluster_id")
    )


KMEANS_SQL = f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K})),
pairs AS (
  SELECT e.vec_id, c.cluster_id,
         unnest(e.embedding) AS x, unnest(c.centroid) AS y
  FROM embeddings e, cents c),
stats AS (
  SELECT vec_id, cluster_id, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pairs GROUP BY vec_id, cluster_id),
scored AS (
  SELECT vec_id, cluster_id, {_q12('dotp / (SQRT(nx) * SQRT(ny))')} AS cosine
  FROM stats),
best AS (
  SELECT vec_id, cluster_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, cluster_id ASC) AS rk
  FROM scored)
SELECT cluster_id, COUNT(*) AS n_members,
       CAST(SUM(CAST(ROUND(cosine * {_F}) AS BIGINT)) AS DOUBLE) / {_F} AS sum_cosine,
       MIN(cosine) AS min_cosine, MAX(cosine) AS max_cosine
FROM best WHERE rk = 1
GROUP BY cluster_id ORDER BY cluster_id
"""


def _ivf_sql() -> str:
    """Oracle for the full IVF chain (nlist=8, 1 Lloyd step, nprobe=3,
    k=10), generated from the same parameters as the Spark plan."""
    nlist, nprobe, dim = 8, 3, 64
    cos = _q12("dotp / (SQRT(nx) * SQRT(ny))")
    return f"""
WITH seeds AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cluster_id,
         embedding AS centroid
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {nlist})),
a1p AS (
  SELECT e.vec_id, s.cluster_id,
         unnest(e.embedding) AS x, unnest(s.centroid) AS y
  FROM embeddings e CROSS JOIN seeds s),
a1s AS (
  SELECT vec_id, cluster_id, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM a1p GROUP BY vec_id, cluster_id),
a1 AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY {cos} DESC, cluster_id) AS rk
    FROM a1s) WHERE rk = 1),
mean_src AS (
  SELECT a1.cluster_id, d.pos, e.embedding[d.pos] AS val
  FROM a1 JOIN embeddings e USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS pos) d),
means AS (
  SELECT cluster_id, pos,
         CAST(CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * {_F}) AS BIGINT)) AS DOUBLE)
              / COUNT(*) / {_F} AS REAL) AS m
  FROM mean_src GROUP BY cluster_id, pos),
cents AS (
  SELECT cluster_id, list(m ORDER BY pos) AS centroid FROM means
  GROUP BY cluster_id),
a2p AS (
  SELECT e.vec_id, c.cluster_id,
         unnest(e.embedding) AS x, unnest(c.centroid) AS y
  FROM embeddings e CROSS JOIN cents c),
a2s AS (
  SELECT vec_id, cluster_id, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM a2p GROUP BY vec_id, cluster_id),
assigned AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY {cos} DESC, cluster_id) AS rk
    FROM a2s) WHERE rk = 1),
shortlist AS (
  SELECT cluster_id FROM (
    SELECT cluster_id,
           ROW_NUMBER() OVER (ORDER BY {cos} DESC, cluster_id) AS rk
    FROM a2s WHERE vec_id = {_PROBE_ID}) WHERE rk <= {nprobe}),
cand AS (
  SELECT a.vec_id FROM assigned a JOIN shortlist USING (cluster_id)
  WHERE a.vec_id <> {_PROBE_ID}),
pairs AS (
  SELECT e.vec_id, unnest(e.embedding) AS x, unnest(p.embedding) AS y
  FROM cand JOIN embeddings e USING (vec_id)
  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_PROBE_ID}) p),
stats AS (
  SELECT vec_id, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pairs GROUP BY vec_id)
SELECT {_PROBE_ID} AS probe_id, vec_id, {cos} AS cosine
FROM stats
ORDER BY cosine DESC, vec_id ASC
LIMIT {_K}
"""



def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023): k-means
    cluster the embedding space, generate candidate pairs ONLY within
    clusters, drop the higher id of every pair with cosine >= t. The
    cluster restriction is the scale move — it divides the quadratic
    all-pairs term by ~nlist (the operator-level analog of IVF search;
    the exact all-pairs baseline is dedup_embedding_cosine). Seed
    centroids are deterministic (k lowest vec_ids, no refinement) so
    the whole chain replays in SQL: full hash oracle.

    Missed-pair caveat (inherent to SemDeDup, worth stating): a
    near-dup pair split across cluster boundaries is NOT generated —
    the paper's trade for the nlist-fold work cut. Output: per-cluster
    (n_members, n_dup_pairs, n_dropped) + the dropped-id checksum, so
    the hash pins both the pair set and the keep/drop decision."""
    emb = _emb(spark, sf_dir)
    cents = sim.ivf_index(emb, nlist=_KMEANS_K, refine_iters=0)
    assigned = sim.assign_clusters(emb, cents)
    a = assigned.select(
        "cluster_id", F.col("vec_id").alias("id_a"), F.col("embedding").alias("__ea")
    )
    b = assigned.select(
        "cluster_id", F.col("vec_id").alias("id_b"), F.col("embedding").alias("__eb")
    )
    pairs = (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(sim.exact_cosine(F.col("__ea"), F.col("__eb")) >= F.lit(0.4))
        .select("cluster_id", "id_a", "id_b")
    )
    dropped = pairs.select("cluster_id", F.col("id_b").alias("vec_id")).distinct()
    return (
        assigned.select("cluster_id", "vec_id")
        .join(dropped.withColumn("__drop", F.lit(1)), ["cluster_id", "vec_id"], "left")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce(F.col("__drop"), F.lit(0))).cast("long").alias("n_dropped"),
            F.sum(F.when(F.col("__drop") == 1, F.col("vec_id"))).cast("long").alias("dropped_id_sum"),
        )
        .join(
            pairs.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_dup_pairs")),
            "cluster_id",
            "left",
        )
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            "n_dropped",
            F.coalesce("dropped_id_sum", F.lit(0)).cast("long").alias("dropped_id_sum"),
        )
        .orderBy("cluster_id")
    )


SEMANTIC_DEDUP_SQL = f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K})),
ap AS (
  SELECT e.vec_id, c.cluster_id,
         unnest(e.embedding) AS x, unnest(c.centroid) AS y
  FROM embeddings e, cents c),
ast AS (
  SELECT vec_id, cluster_id, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM ap GROUP BY vec_id, cluster_id),
assigned AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY {_q12('dotp / (SQRT(nx) * SQRT(ny))')} DESC, cluster_id ASC) AS rk
    FROM ast) WHERE rk = 1),
emb_a AS (SELECT a.cluster_id, a.vec_id, e.embedding
          FROM assigned a JOIN embeddings e USING (vec_id)),
pp AS (
  SELECT a.cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
         unnest(a.embedding) AS x, unnest(b.embedding) AS y
  FROM emb_a a JOIN emb_a b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id),
ps AS (
  SELECT cluster_id, id_a, id_b, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pp GROUP BY cluster_id, id_a, id_b),
dup_pairs AS (
  SELECT cluster_id, id_a, id_b FROM ps
  WHERE {_q12('dotp / (SQRT(nx) * SQRT(ny))')} >= 0.4),
dropped AS (
  SELECT DISTINCT cluster_id, id_b AS vec_id FROM dup_pairs),
members AS (
  SELECT a.cluster_id, a.vec_id,
         CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_drop
  FROM assigned a LEFT JOIN dropped d
    ON a.cluster_id = d.cluster_id AND a.vec_id = d.vec_id),
per AS (
  SELECT cluster_id, COUNT(*) AS n_members,
         CAST(SUM(is_drop) AS BIGINT) AS n_dropped,
         CAST(COALESCE(SUM(CASE WHEN is_drop = 1 THEN vec_id END), 0) AS BIGINT)
           AS dropped_id_sum
  FROM members GROUP BY cluster_id)
SELECT p.cluster_id, p.n_members,
       CAST(COALESCE(dp.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       p.n_dropped, p.dropped_id_sum
FROM per p LEFT JOIN (
  SELECT cluster_id, COUNT(*) AS n_dup_pairs FROM dup_pairs GROUP BY cluster_id
) dp ON p.cluster_id = dp.cluster_id
ORDER BY p.cluster_id
"""

def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector INT8 quantization
    (operators/similarity.py quantize_embeddings_int8): the ANN
    memory-scale path — int8 codes are 4x smaller than float32, and
    candidate generation over codes + full-precision rerank is the
    standard big-corpus recipe. The integer codes are deterministic
    WITHOUT a grid (both engines evaluate the identical IEEE double
    expression and round half-away), so the full code vector is
    hash-checked; only the surfaced scale rides the 1e-12 grid.
    Row-local single projection — no shuffle at any corpus size.

    Driver surface: the code vector is serialized to a CSV string
    (``q_csv``) because the driver's pandas canonicalizer sorts over all
    output columns and a raw list column is unhashable there — the r12
    CORRECTNESS err row, the ArrayType twin of the round-7 DECIMAL
    incident. Integer→string rendering is locale-free and identical in
    Spark and DuckDB, so the CSV carries the complete bit-exact code
    information. The raw ``array<int>`` surface lives in the local_only
    twin :func:`emb_quantize_int8_arr` (typed Arrow harness only)."""
    from tailpipe_spark.operators.similarity import quantize_embeddings_int8

    out = quantize_embeddings_int8(_emb(spark, sf_dir))
    return out.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform("q", lambda x: x.cast("string")), ","
        ).alias("q_csv"),
    ).orderBy("vec_id")


def emb_quantize_int8_arr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """local_only exactness twin of :func:`emb_quantize_int8` surfacing
    the raw ``q: array<int>`` codes. The builder's typed harness
    (tools/check_correctness.py, Arrow fetch) hash-compares list cells
    fine; the driver's pandas canonicalizer cannot (unhashable list), so
    this twin never reaches queries()/oracle_sql()."""
    from tailpipe_spark.operators.similarity import quantize_embeddings_int8

    return quantize_embeddings_int8(_emb(spark, sf_dir)).orderBy("vec_id")


_INT8_M = "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))"

_INT8_CODES = f"""
CASE WHEN {_INT8_M} = 0
     THEN list_transform(embedding, v -> CAST(0 AS INT))
     ELSE list_transform(embedding,
            v -> CAST(ROUND(CAST(v AS DOUBLE) * 127 / {_INT8_M}) AS INT))
END
"""

EMB_INT8_SQL = f"""
SELECT vec_id,
       CAST(ROUND(({_INT8_M} / 127) * {_F}) AS BIGINT) / {_F} AS scale,
       array_to_string({_INT8_CODES}, ',') AS q_csv
FROM embeddings ORDER BY vec_id
"""

EMB_INT8_ARR_SQL = f"""
SELECT vec_id,
       CAST(ROUND(({_INT8_M} / 127) * {_F}) AS BIGINT) / {_F} AS scale,
       {_INT8_CODES} AS q
FROM embeddings ORDER BY vec_id
"""


def sim_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized ANN (operators/similarity.py int8_topk): integer-dot
    candidate generation over the int8 codes, exact fixed-point cosine
    re-rank of a 50-deep shortlist — the recipe the int8 codes exist
    for. Every stage is engine-replayable (bit-identical codes, integer
    dots, IEEE-identical shortlist scores, fixed-point re-rank), so the
    FULL chain carries a hash oracle, unlike the xxhash64-bucketed LSH
    sibling. Recall vs the exact brute force is pinned in pytest."""
    from tailpipe_spark.operators.similarity import int8_topk

    emb = _emb(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == _PROBE_ID)
    out = int8_topk(emb, probe, k=_K, shortlist=50)
    return out.select("probe_id", "vec_id", "cosine").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )


SIM_INT8_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS m
  FROM embeddings),
codes AS (
  SELECT vec_id, embedding,
         CASE WHEN m = 0 THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
              ELSE list_transform(embedding,
                     v -> CAST(ROUND(CAST(v AS DOUBLE) * 127 / m) AS BIGINT))
         END AS q
  FROM base),
pc AS (SELECT q AS pq, embedding AS pemb FROM codes WHERE vec_id = {_PROBE_ID}),
cand AS (
  SELECT vec_id,
         CAST(SUM(x * y) AS DOUBLE)
           / SQRT(CAST(greatest(SUM(x * x), 1) AS DOUBLE)) AS approx
  FROM (SELECT c.vec_id, unnest(c.q) AS x, unnest(p.pq) AS y
        FROM codes c, pc p WHERE c.vec_id <> {_PROBE_ID})
  GROUP BY vec_id),
short AS (
  SELECT vec_id FROM cand ORDER BY approx DESC, vec_id ASC LIMIT 50),
pairs AS (
  SELECT {_PROBE_ID} AS probe_id, e.vec_id,
         unnest(e.embedding) AS x, unnest(p.pemb) AS y
  FROM embeddings e JOIN short s ON e.vec_id = s.vec_id, pc p),
stats AS (
  SELECT probe_id, vec_id,
         {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pairs GROUP BY probe_id, vec_id),
scored AS (
  SELECT probe_id, vec_id, {_q12("dotp / (SQRT(nx) * SQRT(ny))")} AS cosine
  FROM stats)
SELECT probe_id, vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT {_K}
"""


SPECS = [
    QuerySpec("emb_quantize_int8", emb_quantize_int8, EMB_INT8_SQL, "symmetric per-vector int8 quantization (deterministic integer codes, 4x memory cut for ANN candidate generation); codes CSV-serialized on the driver surface"),
    QuerySpec("emb_quantize_int8_arr", emb_quantize_int8_arr, EMB_INT8_ARR_SQL, "raw array<int> surface of the int8 codes (typed Arrow harness only: pandas canonicalizers cannot sort list cells)", local_only=True),
    QuerySpec("sim_int8_topk", sim_int8_topk, SIM_INT8_SQL, "quantized ANN: int8 integer-dot shortlist + exact fixed-point cosine re-rank, full chain hash-checked"),
    QuerySpec("emb_kmeans_assign", emb_kmeans_assign, KMEANS_SQL, "k-means assignment step over seed centroids (broadcast, fixed-point exact)"),
    QuerySpec("sim_cosine_topk", sim_cosine_topk, SIM_TOPK_SQL, "exact brute-force cosine top-k (fixed-point exact)"),
    QuerySpec("sim_lsh_topk", sim_lsh_topk, None, "hyperplane-LSH bucketed ANN + exact re-rank (rows-only; md5 twin carries the value check)"),
    QuerySpec("sim_lsh_topk_md5", sim_lsh_topk_md5, _lsh_md5_sql(), "portable LSH ANN chain: literal md5 sign matrix + fixed-point projections, bit-exact oracle"),
    QuerySpec("sim_ivf_topk", sim_ivf_topk, _ivf_sql(), "IVF ANN chain: seeds + fixed-point Lloyd step + shortlist + exact re-rank, bit-exact oracle"),
    QuerySpec("dedup_embedding_cosine", dedup_embedding_cosine, DEDUP_EMB_SQL, "embedding-cosine near-dup pairs (exact, fixed-point stable)"),
    QuerySpec("emb_semantic_dedup", emb_semantic_dedup, SEMANTIC_DEDUP_SQL, "SemDeDup: k-means-clustered semantic dedup, pairs generated within clusters only (nlist-fold cut of the quadratic term)"),
    QuerySpec("emb_norm_stats", emb_norm_stats, EMB_NORM_SQL, "per-label embedding norm statistics"),
]
