"""Similarity-search queries over ``embeddings`` (array<float>, dim 64).

The exact path accumulates dot/norm through decimal casts so values are
bit-identical to the DuckDB oracle (see operators.similarity); the LSH
path is approximate by construction and gets a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailpipe_spark.operators import similarity as sim
from tailpipe_spark.queries import QuerySpec

_PROBE_ID = 0
_K = 10

#: DuckDB decimal-exact sum of products; x/y are unnested element pairs
_DOT = "CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)"
_SQX = "CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)"
_SQY = "CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailpipe_spark.session import configure_runtime

    configure_runtime(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


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
  SELECT probe_id, vec_id, ROUND(dotp / (SQRT(nx) * SQRT(ny)), 12) AS cosine
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


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    norm = F.round(F.sqrt(sim._exact_sq_norm(F.col("embedding"))), 12)
    per_row = emb.select("label", norm.alias("norm"))
    return (
        per_row.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("norm").cast("decimal(27,12)")).cast("double").alias("sum_norm"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
        .orderBy("label")
    )


EMB_NORM_SQL = """
WITH per_row AS (
  SELECT label,
         ROUND(SQRT(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                            AS DECIMAL(30,15))) AS DOUBLE)), 12) AS norm
  FROM (SELECT label, vec_id, unnest(embedding) AS x FROM embeddings)
  GROUP BY label, vec_id)
SELECT label, COUNT(*) AS n_vectors,
       CAST(SUM(CAST(norm AS DECIMAL(27,12))) AS DOUBLE) AS sum_norm,
       MIN(norm) AS min_norm, MAX(norm) AS max_norm
FROM per_row GROUP BY label ORDER BY label
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs baseline; the
    LSH-restricted variant is sim_ivf_topk/sim_lsh_topk territory)."""
    from tailpipe_spark.operators.similarity import cosine_pairs_threshold

    emb = _emb(spark, sf_dir)
    return cosine_pairs_threshold(emb, threshold=0.4).orderBy("id_a", "id_b")


DEDUP_EMB_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         unnest(a.embedding) AS x, unnest(b.embedding) AS y
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
stats AS (
  SELECT id_a, id_b, {_DOT} AS dotp, {_SQX} AS nx, {_SQY} AS ny
  FROM pairs GROUP BY id_a, id_b)
SELECT id_a, id_b, ROUND(dotp / (SQRT(nx) * SQRT(ny)), 12) AS cosine
FROM stats
WHERE ROUND(dotp / (SQRT(nx) * SQRT(ny)), 12) >= 0.4
ORDER BY id_a, id_b
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantized cluster shortlist + exact re-rank
    (rows-only: centroid refinement averages are engine-specific)."""
    from tailpipe_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == _PROBE_ID)
    out = ivf_topk(emb, probe, k=_K, nlist=8, nprobe=3)
    return out.select("probe_id", "vec_id", "cosine").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )


SPECS = [
    QuerySpec("sim_cosine_topk", sim_cosine_topk, SIM_TOPK_SQL, "exact brute-force cosine top-k (decimal-exact)"),
    QuerySpec("sim_lsh_topk", sim_lsh_topk, None, "hyperplane-LSH bucketed ANN + exact re-rank (rows-only)"),
    QuerySpec("sim_ivf_topk", sim_ivf_topk, None, "IVF coarse-quantizer ANN + exact re-rank (rows-only)"),
    QuerySpec("dedup_embedding_cosine", dedup_embedding_cosine, DEDUP_EMB_SQL, "embedding-cosine near-dup pairs (exact, decimal-stable)"),
    QuerySpec("emb_norm_stats", emb_norm_stats, EMB_NORM_SQL, "per-label embedding norm statistics"),
]
