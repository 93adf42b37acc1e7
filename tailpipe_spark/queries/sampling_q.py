"""Registry entries for the deterministic sampling/splitting operators
(operators/sampling.py) — train/val/test split, stratified per-group
sampling, fraction holdout, and source-mixture balancing, each with a
DuckDB oracle that replays the exact md5-hex bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailpipe_spark.operators import sampling
from tailpipe_spark.queries import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tailpipe_spark.session import read_table

    return read_table(spark, f"{sf_dir}/documents.parquet")


#: the oracle twin of sampling._bucket_hex
_BUCKET_SQL = "substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 4)"


def data_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 split assignment (row-local) aggregated per (split,
    source) — the artifact a pipeline writes to audit its split."""
    docs = _docs(spark, sf_dir)
    return (
        sampling.assign_split(docs)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split", "source")
    )


_B = _BUCKET_SQL.format(salt="split-v1")
DATA_SPLIT_SQL = f"""
SELECT CASE WHEN {_B} < 'e666' THEN 'train'
            WHEN {_B} < 'f333' THEN 'val'
            ELSE 'test' END AS split,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents
GROUP BY 1, 2
ORDER BY split, source
"""


def data_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-source sample (hash-ranked within group)."""
    docs = _docs(spark, sf_dir)
    return (
        sampling.stratified_sample(docs, "source", 5)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id")
    )


_S = _BUCKET_SQL.format(salt="strat-v1")
DATA_STRAT_SQL = f"""
SELECT source, doc_id, n_chars
FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY {_S}, doc_id) AS rk
  FROM documents
)
WHERE rk <= 5
ORDER BY source, doc_id
"""


def data_sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% holdout: the per-source membership counts
    prove the hash threshold, not just the global rate."""
    docs = _docs(spark, sf_dir)
    return (
        sampling.sample_fraction(docs, 0.10)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("source")
    )


_F = _BUCKET_SQL.format(salt="sample-v1")
DATA_FRACTION_SQL = f"""
SELECT source, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE {_F} < '{format(int(0.10 * 65536), "04x")}'
GROUP BY source
ORDER BY source
"""


def data_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture balancing: per-source sampling rate capping any
    source at 4% of corpus char mass."""
    docs = _docs(spark, sf_dir)
    return sampling.mixture_rates(docs, "source", "n_chars", 0.04).orderBy(
        "source"
    )


DATA_MIXTURE_SQL = """
WITH per_group AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS group_mass
  FROM documents GROUP BY source
),
total AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_mass FROM documents)
SELECT source, group_mass,
       LEAST(1.0, 0.04 * CAST(total_mass AS DOUBLE) / CAST(group_mass AS DOUBLE)) AS rate
FROM per_group, total
ORDER BY source
"""



def data_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PPS systematic sample, k=500 picks proportional to
    n_chars (operators/sampling.pps_systematic): all-BIGINT systematic
    walk over the distributed prefix sum — byte-identical across
    engines, hence the full hash oracle (an exp/log weighted reservoir
    could flip key order on a libm ulp). The oracle replays the same
    arithmetic over a single-node window cumsum; the Spark side uses
    the two-phase range-partitioned cumsum (no single-partition
    window)."""
    docs = _docs(spark, sf_dir)
    return sampling.pps_systematic(
        docs.select("doc_id", "n_chars"), "n_chars", k=500, phase=7
    ).orderBy("doc_id")


DATA_PPS_SQL = """
WITH w AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
  FROM documents WHERE n_chars > 0
),
cum AS (
  SELECT doc_id, weight,
         COALESCE(SUM(weight) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
         SUM(weight) OVER () AS W
  FROM w
),
picks AS (
  SELECT doc_id, weight,
         CAST(((lo + weight) * 500 - 7 + W - 1) // W
              - (lo * 500 - 7 + W - 1) // W AS BIGINT) AS n_picks
  FROM cum
)
SELECT doc_id, weight, n_picks FROM picks
WHERE n_picks > 0
ORDER BY doc_id
"""

SPECS = [
    QuerySpec("data_split_counts", data_split_counts, DATA_SPLIT_SQL, "deterministic 90/5/5 hash split (row-local md5 bucketing), audited per source"),
    QuerySpec("data_stratified_sample", data_stratified_sample, DATA_STRAT_SQL, "deterministic n-per-group sample via salted-hash window rank"),
    QuerySpec("data_sample_fraction", data_sample_fraction, DATA_FRACTION_SQL, "deterministic fraction holdout via hash threshold"),
    QuerySpec("data_mixture_rates", data_mixture_rates, DATA_MIXTURE_SQL, "source-mixture balancing rates (cap any source at a target share)"),
    QuerySpec("data_pps_sample", data_pps_sample, DATA_PPS_SQL, "deterministic PPS systematic sample (integer systematic walk over a distributed prefix sum)"),
]
