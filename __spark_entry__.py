"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
full operator inventory from SURVEY.md §2 (see
tailpipe_spark/queries/*) for the DuckDB-oracle correctness harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tailpipe_spark.queries import build_registry

# The driver's per-round correctness harness samples at most ~50 registry
# entries in dict order. Rotating here (in the harness-facing entry file,
# NOT in the product registry, whose order stays stable for real
# consumers) puts the entries the driver has not yet hash-verified this
# cycle at the front so every query gets the hard signal across rounds.
# Round 7 (the r6 verdict's explicit ask): positions 1-12 are exactly
# the 12 oracle-bearing entries that have NEVER received the driver's
# hash signal in any CORRECTNESS_rN (registry growth outpaced the
# 50-entry sample); after this round every oracle entry has had the
# hard signal at least once. Positions 13-20 are the rows-only /
# early-round entries that likewise never appeared in r1-r6 artifacts.
# Then: entries whose plan code changed in r7 (adopted rule: any
# changed plan goes to the front the same round), then the
# oldest-verified entries (r4 cohort) to refresh their signal.
_VERIFY_FIRST = [
    # --- the 12 never-driver-verified oracle entries (r6 verdict #1) ---
    "dedup_lsh_verified",
    "dedup_resolve",
    "q_argmax_agg",
    "q_array_functions",
    "q_bitwise",
    "q_bool_aggs",
    "q_grouping_id",
    "q_map_functions",
    "q_stream_sessionize",
    "q_stream_window_counts",
    "q_try_semantics",
    "text_tfidf_topterms",
    # --- remaining entries with no r1-r6 driver appearance at all ---
    "q01_fast",
    "dedup_minhash_fast",
    "sim_lsh_topk",
    "q_approx_distinct",  # rows-only by design
    "q_ewma_last",  # converted r7: bit-exact list_reduce oracle
    "q_sketch_rollup",  # rows-only by design
    "dedup_simhash",  # rows-only by design
    # --- new in r7 ---
    "mm_video_frames",  # real GIF LZW kernel vs arithmetic oracle
    "dedup_simhash_md5",  # portable 60-bit simhash chain, bit-exact oracle
    "sim_lsh_topk_md5",  # portable LSH ANN chain, bit-exact oracle
    "sim_ivf_topk",  # r7: fixed-point Lloyd means -> whole chain hash-checked
    "q_range_join",  # r7 plan change: explode_side=left + extra_on key
    "q_json_extract",  # r7 plan change: variant_get parse
    "q01_pricing_summary",  # r7 plan change: sums surfaced as DECIMAL(38,6)
    # --- r7 plan-code changes (sampling clamp, rollup update-mode) ---
    "data_sample_fraction",
    "data_split_counts",
    "data_stratified_sample",
    "data_mixture_rates",
    "pipeline_quality_dedup_split",
    "q_rollup_continuous",
    "q_stream_budget_alerts",
    # --- oldest driver signal (r4 cohort) ---
    "q_asof_join",
    "text_language_id",
    "text_quality",
    "text_token_stats",
    "text_doc_tokens",
    "text_fingerprint",
    "sim_cosine_topk",
    "dedup_embedding_cosine",
    "emb_norm_stats",
    "q_array_explode",
    "q_window_frames",
    "text_pii_redact",
    "text_bpe_tokens",
    "text_chunk",
    "text_pack",
    "emb_kmeans_assign",
    "text_repetition",
    "text_url_domains",
    "text_decontaminate",
    "dedup_components",
]



def _rotated() -> dict:
    registry = build_registry()
    front = {n: registry[n] for n in _VERIFY_FIRST if n in registry}
    rest = {n: s for n, s in registry.items() if n not in front}
    return {**front, **rest}


_REGISTRY = _rotated()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tailpipe_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _REGISTRY.items()
        if spec.oracle is not None
    }
