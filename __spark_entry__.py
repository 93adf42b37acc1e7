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
    "sim_ivf_topk",
    "q_approx_distinct",  # rows-only by design
    "q_ewma_last",  # rows-only (oracle conversion planned this round)
    "q_sketch_rollup",  # rows-only by design
    "dedup_simhash",  # rows-only by design
    # --- new in r7 (q_ewma_last above is also now hash-checked: its
    # rows-only slot converted to a bit-exact list_reduce oracle) ---
    "mm_video_frames",  # real GIF LZW kernel vs arithmetic oracle
    "dedup_simhash_md5",  # portable 60-bit simhash chain, bit-exact oracle
    "sim_lsh_topk_md5",  # portable LSH ANN chain, bit-exact oracle
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

_VERIFY_FIRST_R6 = [
    # the r5 verdict's explicit ask — plan changed in d873dcf (and again
    # in the r6 expr-string rework): pinned first so the ~50-entry
    # sample always covers them no matter how many new entries land
    "dedup_minhash_lsh",
    "dedup_simhash",
    "q02_min_cost_supplier",
    "q04_order_priority",
    "q06_revenue_forecast",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_value",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "q20_promotion_suppliers",
    "q21_late_suppliers",
    "q22_global_sales",
    "mm_audio_stats",  # new in r6: real WAV kernel vs arithmetic oracle
    "data_split_counts",  # new in r6: deterministic hash split
    "data_stratified_sample",
    "data_sample_fraction",
    "data_mixture_rates",
    "pipeline_quality_dedup_split",  # new in r6: full-chain composition
    "q_stream_static_join",  # new in r6: stream-static broadcast join
    "q_stream_dedup",  # new in r6: streaming dropDuplicates == batch
    "q_unpivot",  # new in r6: unpivot/melt
    "q_lateral_topk",  # new in r6: LATERAL decorrelation
    "q_rollup_continuous",  # new in r6: continuous aggregate union
    "q_sketch_rollup",  # new in r6: mergeable HLL rollup (rows-only)
    "q_trend_linear",  # new in r6: exact OLS trend
    "q_ewma_last",  # new in r6: grouped applyInPandas EWMA (rows-only)
    "q_recursive_cte",  # new in r6: WITH RECURSIVE gap-fill
    "q_variant_json",  # new in r6: VARIANT parse-once navigation
    "q_collation",  # new in r6: COLLATE UTF8_LCASE predicate
    "q_funnel",  # new in r6: ordered funnel stages
    "q_cohort_retention",  # new in r6: cohort retention matrix
    "text_hash_embedding",  # new in r6: feature-hashing embedding
    "dedup_incremental",  # new in r6: batch-vs-index incremental dedup
    "q_upsert_latest",  # new in r6: CDC latest-state compaction
    "q_histogram",  # new in r6: equi-width histogram
    "q_string_agg",  # new in r6: LISTAGG WITHIN GROUP
    "q_stream_stream_join",  # new in r6: watermarked interval join
    "q_stream_budget_alerts",  # new in r6: arbitrary-state crossings
    "sec_zscore_outliers",  # new in r6: exact z-score anomalies
    "q_null_semantics",  # new in r6: null-safe equality join
    "q_window_ranks",  # new in r6: rank-family window zoo
    "q_try_semantics",  # new in r6: TRY_CAST/try_divide
    "q_array_functions",  # new in r6: array algebra zoo
    "q_map_functions",  # new in r6: map-type zoo
    "q_argmax_agg",  # new in r6: max_by/min_by arg-max aggregation
    "q_grouping_id",  # new in r6: GROUPING()/GROUPING_ID over CUBE
    "q_bool_aggs",  # new in r6: bool_and/bool_or/count_if
    "q_bitwise",  # new in r6: bitwise aggregates + shifts
    "dedup_lsh_verified",  # new in r6: LSH->verify chain, oracle-checked
    "dedup_resolve",  # new in r6: components -> keep/drop decisions
    "q_stream_window_counts",  # new in r6: streaming==batch oracle proof
    "q_stream_sessionize",  # new in r6: streaming session windows
    "text_tfidf_topterms",  # new in r6: rational-idf tf-idf top terms
    "q_asof_join",
    "q_window_frames",
    "q_array_explode",
    "text_language_id",
    "text_quality",
    "text_token_stats",
    "text_doc_tokens",
    "text_fingerprint",
    "text_pii_redact",
    "text_bpe_tokens",
    "text_chunk",
    "text_pack",
    "text_repetition",
    "text_url_domains",
    "text_decontaminate",
    "dedup_components",
    "emb_kmeans_assign",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "dedup_embedding_cosine",
    "emb_norm_stats",
    # r6 plan-affecting work below is fronted as it lands:
    "dedup_ngram_jaccard",
    "dedup_minhash_fast",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier",
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
