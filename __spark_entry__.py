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
# Round 8 (r7 verdict #7): position 1 is q01_pricing_summary — its
# driver-facing surface reverted to DOUBLE this round after the r7
# DECIMAL-surface hash failure (CORRECTNESS_r07) — followed by every
# plan changed in r8, then the hash twins of the rows-only-by-design
# entries (so the twins get periodic driver signal), the rows-only
# entries themselves, and finally the oldest-driver-signal cohort
# (r4 then r5) to refresh their signal.
_VERIFY_FIRST = [
    # --- r9 rotation (r8 verdict ask #2): changed plans first, then
    # strictly oldest-driver-signal-first. Signal ages computed from
    # CORRECTNESS_r01..r08: the r5 cohort (q_row_numbering ... sec_*)
    # last saw driver hash signal in round 5, the TPC-H q02-q22 tail +
    # streaming + misc cohort in round 6. The driver samples the first
    # ~50 entries; the r6 tail past the cut leads the r10 rotation. ---
    # changed in r9: json first-wins positional guard, range-join null
    # pre-filter, rollup writer lock on the sink path; NEW in r9
    # second wave: manifest-layout rollup (q_rollup_manifest); third
    # wave: q03 dim-first join reorder (A/B'd at sf10, -40%)
    "q_rollup_manifest",
    "q03_shipping_priority",
    "q05_local_supplier",
    "q_json_extract",
    "q_range_join",
    "q_rollup_continuous",
    "q_row_numbering",
    "q_scalar_functions",
    "q_sessionize",
    "q_set_ops",
    "q_set_ops_all",
    "q_skew_two_phase_agg",
    "q_string_functions",
    "q_struct_roundtrip",
    "q_time_bucket_hourly",
    "q_topk_window",
    "q_tp_enrichment",
    "q_validate_nulls",
    "q_window_functions",
    "sec_entropy_scan",
    "sec_error_burst",
    "sec_ip_classify",
    "dedup_incremental",
    "mm_audio_stats",
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
    "q_cohort_retention",
    "q_collation",
    "q_funnel",
    "q_histogram",
    "q_lateral_topk",
    "q_null_semantics",
    "q_recursive_cte",
    "q_stream_dedup",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_string_agg",
    "q_trend_linear",
    "q_unpivot",
    "q_upsert_latest",
    "q_variant_json",
    "q_window_ranks",
    "sec_zscore_outliers",
    "text_hash_embedding",
]



def _rotated() -> dict:
    # local_only specs (DECIMAL-surfaced exactness twins) never reach the
    # driver: its hasher fetches the DuckDB oracle pandas-style, turning
    # DECIMAL(38,6) into float64 while Spark collects Decimal — the
    # type-tagged hashes diverge on identical values (round-7 incident).
    registry = {n: s for n, s in build_registry().items() if not s.local_only}
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
