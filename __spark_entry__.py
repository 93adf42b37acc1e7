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
# Round 5: the three queries the TIMESTAMP_NTZ drift broke in r4 (fixed
# in session.configure_runtime — must re-verify hash-green), then the 24
# entries the r4 driver sample skipped.
_VERIFY_FIRST = [
    "q_window_functions",
    "q_sessionize",
    "q_range_join",
    "q_json_extract",
    "q_tp_enrichment",
    "q_validate_nulls",
    "q_cli_filters",
    "q_ingest_filter",
    "q_struct_roundtrip",
    "q_row_numbering",
    "mm_checksums",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_fast",
    "q_correlated_subquery",
    "q_having_conditional",
    "q_string_functions",
    "q_date_functions",
    "q_describe_query",
    "sec_ip_classify",
    "sec_error_burst",
    "sec_entropy_scan",
    "q_skew_two_phase_agg",
    "q_percentiles",
    "q_pivot",
    "q_set_ops_all",
    "q_ilike",
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
