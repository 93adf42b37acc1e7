"""Query inventory: every operator class from SURVEY.md §2 expressed as
a named (Spark DataFrame plan, DuckDB oracle SQL) pair.

The driver runs each Spark plan and its oracle side-by-side at sf0.01
and hash-compares results (CORRECTNESS_r{N}.json). Entries with
``oracle=None`` are non-SQL-expressible (or engine-specific hashing)
and get a rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


# The driver's per-round harness checks at most ~50 registry entries in
# dict order (CORRECTNESS_r01 contains exactly the first 50). Rotate the
# entries it has NOT yet hash-verified to the front so every query gets
# the hard signal across rounds.
_VERIFY_FIRST = [
    "q_correlated_subquery",
    "q_having_conditional",
    "q_string_functions",
    "q_date_functions",
    "q_describe_query",
    "sec_ip_classify",
    "sec_error_burst",
    "sec_entropy_scan",
    "q_skew_two_phase_agg",
    "q_pivot",
    "q_set_ops_all",
    "q_ilike",
    # new in round 2 — never driver-verified either
    "q_percentiles",
    "dedup_minhash_fast",
]


def build_registry() -> dict[str, QuerySpec]:
    from tailpipe_spark.queries import advanced, relational, timeseries, textdata, vectors_q

    registry: dict[str, QuerySpec] = {}
    for mod in (relational, timeseries, textdata, vectors_q, advanced):
        for spec in mod.SPECS:
            if spec.name in registry:
                raise ValueError(f"duplicate query name {spec.name}")
            registry[spec.name] = spec
    front = {n: registry[n] for n in _VERIFY_FIRST if n in registry}
    rest = {n: s for n, s in registry.items() if n not in front}
    return {**front, **rest}
