"""AQE multi-consumer audit (r11 verdict "what's wrong" #2).

The distributed_cumsum incident: a plan whose two consumers of one
exchange agreed only via non-AQE exchange reuse silently broke when AQE
turned the consumers into independent query stages (48k/50k prefix sums
wrong, only in the 100 TB configuration). These tests force AQE ON for
every other registry plan the audit flagged as multi-consumer or
salt-nondeterministic — the salted two-phase agg, the sketch rollup,
both bloom-pruned filter joins (through the auto planner), and the span
excision — and require value-identical results against the AQE-off run
of the same entry. The per-operator safety ARGUMENTS live in the
operator docstrings (skew._salt_col, bloom_prune_anti_join,
remove_duplicated_spans, q_quantile_sketch_rollup); this module is the
regression pin that the arguments stay true on real plans.
"""

import pytest

from tailpipe_spark.queries import build_registry

SF_DIR = "/root/testdata/sf0.001"

AUDITED = [
    "q_skew_two_phase_agg",
    "q_quantile_sketch",
    "q_quantile_sketch_rollup",
    "q_bloom_prune_join",
    "q_bloom_prune_anti",
    "q_auto_filter_join",
    "dedup_span_removal",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", AUDITED)
def test_entry_identical_with_aqe_forced_on(spark, name):
    spec = build_registry()[name]
    old = spark.conf.get("spark.sql.adaptive.enabled", "false")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        baseline = _rows(spec.fn(spark, SF_DIR))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        # twice: AQE re-plans per execution, so a nondeterministic
        # disagreement would also show run-to-run
        for _ in range(2):
            assert _rows(spec.fn(spark, SF_DIR)) == baseline
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
