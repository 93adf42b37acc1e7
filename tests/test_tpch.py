"""Plan-shape pins for the adapted TPC-H suite (queries/tpch.py).

Value correctness is carried by the DuckDB oracle harness
(tools/check_correctness.py / the driver's CORRECTNESS artifact); these
tests pin the *physical plan* properties that make each query scale —
pushdown, broadcast choice, no cartesian fallback — so a regression
shows up locally before it costs a cluster run.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from tailpipe_spark.queries import build_registry, tpch

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_registry_includes_full_tpch_suite():
    reg = build_registry()
    names = [s.name for s in tpch.SPECS]
    assert len(names) == 19
    for n in names:
        assert n in reg
        assert reg[n].oracle is not None  # every TPC-H entry is value-checked


def test_q06_predicates_and_pruning_reach_scan(spark):
    plan = _plan(tpch.q06_revenue_forecast(spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]
    # only the four referenced columns are read
    read = plan.split("ReadSchema")[1][:200]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read
    assert "l_orderkey" not in read


def test_q19_disjunction_is_equi_join_not_cartesian(spark):
    plan = _plan(tpch.q19_disjunctive(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q09_broadcasts_all_dims(spark):
    plan = _plan(tpch.q09_product_profit(spark, SF))
    # part/supplier/nation are all broadcast; only the orders join may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q17_reuses_partkey_exchange(spark):
    """The fact is shuffled on l_partkey once for the avg and reused
    (ReusedExchange / same-key exchange) for the join-back."""
    plan = _plan(tpch.q17_small_qty_revenue(spark, SF))
    assert "CartesianProduct" not in plan
    # at most: one partkey exchange (+1 if reuse misses), one final single-partition agg
    assert plan.count("Exchange hashpartitioning") <= 3


def test_q21_single_orderkey_shuffle_for_windows(spark):
    """All three order-scoped window aggregates share one hash
    partitioning on l_orderkey — the two self-joins of canonical Q21
    are gone."""
    plan = _plan(tpch.q21_late_suppliers(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1


@pytest.mark.parametrize(
    "name",
    [
        "q02_min_cost_supplier",
        "q04_order_priority",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q22_global_sales",
    ],
)
def test_tpch_no_cartesian_anywhere(spark, name):
    reg = build_registry()
    plan = _plan(reg[name].fn(spark, SF))
    assert "CartesianProduct" not in plan
    # the only NLJ allowed is the deliberate 1-row scalar broadcast
    if "BroadcastNestedLoopJoin" in plan:
        assert name in ("q15_top_supplier", "q22_global_sales", "q02_min_cost_supplier")


def test_tpch_smoke_all_return_rows(spark):
    """Every suite entry executes at sf0.001 and yields a stable schema;
    row counts may legitimately be 0 at this tiny scale for the
    threshold queries."""
    for spec in tpch.SPECS:
        df = spec.fn(spark, SF)
        assert df.columns, spec.name
        df.limit(1).collect()
