"""Plan-shape regression tests: the physical plans that make the engine
scale must not silently degrade (SURVEY.md §4)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q05_broadcasts_dims_no_nlj(spark):
    from tailpipe_spark.queries.relational import q05_local_supplier

    plan = _plan(q05_local_supplier(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_timestamp_filter_pushdown(spark):
    from tailpipe_spark.session import read_table

    li = read_table(spark, "/root/testdata/sf0.001/lineitem.parquet")
    df = li.filter(F.col("l_shipdate") <= F.lit("1997-01-01").cast("timestamp")).select(
        "l_quantity"
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the two referenced columns reach the scan
    assert "ReadSchema: struct<l_quantity:double,l_shipdate" in plan


def test_asof_join_has_no_join_operator(spark):
    from tailpipe_spark.queries.timeseries import q_asof_join

    plan = _plan(q_asof_join(spark, "/root/testdata/sf0.001"))
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin"):
        assert bad not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union+window: one key shuffle (+AQE reuse)


def test_range_join_is_equi_join(spark):
    from tailpipe_spark.queries.timeseries import q_range_join

    plan = _plan(q_range_join(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_exact_is_partial_agg(spark):
    from tailpipe_spark.operators.dedup import exact_dedup_stats
    from tailpipe_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    plan = _plan(exact_dedup_stats(docs))
    assert "partial_count" in plan  # map-side combine before the shuffle
