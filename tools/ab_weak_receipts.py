"""A/B receipts for the two weak entries without one (r10 verdict #2):

q_topk_window — current plan (rev agg → row_number window over nation,
which Spark 3.5+/4.x already partial-limits via WindowGroupLimit) vs an
explicit two-phase group-local top-k (per-input-partition top-3 per
nation collapsed BEFORE the nation exchange, then a tiny final window).
If the explicit rewrite cannot beat the window plan, the residual is
the rev aggregation's 1.5M-group shuffle + the engine's window
constant, i.e. an irreducibility profile like q_json_extract's.

q_range_join — current plan (one scan, one user_id shuffle, value-range
window frame) vs the generic two-bucket interval join (error side
filtered EARLY, both sides shuffled on (user_id, bucket), no full
per-user sort) vs a range-partitioned window variant
(repartitionByRange(user, ts) feeding the same frame — tests whether
aligning the exchange with the sort order shaves the sort constant).

Protocol (r9 hazard rules, same as tools/ab_q03_order.py): REBUILD the
DataFrame every rep (fresh QueryExecution — collect-reuse skips
completed shuffle stages and times only the last one), execute via the
noop sink, INTERLEAVE variants within each rep round so box-load drift
hits every arm equally, report min over reps. All arms are
value-checked equal before timing.

Usage: python tools/ab_weak_receipts.py [SF_DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import bench as B
from tailpipe_spark.functions.exact import dsum
from tailpipe_spark.session import build_session, read_table


def _rev(spark, sf_dir):
    o = read_table(spark, f"{sf_dir}/orders.parquet")
    c = read_table(spark, f"{sf_dir}/customer.parquet")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(dsum("o_totalprice", "revenue"))
    )


def topk_current(spark, sf_dir) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        _rev(spark, sf_dir)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("c_nationkey", "rk")
    )


def topk_two_phase(spark, sf_dir) -> DataFrame:
    """Explicit two-phase: per-(input-partition, nation) top-3 via a
    bounded sort_array(collect_list)[:3] partial (map-side combine —
    each agg buffer holds that partition's rows for that nation, and
    emits 3), explode the <= 3*P*25 candidates, final window over the
    tiny set. The struct sorts (revenue DESC, custkey ASC) via
    (-revenue, custkey) fields."""
    rev = _rev(spark, sf_dir).withColumn("__pid", F.spark_partition_id())
    cand = (
        rev.groupBy("c_nationkey", "__pid")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("revenue")).alias("negrev"),
                            F.col("c_custkey").alias("c_custkey"),
                            F.col("revenue").alias("revenue"),
                        )
                    )
                ),
                1,
                3,
            ).alias("top")
        )
        .select("c_nationkey", F.explode("top").alias("t"))
        .select("c_nationkey", F.col("t.c_custkey"), F.col("t.revenue"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_custkey", "c_nationkey", "revenue", "rk")
        .orderBy("c_nationkey", "rk")
    )


def topk_no_presort(spark, sf_dir) -> DataFrame:
    """Control: the window WITHOUT the final presentation orderBy —
    isolates how much of the wall is the global range sort of 75 rows
    (should be ~nothing; if it isn't, the driver-side range-partition
    sampling job is the constant)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        _rev(spark, sf_dir)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


def _events(spark, sf_dir):
    return read_table(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    )


def range_current(spark, sf_dir) -> DataFrame:
    from tailpipe_spark.operators.range_join import following_window_agg

    agg = following_window_agg(
        _events(spark, sf_dir),
        time_col="ts",
        span_seconds=300,
        by=["user_id"],
        aggs={"n_following": F.count(F.lit(1)), "first_next_id": F.min("event_id")},
        strict_after=True,
    )
    return (
        agg.filter((F.col("event_type") == "error") & (F.col("n_following") > 0))
        .select(F.col("event_id").alias("err_id"), "n_following", "first_next_id")
        .orderBy("err_id")
    )


def range_bucket_join(spark, sf_dir) -> DataFrame:
    """Generic two-bucket interval join, error side filtered EARLY:
    only ~1/6 of events drive frames, so the left shuffle carries the
    errors alone; the right side shuffles all events twice-bucketed.
    No per-user full sort — the SMJ sorts on (user, bucket) instead."""
    e = _events(spark, sf_dir)
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("ets")
    )
    span = 300 * 1_000_000
    bkt = lambda col: (F.unix_micros(col) / F.lit(span)).cast("long")  # noqa: E731
    # merge hint: at sf10 AQE otherwise RUNTIME-BROADCASTS the filtered
    # error side (~1.7M rows) and kills the 8g driver ("Not enough
    # memory to build and broadcast", measured 2026-08-15) — and that
    # broadcast scales with SF, so SMJ is the only cluster-survivable
    # shape for this arm anyway.
    l = err.withColumn("__bkt", bkt(F.col("ets"))).hint("merge")
    r = e.select("event_id", "user_id", "ts").withColumn(
        "__bkt", F.explode(F.array(bkt(F.col("ts")) - 1, bkt(F.col("ts"))))
    )
    j = l.join(r, ["user_id", "__bkt"]).filter(
        (F.col("ts") > F.col("ets"))
        & (F.unix_micros(F.col("ts")) <= F.unix_micros(F.col("ets")) + F.lit(span))
    )
    return (
        j.groupBy("err_id")
        .agg(
            F.count(F.lit(1)).alias("n_following"),
            F.min("event_id").alias("first_next_id"),
        )
        .orderBy("err_id")
    )


def range_rangepart(spark, sf_dir) -> DataFrame:
    """Window frame over repartitionByRange(user_id, ts): the exchange
    delivers rows already in window order, so WindowExec's sort is a
    near-no-op — tests how much of the constant is the sort vs the
    shuffle itself. (Range partitioning keys each user's rows together
    because user_id leads the range key.)"""
    from tailpipe_spark.operators.range_join import following_window_agg

    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    n = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e = e.repartitionByRange(n, "user_id", "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(1, 300 * 1_000_000)
    )
    agg = e.withColumn("n_following", F.count(F.lit(1)).over(w)).withColumn(
        "first_next_id", F.min("event_id").over(w)
    )
    return (
        agg.filter((F.col("event_type") == "error") & (F.col("n_following") > 0))
        .select(F.col("event_id").alias("err_id"), "n_following", "first_next_id")
        .orderBy("err_id")
    )


CASES = {
    "topk": {
        "current": topk_current,
        "two_phase": topk_two_phase,
        "no_presort": topk_no_presort,
    },
    "range": {
        "current": range_current,
        "bucket_join": range_bucket_join,
        "rangepart": range_rangepart,
    },
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=".bench/sf10")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--only", choices=sorted(CASES), help="run one case group")
    args = ap.parse_args()
    if args.only:
        for k in [k for k in CASES if k != args.only]:
            del CASES[k]
    sf_dir = os.path.abspath(args.sf_dir)

    total = B._input_bytes(sf_dir)
    spark = build_session(
        "ab-weak", shuffle_partitions=B._auto_shuffle_partitions(total)
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(B._auto_max_partition_bytes(total))
    )
    # warm the page cache + JIT
    for t in ("orders", "customer", "events"):
        read_table(spark, f"{sf_dir}/{t}.parquet").count()

    for qname, variants in CASES.items():
        # value-check every arm (topk no_presort compares unsorted)
        rows = {}
        for k, build in variants.items():
            df = build(spark, sf_dir)
            rows[k] = sorted(map(tuple, df.select(*sorted(df.columns)).collect()))
        base = rows[next(iter(rows))]
        for k, r in rows.items():
            assert r == base, f"{qname}/{k} disagrees with current"
        print(f"{qname}: all {len(variants)} arms value-identical "
              f"({len(base)} rows)", flush=True)
        times = {k: [] for k in variants}
        for _ in range(args.reps):
            for k, build in variants.items():
                df = build(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times[k].append(time.perf_counter() - t0)
        for k, ts in times.items():
            print(
                f"{qname} {k:12s} min {min(ts):6.3f}  reps "
                f"{[round(x, 3) for x in ts]}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
