"""A/B: q05 (and q03's big-scale branch) on a bucketed co-located
layout vs the plain-parquet shuffle plan, at a given SF dir (r9 verdict
ask #2 — sf10 is the interesting point).

The hypothesis: DuckDB wins q05 at every scale because single-node it
never shuffles; Spark's structural equivalent is to PRE-BUCKET the two
fact tables by the join key (`bucketBy(N, orderkey).sortBy(orderkey)
.saveAsTable`), which turns the lineitem⋈orders exchange — the largest
shuffle in both queries — into a zero-Exchange sort-merge join whose
tasks each read bucket i of both sides. This is exactly what a 100 TB
deployment does to its hot join keys (Hive/Spark bucketing, Iceberg
bucket partition transforms).

Protocol (r9 hazard rules): every rep REBUILDS the DataFrame and
executes via noop save (fresh QueryExecution — no shuffle-stage reuse);
variants interleave within each rep round so box-load drift hits both
arms equally; report min over reps.

Usage:
    python tools/ab_bucketed_q05.py [SF_DIR] [--buckets N] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import bench as B
from tailpipe_spark.functions.exact import dsum
from tailpipe_spark.queries import build_registry
from tailpipe_spark.session import build_session, read_table


def q05_from(
    li: DataFrame,
    orders: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    fact_join: str = "default",
) -> DataFrame:
    """q05 body with the two fact tables injected (same plan text as
    queries/relational.py::q05_local_supplier — keep in sync).

    ``fact_join="merge"`` hints the li⋈orders join to SortMergeJoin:
    at sf10 the STATIC plan broadcasts the filtered orders side (its
    post-projection size estimate sits under the 64 MB threshold), so
    the bucketed layout has no exchange to remove unless the broadcast
    is suppressed — the interesting A/B is co-located zero-exchange
    SMJ vs rebuilding a ~5.7M-row broadcast hash table per execution."""
    region = read_table(spark, f"{sf_dir}/region.parquet").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, f"{sf_dir}/nation.parquet")
    cust = read_table(spark, f"{sf_dir}/customer.parquet")
    sup = read_table(spark, f"{sf_dir}/supplier.parquet")
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    if fact_join == "merge":
        orders = orders.hint("merge")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q03_from(li: DataFrame, orders: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """q03 body (left-semi customer reduction, r9 plan) with injected
    fact tables."""
    cust = read_table(spark, f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = orders.filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = li.filter(F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp"))
    reduced = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi"
    )
    return (
        li.join(reduced, li.l_orderkey == reduced.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.environ.get("SPARK_GRAFT_SF_DIR", ".bench/sf10"))
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-write", action="store_true", help="bucketed tables already exist")
    args = ap.parse_args()
    sf_dir = os.path.abspath(args.sf_dir)

    total_bytes = B._input_bytes(sf_dir)
    spark = build_session("ab-bucketed", shuffle_partitions=B._auto_shuffle_partitions(total_bytes))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if total_bytes < (1 << 30) else "true")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(B._auto_max_partition_bytes(total_bytes)))

    from tailpipe_spark.bucketing import write_bucketed

    # saveAsTable registers in the session's in-memory catalog: the
    # data files persist under spark-warehouse/ but the BUCKETING SPEC
    # does not survive the session, so a fresh session must re-write
    # (--skip-write only skips within a warm catalog).
    have_tables = args.skip_write and all(
        spark.catalog.tableExists(t) for t in ("ab_li_bucketed", "ab_ord_bucketed")
    )
    if not have_tables:
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("ab_li_bucketed", "ab_ord_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            # a crashed prior session leaves the managed location behind
            # with no catalog entry; saveAsTable then refuses
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        t0 = time.time()
        # repartition on the bucket key first → ONE file per bucket, so
        # the sortBy metadata lets SMJ elide its per-side Sort (Spark
        # only trusts bucket sort order for single-file buckets)
        write_bucketed(
            read_table(spark, f"{sf_dir}/lineitem.parquet")
            .repartition(args.buckets, "l_orderkey"),
            "ab_li_bucketed", ["l_orderkey"], args.buckets, sort_cols=["l_orderkey"],
        )
        write_bucketed(
            read_table(spark, f"{sf_dir}/orders.parquet")
            .repartition(args.buckets, "o_orderkey"),
            "ab_ord_bucketed", ["o_orderkey"], args.buckets, sort_cols=["o_orderkey"],
        )
        print(f"layout write: {time.time() - t0:.1f}s ({args.buckets} buckets)", flush=True)

    # warm both sources
    read_table(spark, f"{sf_dir}/lineitem.parquet").count()
    spark.table("ab_li_bucketed").count()
    spark.table("ab_ord_bucketed").count()
    registry = build_registry()

    def pq(spark=spark):
        return (
            read_table(spark, f"{sf_dir}/lineitem.parquet"),
            read_table(spark, f"{sf_dir}/orders.parquet"),
        )

    def bk(spark=spark):
        return spark.table("ab_li_bucketed"), spark.table("ab_ord_bucketed")

    cases = {
        "q05_parquet": lambda: q05_from(*pq(), spark, sf_dir),
        "q05_bucketed": lambda: q05_from(*bk(), spark, sf_dir),
        # suppress the orders broadcast → the li⋈orders SMJ shape:
        # parquet pays two fact exchanges, bucketed pays none
        "q05_parquet_smj": lambda: q05_from(*pq(), spark, sf_dir, fact_join="merge"),
        "q05_bucketed_smj": lambda: q05_from(*bk(), spark, sf_dir, fact_join="merge"),
        "q03_parquet": lambda: q03_from(*pq(), spark, sf_dir),
        "q03_bucketed": lambda: q03_from(*bk(), spark, sf_dir),
    }
    # sanity: every arm returns the identical result
    want = {q: sorted(map(str, cases[f"{q}_parquet"]().collect())) for q in ("q05", "q03")}
    for name, build in cases.items():
        q = name.split("_", 1)[0]
        got = sorted(map(str, build().collect()))
        assert got == want[q], f"{name}: result differs"
    print("all arms: results identical", flush=True)

    times: dict[str, list[float]] = {k: [] for k in cases}
    for rep in range(args.reps):
        for name, build in cases.items():
            df = build()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
            print(f"rep{rep} {name}: {times[name][-1]:.3f}", flush=True)

    out = {k: {"min": round(min(v), 3), "reps": [round(t, 3) for t in v]} for k, v in times.items()}
    # exchange-count receipt: bucketed SMJ must drop the fact exchanges
    for name, build in cases.items():
        plan = build()._jdf.queryExecution().executedPlan().toString()
        out[name]["exchanges"] = plan.count("Exchange")
        out[name]["smj"] = plan.count("SortMergeJoin")
    print(json.dumps(out, indent=1))
    with open("/tmp/ab_bucketed_out.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
