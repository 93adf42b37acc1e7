"""sf10 bucketed-layout A/B through the PRODUCT path (r10 verdict #1).

r10's receipt (tools/ab_bucketed_q05.py) proved the layout with an
ad-hoc saveAsTable; this rerun drives the shipping surface instead:
orders+lineitem are INGESTED into two engine workspaces (writer.append,
hive tp_* layout), one of which is then rewritten by the product CLI —
``compact --bucket-by o_orderkey:32`` / ``l_orderkey:32`` — and both
arms read back through ``Catalog.read_table`` (the bucketed arm gets
the session-catalog bucket-spec registration). The A/B times q05's SMJ
shape (the plan that survives at cluster scale where the filtered
orders side outgrows broadcast) and q03's big branch over both layouts.

Protocol: rebuild per rep, noop sink, arms interleaved per rep round,
min over reps; arms value-checked identical first.

Usage: python tools/ab_bucketed_product.py [SF_DIR] [--buckets N]
       [--reps N] [--fresh]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import bench as B
from tailpipe_spark import writer
from tailpipe_spark.catalog import Catalog
from tailpipe_spark.cli import main as cli_main
from tailpipe_spark.functions.exact import dsum
from tailpipe_spark.session import build_session, read_table

FACTS = {"orders": "o_orderdate", "lineitem": "l_shipdate"}


def ingest(spark: SparkSession, ws_dir: str, sf_dir: str) -> Catalog:
    cat = Catalog(ws_dir)
    for name, ts in FACTS.items():
        if name in cat.list_tables():
            continue
        df = (
            read_table(spark, f"{sf_dir}/{name}.parquet")
            .withColumn("tp_timestamp", F.col(ts))
            .withColumn("tp_partition", F.lit(name))
            .withColumn("tp_index", F.lit("default"))
        )
        cat.ensure_table(
            name, {f.name: f.dataType.simpleString() for f in df.schema.fields}
        )
        t0 = time.time()
        writer.append(cat, name, df)
        cat.refresh_file_index(name)
        print(f"ingested {name} into {ws_dir}: {time.time() - t0:.1f}s", flush=True)
    return cat


def q05_smj(spark, sf_dir, cat: Catalog) -> DataFrame:
    region = read_table(spark, f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    nation = read_table(spark, f"{sf_dir}/nation.parquet")
    cust = read_table(spark, f"{sf_dir}/customer.parquet")
    sup = read_table(spark, f"{sf_dir}/supplier.parquet")
    orders = (
        cat.read_table(spark, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .hint("merge")
    )
    li = cat.read_table(spark, "lineitem")
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


def q03(spark, sf_dir, cat: Catalog) -> DataFrame:
    cust = read_table(spark, f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = cat.read_table(spark, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = cat.read_table(spark, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
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
    ap.add_argument("sf_dir", nargs="?", default=".bench/sf10")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fresh", action="store_true", help="rebuild workspaces")
    args = ap.parse_args()
    sf_dir = os.path.abspath(args.sf_dir)
    root = os.path.join(os.path.dirname(sf_dir), "ab_product_ws")
    ws_plain, ws_bucketed = f"{root}/plain", f"{root}/bucketed"
    if args.fresh:
        shutil.rmtree(root, ignore_errors=True)

    total = B._input_bytes(sf_dir)
    spark = build_session(
        "ab-bucketed-product", shuffle_partitions=B._auto_shuffle_partitions(total)
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(B._auto_max_partition_bytes(total))
    )

    cat_p = ingest(spark, ws_plain, sf_dir)
    fresh_bucketed = not os.path.exists(ws_bucketed)
    if fresh_bucketed:
        # identical bytes, then the PRODUCT CLI rewrites the layout
        shutil.copytree(ws_plain, ws_bucketed)
    cat_b = Catalog(ws_bucketed)
    if fresh_bucketed or not cat_b.table_layout("orders"):
        for t, k in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
            t0 = time.time()
            rc = cli_main(
                ["--workspace", ws_bucketed, "compact", t,
                 "--bucket-by", f"{k}:{args.buckets}"]
            )
            assert rc == 0
            print(f"compact --bucket-by {t}: {time.time() - t0:.1f}s", flush=True)

    # warm
    for t in FACTS:
        cat_p.read_table(spark, t).count()
        cat_b.read_table(spark, t).count()
    for t in ("customer", "supplier", "nation", "region"):
        read_table(spark, f"{sf_dir}/{t}.parquet").count()

    cases = {
        "q05smj_plain": lambda: q05_smj(spark, sf_dir, cat_p),
        "q05smj_bucketed": lambda: q05_smj(spark, sf_dir, cat_b),
        "q03_plain": lambda: q03(spark, sf_dir, cat_p),
        "q03_bucketed": lambda: q03(spark, sf_dir, cat_b),
    }
    for q in ("q05smj", "q03"):
        a = [tuple(r) for r in cases[f"{q}_plain"]().collect()]
        b = [tuple(r) for r in cases[f"{q}_bucketed"]().collect()]
        assert a == b, f"{q} arms disagree"
        pp = cases[f"{q}_plain"]()._jdf.queryExecution().executedPlan().toString()
        bp = cases[f"{q}_bucketed"]()._jdf.queryExecution().executedPlan().toString()
        print(
            f"{q}: arms identical ({len(a)} rows); Exchanges "
            f"plain={pp.count('Exchange')} bucketed={bp.count('Exchange')}",
            flush=True,
        )

    times = {k: [] for k in cases}
    for _ in range(args.reps):
        for k, build in cases.items():
            df = build()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:18s} min {min(ts):6.3f}  reps {[round(x, 3) for x in ts]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
