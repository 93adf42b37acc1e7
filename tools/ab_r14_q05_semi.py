"""r14 optimization A/B: q05 — customer as a LEFT SEMI filter, and q03
— group by orderkey only, attach (date, priority) to the top-10 rows.

q05: the plan joins customer inner on o_custkey and later filters
c_nationkey == s_nationkey, but NO customer column survives to the
output (n_name arrives via supplier.s_nationkey -> nation). The
customer join is therefore a pure filter and the q03 semi-join lesson
applies: express it as a LEFT SEMI join on BOTH equi conditions
(custkey match AND nation match). Row multiplicity is unchanged
(c_custkey is a PK: inner had <=1 match), so values are identical;
the fact side no longer carries customer payload columns through the
join, and Catalyst's semi output-size estimate (bounded by the left
side) keeps the scale-adaptive broadcast behavior intact.

q03: the agg groups by (l_orderkey, o_orderdate, o_orderpriority) but
o_orderdate/o_orderpriority are functionally dependent on l_orderkey
(orders PK), so the group IS l_orderkey; grouping by the single bigint
key and attaching the two payload columns to only the top-10 rows
AFTER the TakeOrdered makes the agg exchange rows half as wide. The
top-10 selection orders by (revenue DESC, l_orderkey ASC) — both
available pre-attachment — so the same 10 groups survive.

Interleaved min-of-N noop saves; value identity via full-result hash.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.functions.exact import dsum, dsum_fp_revenue
from tailpipe_spark.queries.relational import q03_shipping_priority, q05_local_supplier
from tailpipe_spark.session import build_session, read_table


def variant_q05_semi(spark, sf_dir):
    region = read_table(spark, f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    nation = read_table(spark, f"{sf_dir}/nation.parquet")
    cust = read_table(spark, f"{sf_dir}/customer.parquet")
    sup = read_table(spark, f"{sf_dir}/supplier.parquet")
    orders = read_table(spark, f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            cust,
            (F.col("o_custkey") == cust.c_custkey)
            & (F.col("s_nationkey") == cust.c_nationkey),
            "left_semi",
        )
    )
    return (
        fact.join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def variant_q03_narrow(spark, sf_dir):
    cust = read_table(spark, f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    reduced = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi"
    )
    top = (
        li.join(reduced, li.l_orderkey == reduced.o_orderkey)
        .groupBy("l_orderkey")
        .agg(dsum_fp_revenue("l_extendedprice", "l_discount", "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )
    return (
        top.join(reduced, top.l_orderkey == reduced.o_orderkey)
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
    )


def _result_hash(df):
    r = df.select(
        F.sha2(F.concat_ws("|", *df.columns), 256).alias("h")
    ).agg(
        F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (str(r["s"]), int(r["n"]))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench/sf10")
    reps = int(os.environ.get("AB_REPS", "5"))
    which = os.environ.get("AB_WHICH", "q05")
    spark = build_session(f"ab-{which}")

    if which == "q05":
        variants = {"current": q05_local_supplier, "semi": variant_q05_semi}
    else:
        variants = {"current": q03_shipping_priority, "narrow": variant_q03_narrow}

    hashes = {n: _result_hash(fn(spark, sf_dir)) for n, fn in variants.items()}
    identical = len(set(hashes.values())) == 1

    times: dict[str, list[float]] = {n: [] for n in variants}
    for name, fn in variants.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for name, fn in variants.items():
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    out = {
        "sf_dir": sf_dir,
        "which": which,
        "identical": identical,
        "hashes": hashes,
        **{f"{n}_min": round(min(t), 3) for n, t in times.items()},
        **{f"{n}_reps": [round(x, 3) for x in t] for n, t in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
