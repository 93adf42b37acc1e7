"""r14 optimization A/B: q_topk_window — aggregate orders BEFORE the
customer join (guide §2.3 "aggregate before you shuffle" applied to the
join input) vs the current join-then-aggregate plan.

Current plan: SMJ orders(15M @sf10) x customer on custkey — both sides
shuffled and SORTED — then hash-agg revenue per (custkey, nationkey)
(no extra exchange; the join's partitioning carries), then the nation
window. The 15M-row sort exists only to attach c_nationkey.

Variant: hash-aggregate the fixed-point revenue numerator per o_custkey
first (same single exchange over the same 15M rows, but map-side
partial aggregation reduces rows in flight and there is NO sort), then
join the ~1M aggregated rows to customer and finalize revenue. The sum
is the identical multiset of longs (long addition is associative and
commutative, exact), the custkey->nationkey attachment is a PK join, so
values are bit-identical; inner-join semantics drop order-less
customers and customer-less orders in both shapes.

Interleaved min-of-N noop saves at $SPARK_GRAFT_SF_DIR; value identity
via the house full-result hash. One JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tailpipe_spark.queries.relational import q_topk_window
from tailpipe_spark.session import build_session, read_table


def variant_preagg(spark, sf_dir):
    o = read_table(spark, f"{sf_dir}/orders.parquet")
    c = read_table(spark, f"{sf_dir}/customer.parquet")
    u = F.round(F.col("o_totalprice") * F.lit(1e6)).cast("long")
    rev_u = o.groupBy("o_custkey").agg(F.sum(u).alias("__u"))
    rev = rev_u.join(c, rev_u.o_custkey == c.c_custkey).select(
        "c_custkey",
        "c_nationkey",
        (F.col("__u").cast("double") / F.lit(1e6)).alias("revenue"),
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("c_nationkey", "rk")
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
    spark = build_session("ab-topk-preagg")

    variants = {"current": q_topk_window, "preagg": variant_preagg}
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
        "identical": identical,
        "hashes": hashes,
        **{f"{n}_min": round(min(t), 3) for n, t in times.items()},
        **{f"{n}_reps": [round(x, 3) for x in t] for n, t in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
