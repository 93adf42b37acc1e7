"""A/B: q03/q05 join order — current (fact⋈orders first, selective dim
last) vs reordered (selective broadcast dims reduce orders FIRST, then
the lineitem join).

The reordered plans land the segment/region selectivity (1/5) before
the big fact shuffle instead of after, shrinking the orders side 5x and
letting AQE convert the lineitem join to broadcast when the reduced
side fits. Interleaved variants in one process, min-of-N, per the bench
noise protocol.

Usage: python tools/ab_q03_order.py [sf_dir] [reps]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from tailpipe_spark.session import build_session, read_table  # noqa: E402
from tailpipe_spark.functions.exact import dsum  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = build_session()


def t(name):
    return read_table(spark, f"{sf_dir}/{name}.parquet")


# --- q03 -----------------------------------------------------------------

def q03_tables():
    cust = t("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t("orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = t("lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return cust, orders, li


def q03_finish(joined):
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q03_current():
    cust, orders, li = q03_tables()
    return q03_finish(
        li.join(orders, li.l_orderkey == orders.o_orderkey).join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
    )


def q03_reordered():
    cust, orders, li = q03_tables()
    reduced = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return q03_finish(li.join(reduced, li.l_orderkey == reduced.o_orderkey))


# --- q05 -----------------------------------------------------------------

def q05_tables():
    region = t("region").filter(F.col("r_name") == "ASIA")
    nation = t("nation")
    cust = t("customer")
    sup = t("supplier")
    orders = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t("lineitem")
    return region, nation, cust, sup, orders, li


def q05_finish(joined):
    return (
        joined.groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q05_current():
    region, nation, cust, sup, orders, li = q05_tables()
    return q05_finish(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )


def q05_reordered():
    region, nation, cust, sup, orders, li = q05_tables()
    asia_nation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    asia_cust = cust.join(
        F.broadcast(asia_nation), cust.c_nationkey == asia_nation.n_nationkey
    )
    reduced = orders.join(
        F.broadcast(asia_cust), orders.o_custkey == asia_cust.c_custkey
    )
    return q05_finish(
        li.join(reduced, li.l_orderkey == reduced.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == sup.s_nationkey)
    )


def q03_semi():
    # The customer join in q03 is a PURE FILTER (no customer columns
    # survive), so reduce orders with a left-semi join instead of an
    # inner join. Catalyst's size estimate for a semi join is bounded
    # by the left side (an inner join output gets the useless product
    # estimate), so the reduced orders side KEEPS its broadcastability:
    # at small SF Catalyst still broadcasts it into lineitem (zero
    # fact-side shuffles), at large SF the 1/5 reduction shrinks the
    # sort-merge join. One static plan, scale-adaptive behavior.
    cust, orders, li = q03_tables()
    reduced = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi"
    )
    return q03_finish(li.join(reduced, li.l_orderkey == reduced.o_orderkey))


def q05_reordered_shuffle():
    # Same dim-first reduction, but orders ⋈ asia_cust as a plain
    # shuffle join: customer scales with SF, so a hard broadcast of
    # 1/5 of it is wrong at cluster scale. The reduction win must come
    # from shuffling 4.6M orders on custkey instead of shuffling the
    # (li ⋈ orders) intermediate — broadcast is a bonus AQE can add
    # when the reduced side happens to fit.
    region, nation, cust, sup, orders, li = q05_tables()
    asia_nation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    asia_cust = cust.join(
        F.broadcast(asia_nation), cust.c_nationkey == asia_nation.n_nationkey
    )
    reduced = orders.join(asia_cust, orders.o_custkey == asia_cust.c_custkey)
    return q05_finish(
        li.join(reduced, li.l_orderkey == reduced.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == sup.s_nationkey)
    )


def q05_semi():
    # Semi-reduce orders by ASIA customer keys (bounded size estimate,
    # so Catalyst keeps the option of broadcasting the reduced side
    # into lineitem), then rejoin customer AFTER the fact join for
    # c_nationkey/n_name — by then the intermediate is ASIA-only, 1/5
    # the rows the dim-last shape shuffles on custkey. cust join left
    # unhinted: Catalyst broadcasts it at small SF, SMJ at scale.
    region, nation, cust, sup, orders, li = q05_tables()
    asia_nation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    asia_cust = cust.join(
        F.broadcast(asia_nation), cust.c_nationkey == asia_nation.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    reduced = orders.join(
        asia_cust.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_semi",
    )
    return q05_finish(
        li.join(reduced, li.l_orderkey == reduced.o_orderkey)
        .join(asia_cust, F.col("o_custkey") == asia_cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == sup.s_nationkey)
    )


VARIANTS = {
    "q03": {
        "current": q03_current,
        "reordered": q03_reordered,
        "semi": q03_semi,
    },
    "q05": {
        "current": q05_current,
        "reordered": q05_reordered,
        "reordered_shuffle": q05_reordered_shuffle,
        "semi": q05_semi,
    },
}

# Timing protocol matches bench.py: REBUILD the DataFrame every rep and
# execute via the noop sink. Repeated .collect() on the SAME DataFrame
# object is NOT a valid rep — Spark caches the QueryExecution's RDD
# lineage, so completed shuffle map stages are skipped and later reps
# time only the final stage (observed: q05@sf10 0.03 s/rep under
# collect-reuse vs 2+ s honest). A fresh build per rep gives fresh RDDs,
# so scan/join/shuffle run in full every time; the one pre-loop rep is
# the untimed warm-up.
for qname, variants in VARIANTS.items():
    rows = {k: build().collect() for k, build in variants.items()}  # warm + check
    base = [tuple(r) for r in rows["current"]]
    for k, r in rows.items():
        assert [tuple(x) for x in r] == base, f"{qname}/{k} disagrees"
    times = {k: [] for k in variants}
    for _ in range(reps):
        for k, build in variants.items():
            df = build()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(qname, k, "min", round(min(ts), 3), "reps", [round(x, 3) for x in ts])
