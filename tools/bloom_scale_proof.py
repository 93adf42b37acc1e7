"""Scale-prove bloom_prune_semi_join: shuffle-volume and wall-time vs
the plain shuffle semi join in the regime the operator targets — a
non-broadcastable small side (autoBroadcastJoinThreshold=-1, the
cluster-scale situation where the dim side is too big to broadcast but
its KEY SET still fits an auto-sized 16-bits/key bitmap, 16 MiB cap).

Claim under test: the bloom probe drops the non-matching fact fraction
BEFORE the semi-join shuffle, so the variant's shuffle write volume is
~selectivity × the plain plan's fact-side volume, and the gap widens
linearly with fact size. Timings use the plan-once + per-rep noop-save
protocol (each rep rebuilds the DataFrame and writes to the noop sink,
so no completed-stage reuse — the r9 bench hazard).

Run: python tools/bloom_scale_proof.py [rows ...]
Default rows: 6000000 24000000. Appends a section to SCALE_PROOF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.operators.bloom import bloom_prune_anti_join, bloom_prune_semi_join
from tailpipe_spark.session import build_session
from tools.relational_scale_proof import StageMeter, make_lineitem, make_orders

REPS = 3


def small_side(orders):
    """~4% of orders: urgent priority (1/5) x first-fifth date window."""
    return orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    ).select(F.col("o_orderkey").alias("l_orderkey"))


def agg(df):
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )


def main() -> None:
    n_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [6_000_000, 24_000_000]
    spark = build_session(
        "bloom-scale-proof",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4098"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the regime under test: small side NOT statically or adaptively
    # broadcastable (the bf one-row bitmap keeps its explicit hint)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    meter = StageMeter(spark)
    lines = ["", f"## Bloom-prune semi join vs plain shuffle semi join ({time.strftime('%Y-%m-%d')})", ""]
    lines.append("Small side ~4% selective; broadcast joins disabled (the")
    lines.append("non-broadcastable-dim regime). min-of-%d wall, rebuild + noop-save per rep." % REPS)
    lines.append("")
    lines.append("| fact rows | plan | wall s (min) | shuffle MB | result rows |")
    lines.append("|---|---|---|---|---|")
    for n in n_list:
        li = make_lineitem(spark, n).persist()
        orders = make_orders(spark, n // 4).persist()
        li.count(), orders.count()
        meter.delta()  # absorb materialization stages

        def plain():
            return agg(li.join(small_side(orders), "l_orderkey", "left_semi"))

        def bloomed():
            return agg(bloom_prune_semi_join(li, small_side(orders), "l_orderkey"))

        def plain_anti():
            return agg(li.join(small_side(orders), "l_orderkey", "left_anti"))

        def bloomed_anti():
            return agg(bloom_prune_anti_join(li, small_side(orders), "l_orderkey"))

        for name, fn in (
            ("plain semi (SMJ)", plain),
            ("bloom-pruned semi", bloomed),
            ("plain anti (SMJ)", plain_anti),
            ("bloom-partitioned anti", bloomed_anti),
        ):
            walls, mb, nrows = [], None, None
            for _ in range(REPS):
                df = fn()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
                d = meter.delta()
                if mb is None:
                    mb = d.get("shuffle_write_mb")
                    nrows = df.count()
                    meter.delta()
            row = f"| {n:,} | {name} | {min(walls):.2f} | {mb} | {nrows} |"
            lines.append(row)
            print(row, flush=True)
        li.unpersist(), orders.unpersist()
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROOF.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
