"""r14 verdict ask #5: final q_range_join A/B — time-bloom prefilter.

The entry's plan is the 1-shuffle following_window_agg (value-range
window frame). The window still sorts/shuffles ALL events, yet only
20.1% of rows can ever sit in an error's 5-minute following frame
(measured: a row at time t is in some error frame iff an error by the
same user exists in time bucket(t) or bucket(t)-1; survivors 20,056 /
100,000 at sf0.1 and 2,005,600 / 10,000,000 at sf10 — the fixture's
selectivity is scale-invariant).

Variant B: build a Bloom filter over the cells {(user, bkt(err)),
(user, bkt(err)+1)} of all error rows (operators/bloom.py codegen'd
bitmap, broadcast), probe every event's (user, bkt(t)) at the scan,
and run the SAME window agg over survivors only. No false negatives
(frame members are within one bucket of their driver by construction);
false positives only add discarded non-driver rows. Values must be
IDENTICAL.

Interleaved min-of-N at $SPARK_GRAFT_SF_DIR; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.operators.bloom import (
    _auto_num_bits,
    bloom_build,
    bloom_might_contain,
)
from tailpipe_spark.operators.range_join import following_window_agg
from tailpipe_spark.queries.timeseries import q_range_join
from tailpipe_spark.session import build_session, read_table

SPAN = 300
SEED = 4242


def variant_bloom(spark, sf_dir):
    e = read_table(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    )
    bkt = F.floor(F.unix_micros(F.col("ts")) / F.lit(SPAN * 1_000_000))
    errors = e.filter(F.col("event_type") == "error")
    n_cells = 2 * errors.count()
    num_bits = _auto_num_bits(n_cells)
    cells = errors.select(
        "user_id",
        F.explode(F.array(bkt, bkt + 1)).alias("__c"),
    ).select(F.xxhash64("user_id", "__c", F.lit(SEED)).alias("__k"))
    bf = bloom_build(cells, "__k", num_bits=num_bits)
    probe_key = F.xxhash64("user_id", bkt.alias("__c"), F.lit(SEED))
    survivors = (
        e.crossJoin(F.broadcast(bf))
        .where(
            (F.col("event_type") == "error")
            | bloom_might_contain(F.col("bf"), probe_key, num_bits=num_bits)
        )
        .drop("bf")
    )
    agg = following_window_agg(
        survivors,
        time_col="ts",
        span_seconds=SPAN,
        by=["user_id"],
        aggs={
            "n_following": F.count(F.lit(1)),
            "first_next_id": F.min("event_id"),
        },
        strict_after=True,
    )
    return (
        agg.filter((F.col("event_type") == "error") & (F.col("n_following") > 0))
        .select(F.col("event_id").alias("err_id"), "n_following", "first_next_id")
        .orderBy("err_id")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench/sf10")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = build_session("ab-range-bloom")

    # value identity first (full result hash both plans)
    a = q_range_join(spark, sf_dir)
    b = variant_bloom(spark, sf_dir)
    ha = a.select(F.sha2(F.concat_ws("|", *a.columns), 256).alias("h")).agg(
        F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    hb = b.select(F.sha2(F.concat_ws("|", *b.columns), 256).alias("h")).agg(
        F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    identical = (ha["s"], ha["n"]) == (hb["s"], hb["n"])

    def run(df_fn):
        df = df_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    # interleaved
    t_a, t_b = [], []
    for _ in range(reps):
        a2 = q_range_join(spark, sf_dir)
        t0 = time.time()
        a2.write.format("noop").mode("overwrite").save()
        t_a.append(time.time() - t0)
        b2 = variant_bloom(spark, sf_dir)
        t0 = time.time()
        b2.write.format("noop").mode("overwrite").save()
        t_b.append(time.time() - t0)
    out = {
        "sf_dir": sf_dir,
        "identical": identical,
        "rows": int(ha["n"]),
        "current_window_min": round(min(t_a), 3),
        "bloom_prefilter_min": round(min(t_b), 3),
        "current_reps": [round(t, 3) for t in t_a],
        "bloom_reps": [round(t, 3) for t in t_b],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
