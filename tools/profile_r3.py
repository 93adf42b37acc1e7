"""Round-3 profiling scratchpad: ngram-jaccard variants + range join.

Run: python tools/profile_r3.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from tailpipe_spark.operators import dedup as dd
from tailpipe_spark.session import build_session, read_table


def ngram_jaccard_collect(docs, n=3, threshold=0.2, max_gram_df=1000,
                          id_col="doc_id", text_col="text"):
    """Variant: groupBy(gram).collect_list(ids) — cap folded into the
    agg as a size filter, pairs generated with array ops (no self-join)."""
    grams = dd.token_ngrams(docs, text_col, n, id_col)
    buckets = (
        grams.groupBy("gram")
        .agg(F.collect_list(id_col).alias("ids"))
        .where(F.size("ids") <= max_gram_df)
    )
    sizes = (
        buckets.select(F.explode("ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a: F.filter(
                        F.transform(F.col("ids"), lambda b: F.struct(
                            F.least(a, b).alias("id_a"), F.greatest(a, b).alias("id_b"))),
                        lambda s: a < s["id_b"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    common = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("common"))
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sz_a, "id_a").join(sz_b, "id_b")
        .select("id_a", "id_b",
                (F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def timeit(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s (min of {reps})")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    total = sum(
        os.path.getsize(os.path.join(r, n))
        for r, _d, ns in os.walk(sf_dir) for n in ns if n.endswith(".parquet")
    )
    spark = build_session("profile-r3", shuffle_partitions=max(8, min(2000, total // (64 << 20))))
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    docs.count()
    events = read_table(spark, f"{sf_dir}/events.parquet")
    events.count()

    def sink(df: DataFrame):
        df.write.format("noop").mode("overwrite").save()

    timeit("ngram cap=1000 (current)", lambda: sink(
        dd.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df=1000).orderBy("id_a", "id_b")))
    timeit("ngram cap=None", lambda: sink(
        dd.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df=None).orderBy("id_a", "id_b")))
    timeit("ngram collect_list cap=1000", lambda: sink(
        ngram_jaccard_collect(docs).orderBy("id_a", "id_b")))

    # sanity: identical results
    a = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df=1000)
    b = ngram_jaccard_collect(docs)
    na, nb = a.count(), b.count()
    diff = a.select("id_a", "id_b").exceptAll(b.select("id_a", "id_b")).count()
    print(f"pairs current={na} collect={nb} except={diff}")

    from tailpipe_spark.queries import build_registry
    reg = build_registry()
    timeit("q_range_join (registry)", lambda: sink(reg["q_range_join"].fn(spark, sf_dir)))
    timeit("q01_fast", lambda: sink(reg["q01_fast"].fn(spark, sf_dir)))
    timeit("q01_decimal", lambda: sink(reg["q01_pricing_summary"].fn(spark, sf_dir)))


if __name__ == "__main__":
    main()
