"""Round-6 profiling: decompose dedup_ngram_jaccard / dedup_minhash_fast
into plan stages to find where the wall-clock goes at sf0.1, plus a
small-query drift check (q03 et al. under r3-style vs r5-style confs).

Run: python tools/profile_r6.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from tailpipe_spark.operators import dedup as dd
from tailpipe_spark.session import build_session, parquet_row_count, read_table


def timeit(label, fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    print(f"{label}: min={min(times):.3f} all={[round(t, 3) for t in times]}")
    return min(times)


def sink(df: DataFrame):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    total = sum(
        os.path.getsize(os.path.join(r, n))
        for r, _d, ns in os.walk(sf_dir) for n in ns if n.endswith(".parquet")
    )
    spark = build_session("profile-r6", shuffle_partitions=max(8, min(2000, total // (64 << 20))))
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    docs = read_table(spark, f"{sf_dir}/documents.parquet", parallelize=True)
    docs.count()
    nrows = parquet_row_count(f"{sf_dir}/documents.parquet")
    print(f"documents rows={nrows}")

    # --- ngram_jaccard decomposition ---
    grams_str = dd.token_ngrams(docs, "text", 3, "doc_id")
    grams = grams_str.select("doc_id", F.xxhash64("gram").alias("gram"))
    timeit("1. tokens only", lambda: sink(dd._tokens(docs, "text", 3, "doc_id")))
    timeit("2. grams (string)", lambda: sink(grams_str))
    timeit("3. grams (hashed)", lambda: sink(grams))

    def buckets():
        return grams.groupBy("gram").agg(F.collect_list("doc_id").alias("ids")) \
            .where(F.size("ids") <= 1000)

    timeit("4. buckets agg", lambda: sink(buckets()))
    timeit("5. bucket_pairs + common", lambda: sink(
        dd.bucket_pairs(buckets(), ["gram"], max_bucket_size=1000)
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("common"))))
    timeit("6. full no orderBy", lambda: sink(
        dd.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df=1000,
                               corpus_size=nrows)))
    timeit("7. full + orderBy (bench)", lambda: sink(
        dd.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df=1000,
                               corpus_size=nrows).orderBy("id_a", "id_b")))

    # --- minhash_fast decomposition ---
    timeit("m1. signatures only", lambda: sink(
        dd.minhash_signatures(docs, 3, 12)))
    timeit("m2. full no orderBy", lambda: sink(
        dd.minhash_lsh_pairs(docs, n=3, num_hashes=12, bands=4, corpus_size=nrows)))
    timeit("m3. full + orderBy (bench)", lambda: sink(
        dd.minhash_lsh_pairs(docs, n=3, num_hashes=12, bands=4,
                             corpus_size=nrows).orderBy("id_a", "id_b")))

    # --- shuffle-partition sensitivity ---
    for sp in (4, 8, 16, 32):
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        timeit(f"ngram full sp={sp}", lambda: sink(
            dd.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df=1000,
                                   corpus_size=nrows).orderBy("id_a", "id_b")))
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # --- small-query drift: q03 / q01_fast under varying reps ---
    from tailpipe_spark.queries import build_registry
    reg = build_registry()
    for t in ("lineitem", "orders", "customer"):
        read_table(spark, f"{sf_dir}/{t}.parquet").count()
    for q in ("q01_fast", "q03_shipping_priority", "q_time_bucket_hourly", "q_sessionize"):
        timeit(q, lambda q=q: sink(reg[q].fn(spark, sf_dir)), reps=5)


if __name__ == "__main__":
    main()
