"""Scale-prove prefix_jaccard_pairs vs the inverted-index plan
(ngram_jaccard_pairs): candidate-pair volume and wall time at the same
(n, threshold, cap) on the replicated 50k-doc corpus (.bench/sf1).

Claim under test: prefix filtering shrinks the CANDIDATE space — the
quadratic term of a similarity join — because candidates are generated
only from each doc's rare-first |g|-⌈t|g|⌉+1 gram prefix, and the
rare-first order pushes exactly the big (hot-gram) buckets into the
suffix. Both plans return the identical verified pair set (the registry
oracle pins that); this proof measures the work, not the answer.

Candidate definitions measured:
- inverted-index: distinct (a,b) doc pairs sharing >=1 kept gram —
  the pair space ngram_jaccard_pairs must verify;
- prefix: distinct (a,b) pairs sharing >=1 PREFIX gram — the pair
  space prefix_jaccard_pairs verifies.

Timings use plan-once + per-rep rebuild + noop-save (the r9 bench
hazard protocol). Run AFTER other Spark jobs finish — wall numbers on
a contended box are noise.

Run: python tools/prefix_scale_proof.py [sf_dir] [thresholds ...]
Defaults: .bench/sf1 0.2 0.5 0.8. Appends a section to SCALE_PROOF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tailpipe_spark.operators import dedup as dd
from tailpipe_spark.session import build_session, read_table

REPS = 3
N = 3
CAP = 1000


def kept_grams(docs):
    grams = dd.token_ngram_hashes(docs, "text", N)
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    return grams.join(gram_df, "gram").where(F.col("__df") <= CAP)


def prefix_grams(kept, t):
    w = Window.partitionBy("doc_id").orderBy("__df", "gram")
    sz = F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ranked = kept.select(
        "doc_id", "gram", F.row_number().over(w).alias("__r"), sz.alias("__sz")
    )
    return ranked.where(
        F.col("__r") <= F.col("__sz") - F.ceil(F.lit(t) * F.col("__sz")) + 1
    ).select("doc_id", "gram")


def pair_count(g):
    a = g.select(F.col("doc_id").alias("id_a"), "gram")
    b = g.select(F.col("doc_id").alias("id_b"), "gram")
    return (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].replace(".", "").isdigit() else ".bench/sf1"
    ts = [float(a) for a in args if a.replace(".", "").isdigit()] or [0.2, 0.5, 0.8]
    spark = build_session("prefix-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, f"{sf_dir}/documents.parquet", parallelize=True).persist()
    ndocs = docs.count()

    kept = kept_grams(docs).persist()
    full_rows = kept.count()
    inv_cand = pair_count(kept.select("doc_id", "gram"))

    lines = ["", f"## Prefix-filtered vs inverted-index Jaccard join ({time.strftime('%Y-%m-%d')})", ""]
    lines.append(f"{ndocs:,} docs ({sf_dir}), 3-grams, df cap {CAP}: "
                 f"{full_rows:,} kept (doc,gram) rows; inverted-index candidate")
    lines.append(f"pairs (share >=1 gram): {inv_cand:,}. min-of-{REPS} wall, rebuild +")
    lines.append("noop-save per rep; identical verified output pinned by the registry oracle.")
    lines.append("")
    lines.append("| t | prefix (doc,gram) rows | prefix cand pairs | cand reduction | wall prefix s | wall inverted s |")
    lines.append("|---|---|---|---|---|---|")
    for t in ts:
        pg = prefix_grams(kept, t)
        p_rows = pg.count()
        p_cand = pair_count(pg)

        def wall(fn):
            walls = []
            for _ in range(REPS):
                df = fn()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            return min(walls)

        w_pref = wall(lambda: dd.prefix_jaccard_pairs(docs, n=N, threshold=t, max_gram_df=CAP))
        w_inv = wall(lambda: dd.ngram_jaccard_pairs(docs, n=N, threshold=t, max_gram_df=CAP, corpus_size=ndocs))
        red = f"{inv_cand / max(p_cand, 1):.1f}×"
        row = f"| {t} | {p_rows:,} | {p_cand:,} | {red} | {w_pref:.2f} | {w_inv:.2f} |"
        lines.append(row)
        print(row, flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROOF.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
