"""Prefix-filter ASYMPTOTIC receipt on a boilerplate-heavy corpus
(r10 verdict #6).

The r10 receipt (tools/prefix_scale_proof.py) ran on the replicated
linear corpus, where BOTH candidate sets grow linearly — honest, but it
can't show the asymptotic separation the AllPairs prefix filter exists
for. This proof synthesizes the corpus web-scale dedup actually sees:

- D base docs of unique filler (40 seeded-hash tokens → every filler
  3-gram has df=1);
- 20% of docs append one of 200 shared BOILERPLATE blocks (30 tokens) —
  so each block's grams land in a df = D/1000 bucket that grows
  LINEARLY with D, and the inverted index generates C(df,2) candidate
  pairs per gram from it: QUADRATIC in D. None of those pairs is a true
  pair at t=0.8 (two docs sharing only the block have J ≈ 0.26) — the
  inverted plan verifies and discards every one;
- 0.5% of docs get a planted near-twin (one filler token changed,
  J ≥ 0.8) — the true pairs, growing linearly.

At t=0.8 the prefix is each doc's ~20% RAREST grams; boilerplate grams
(df = hundreds) sort behind the df=1 filler grams and never enter the
prefix, so prefix candidates track the TRUE pair count (linear) while
inverted candidates blow up quadratically. Both plans return the
identical verified pair set — asserted here per size, not assumed.

Candidate metrics per plan: generated = Σ_gram C(df,2) (the join work
the plan actually performs, pre-dedup) and distinct candidate pairs.

Protocol: per-rep rebuild + noop-save, min-of-REPS; sizes doubled to
D=500k so the quadratic term dominates the top point. Appends a
section to SCALE_PROOF.md.

Run: python tools/prefix_dup_corpus_proof.py [sizes ...]
Defaults: 125000 250000 500000.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailpipe_spark.operators import dedup as dd
from tailpipe_spark.session import build_session

REPS = 3
N = 3
CAP = 1000
T = 0.8
FILLER_TOK = 40
BP_BLOCKS = 200
BP_TOK = 30


def _filler(idcol, ntok=FILLER_TOK):
    # ntok pseudo-words, globally ~unique (xxhash64 of (doc id, pos))
    return F.transform(
        F.sequence(F.lit(1), F.lit(ntok)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(idcol, i), F.lit(10**12)).cast("string"),
        ),
    )


def _boilerplate(idcol):
    # 20% of docs (id % 5 == 0) append block (id/5) % BP_BLOCKS: 30
    # tokens shared VERBATIM by every doc carrying that block. The
    # block id comes from id/5, NOT id: id % 200 over ids that are all
    # multiples of 5 aliases to only 40 distinct blocks, whose gram df
    # then crosses the 1000 hot-gram cap between D=125k and D=251k and
    # the cap DROPS them — the first run of this proof measured exactly
    # that collapse (inverted candidates 220M -> 47k). Real web
    # boilerplate sits below any sane cap, which is the regime this
    # corpus models; df here stays <= D/1000 <= 502 at every size.
    block = F.pmod(F.floor(idcol / F.lit(5)).cast("long"), F.lit(BP_BLOCKS))
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(BP_TOK)),
        lambda i: F.concat(F.lit("bp"), block.cast("string"), F.lit("_"), i.cast("string")),
    )
    return F.when(F.pmod(idcol, F.lit(5)) == 0, toks).otherwise(F.array())


def make_corpus(spark: SparkSession, d: int) -> DataFrame:
    base = spark.range(d).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.concat(_filler(F.col("id")), _boilerplate(F.col("id"))), " ").alias("text"),
    )
    # planted twins: ids [d, d + d/200) mirror src = id - d with the
    # LAST filler token swapped -> J >= 0.8 vs src, the true pairs
    n_twin = d // 200
    src = F.col("id") - F.lit(d)
    twin_filler = F.concat(
        F.slice(_filler(src), 1, FILLER_TOK - 1), F.array(F.lit("twinmark"))
    )
    twins = spark.range(d, d + n_twin).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.concat(twin_filler, _boilerplate(src)), " ").alias("text"),
    )
    return base.unionByName(twins)


def gram_stats(docs) -> tuple[int, int]:
    """(generated candidates = sum C(df,2), distinct candidate pairs)
    over the df-capped gram index — the inverted plan's pair space."""
    grams = dd.token_ngram_hashes(docs, "text", N)
    dfs = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") <= CAP
    )
    gen = dfs.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long")
    ).collect()[0][0]
    kept = grams.join(dfs.select("gram"), "gram", "left_semi")
    a = kept.select(F.col("doc_id").alias("id_a"), "gram")
    b = kept.select(F.col("doc_id").alias("id_b"), "gram")
    distinct = (
        a.join(b, "gram").where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct().count()
    )
    return int(gen or 0), distinct


def prefix_stats(docs) -> tuple[int, int]:
    """Same two metrics over the t=0.8 rare-first PREFIX index."""
    from pyspark.sql import Window

    grams = dd.token_ngram_hashes(docs, "text", N)
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    kept = grams.join(gram_df, "gram").where(F.col("__df") <= CAP)
    w = Window.partitionBy("doc_id").orderBy("__df", "gram")
    sz = F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    pref = (
        kept.select("doc_id", "gram", "__df",
                    F.row_number().over(w).alias("__r"), sz.alias("__sz"))
        .where(F.col("__r") <= F.col("__sz") - F.ceil(F.lit(T) * F.col("__sz")) + 1)
        .select("doc_id", "gram")
    )
    dfs = pref.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    gen = dfs.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long")
    ).collect()[0][0]
    a = pref.select(F.col("doc_id").alias("id_a"), "gram")
    b = pref.select(F.col("doc_id").alias("id_b"), "gram")
    distinct = (
        a.join(b, "gram").where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct().count()
    )
    return int(gen or 0), distinct


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [125_000, 250_000, 500_000]
    spark = build_session("prefix-dup-proof")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "",
        f"## Prefix filter on a boilerplate-heavy corpus — the asymptotic receipt ({time.strftime('%Y-%m-%d')})",
        "",
        f"Synthetic corpus (tools/prefix_dup_corpus_proof.py): unique filler",
        f"({FILLER_TOK} hash tokens/doc), 20% of docs share one of {BP_BLOCKS} verbatim",
        f"{BP_TOK}-token boilerplate blocks (df grows linearly with D -> inverted",
        f"candidates grow QUADRATICALLY; none is a true pair at t={T}), 0.5%",
        "planted near-twins (the true pairs, linear). 3-grams, df cap "
        f"{CAP}, min-of-{REPS} rebuild+noop walls. Both plans verified to return",
        "the identical pair set at every size.",
        "",
        "| D docs | true pairs | inv generated | inv distinct | pref generated | pref distinct | wall inv s | wall pref s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for d in sizes:
        docs = make_corpus(spark, d).persist()
        ndocs = docs.count()

        inv_gen, inv_dst = gram_stats(docs)
        prf_gen, prf_dst = prefix_stats(docs)

        def wall(fn):
            walls = []
            for _ in range(REPS):
                df = fn()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            return min(walls)

        w_inv = wall(lambda: dd.ngram_jaccard_pairs(
            docs, n=N, threshold=T, max_gram_df=CAP, corpus_size=ndocs))
        w_prf = wall(lambda: dd.prefix_jaccard_pairs(
            docs, n=N, threshold=T, max_gram_df=CAP))

        got_inv = sorted(map(tuple, dd.ngram_jaccard_pairs(
            docs, n=N, threshold=T, max_gram_df=CAP, corpus_size=ndocs
        ).select("id_a", "id_b").collect()))
        got_prf = sorted(map(tuple, dd.prefix_jaccard_pairs(
            docs, n=N, threshold=T, max_gram_df=CAP
        ).select("id_a", "id_b").collect()))
        assert got_inv == got_prf, f"plans disagree at D={d}"
        true_pairs = len(got_inv)

        row = (f"| {ndocs:,} | {true_pairs:,} | {inv_gen:,} | {inv_dst:,} "
               f"| {prf_gen:,} | {prf_dst:,} | {w_inv:.2f} | {w_prf:.2f} |")
        lines.append(row)
        print(row, flush=True)
        docs.unpersist()

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_PROOF.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
