"""r14 optimization A/B: data_token_budget — bound the prefix BEFORE
the prefix sum (guide §1.1 first-principles: the query needs a
12,000-token prefix, so don't cumsum a 10M-doc corpus).

Every row's q_words is >= 1 (split of the non-null normalized text is
never empty), so the maximal prefix with inclusive sum <= budget has
at most `budget` rows. A distributed TakeOrdered of the top
budget-many rows by the ranking therefore contains every selectable
row, and the running sum over that bounded prefix equals the running
sum over the full corpus for those rows (ranks are contiguous from 1).

current: featurize -> distributed_cumsum(persist_input) -> filter.
          Featurizes once + caches; sketch/offsets/rows plan.
pruned:  featurize -> TakeOrdered(budget) -> bounded window cumsum ->
          filter. ONE featurize pass, no persist, no sketch collect;
          the single-partition window is bounded by the budget
          CONSTANT (12,000 narrow rows), not by data scale.
prunedx: pruned + q_words computed as space-count+1 over the collapsed
          normalized text instead of materializing the split array
          (identical by construction on single-space-collapsed text).

Value identity via full-result hash. Interleaved min-of-N noop saves.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tailpipe_spark.operators import text as tx
from tailpipe_spark.queries.textdata import _TOKEN_BUDGET, _docs, data_token_budget
from tailpipe_spark.session import build_session


def _pruned(spark, sf_dir, splitfree: bool):
    docs = _docs(spark, sf_dir, parallel=True)
    if splitfree:
        from tailpipe_spark.operators.dedup import normalize_text

        norm = normalize_text(F.col("text"))
        n_chars = F.length(norm)
        n_words = n_chars - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + F.lit(1)
        avg_word_len = (n_chars - (n_words - 1)) / n_words
        q_keep = (
            (n_words >= 5)
            & (n_words <= 100000)
            & (avg_word_len >= 2.0)
            & (avg_word_len <= 12.0)
        )
        feats = docs.select(
            "doc_id",
            n_words.alias("q_words"),
            F.when(q_keep, F.lit(0)).otherwise(F.lit(1)).alias("not_keep"),
            (-n_words).alias("neg_words"),
        )
    else:
        feats = tx.quality_features(docs).select(
            "doc_id",
            "q_words",
            F.when(F.col("q_keep"), F.lit(0)).otherwise(F.lit(1)).alias("not_keep"),
            (-F.col("q_words")).alias("neg_words"),
        )
    # guard the >=1 unit bound in-plan: violated loudly, never silently
    guarded = F.when(
        F.assert_true(
            F.col("q_words") >= 1, F.lit("budget prune requires q_words >= 1")
        ).isNull(),
        F.col("q_words"),
    )
    top = (
        feats.select("doc_id", guarded.alias("q_words"), "not_keep", "neg_words")
        .orderBy("not_keep", "neg_words", "doc_id")
        .limit(_TOKEN_BUDGET)
    )
    w = (
        Window.orderBy("not_keep", "neg_words", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = top.withColumn("cum_total", F.sum("q_words").over(w)).where(
        F.col("cum_total") <= _TOKEN_BUDGET
    )
    return sel.select("doc_id", "q_words", "cum_total").orderBy("doc_id")


def variant_pruned(spark, sf_dir):
    return _pruned(spark, sf_dir, splitfree=False)


def variant_prunedx(spark, sf_dir):
    return _pruned(spark, sf_dir, splitfree=True)


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
    spark = build_session("ab-budget-topk")

    variants = {
        "current": data_token_budget,
        "pruned": variant_pruned,
        "prunedx": variant_prunedx,
    }
    hashes = {n: _result_hash(fn(spark, sf_dir)) for n, fn in variants.items()}
    identical = len(set(hashes.values())) == 1

    times: dict[str, list[float]] = {n: [] for n in variants}
    for name, fn in variants.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()  # current embeds persist(); honest reps
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
