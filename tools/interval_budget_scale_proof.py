"""Scale-prove merge_intervals and budget_select: wall must grow
~linearly from sf0.1 to sf1 (10× rows).

merge_intervals claim: one keyed shuffle + two same-partitioning
window passes — per-key sort cost, no interval self-join.
budget_select claim: two range-partition shuffles + a broadcast of
partition offsets — NO single-partition global window, so the wall is
sort-dominated and ~linear, not choked through one task.

Run: python tools/interval_budget_scale_proof.py [sf01_dir sf1_dir]
Appends a section to SCALE_PROOF.md. Run on a quiet box.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.operators.sampling import budget_select
from tailpipe_spark.operators.sessionize import merge_intervals
from tailpipe_spark.operators.text import quality_features
from tailpipe_spark.session import build_session, read_table

REPS = 3


def _min_wall(fn):
    fn()  # untimed warm rep (codegen/broadcast warmup — r9 bench protocol)
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".bench/sf1"]
    spark = build_session("interval-budget-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "",
        f"## Interval-union + token-budget scaling ({time.strftime('%Y-%m-%d')})",
        "",
        f"min-of-{REPS} walls; rows = input size. Linear-cost claims:",
        "merge_intervals = one keyed shuffle + two window passes (no",
        "self-join); budget_select = two range-partition shuffles + a",
        "broadcast of partition offsets (no single-partition window).",
        "",
        "| operator | input rows | wall s (min) | out rows |",
        "|---|---|---|---|",
    ]
    for d in dirs:
        ev = read_table(spark, f"{d}/events.parquet", parallelize=True).persist()
        n_ev = ev.count()
        iv = ev.select(
            "user_id",
            F.unix_micros("ts").alias("s"),
            (F.unix_micros("ts") + (F.col("event_id") % 900 + 60) * F.lit(1_000_000)).alias("e"),
        )
        out_rows = merge_intervals(iv, "user_id", "s", "e").count()
        w = _min_wall(lambda: merge_intervals(iv, "user_id", "s", "e")
                      .groupBy("user_id").count().count())
        lines.append(f"| merge_intervals | {n_ev:,} | {w:.2f} | {out_rows:,} |")
        print(lines[-1], flush=True)

        docs = read_table(spark, f"{d}/documents.parquet", parallelize=True).persist()
        n_docs = docs.count()
        feats = quality_features(docs).select(
            "doc_id", "q_words",
            F.when(F.col("q_keep"), F.lit(0)).otherwise(F.lit(1)).alias("nk"),
            (-F.col("q_words")).alias("nw"),
        )
        # budget scales with the corpus so the selection stays a real
        # fraction (a fixed budget would select a constant prefix and
        # trivially flat-line the wall)
        budget = 6 * n_docs
        out_rows = budget_select(feats, ["nk", "nw", "doc_id"], "q_words", budget).count()
        w = _min_wall(lambda: budget_select(
            feats, ["nk", "nw", "doc_id"], "q_words", budget).count())
        lines.append(f"| budget_select | {n_docs:,} | {w:.2f} | {out_rows:,} |")
        print(lines[-1], flush=True)
        ev.unpersist()
        docs.unpersist()
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_PROOF.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALE_PROOF.md")


if __name__ == "__main__":
    main()
