"""Scale-prove the rollup maintenance layouts: a micro-batch that
touches ONE bucket date must cost O(touched), not O(history).

The ``swap`` layout's merge reads the whole materialized rollup to
recover the touched dates' untouched sibling buckets (then prunes with
a broadcast semi-join — but the scan/listing itself grows with history);
the ``manifest`` layout resolves the touched partitions from the
pointer file and reads ONLY those directories. This script builds a
rollup with D days of history (D small vs D large), then times a
maintenance batch that appends rows to a single day, for both layouts.

Expectation: manifest batch time is ~flat in D; swap grows. On an
object store the gap widens further (the swap's per-partition directory
renames are copy+delete there; the manifest commit is one PUT).

Run: python tools/rollup_scale_proof.py [groups_per_day] [out_md]
Appends to SCALE_PROOF.md (or out_md) at the repo root.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.session import build_session
from tailpipe_spark.streaming.rollup import maintain_rollup, read_manifest_rollup

AGGS = lambda: [  # noqa: E731
    F.count(F.lit(1)).alias("n_events"),
    F.sum(F.col("v")).alias("v_sum"),
]


def write_history_src(spark, src, n_days: int, groups: int) -> None:
    """n_days × groups × 4 rows, event-time spread over n_days days."""
    (
        spark.range(n_days * groups * 4)
        .select(
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(
                    days=(F.col("id") % n_days).cast("int"),
                    hours=(F.col("id") % 4).cast("int") * 6,
                )
            ).alias("ts"),
            ((F.col("id") / n_days).cast("long") % groups).cast("string").alias("g"),
            (F.col("id") % 97).cast("long").alias("v"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(src, "b1"))
    )


def write_touch_src(spark, src, n_days: int, groups: int) -> None:
    """One more file touching ONLY the latest day (not late vs watermark)."""
    (
        spark.range(groups)
        .select(
            (
                F.to_timestamp(F.lit("2024-01-01 12:30:00"))
                + F.make_interval(days=F.lit(n_days - 1))
            ).alias("ts"),
            (F.col("id") % groups).cast("string").alias("g"),
            F.lit(1).cast("long").alias("v"),
        )
        .write.mode("append")
        .parquet(os.path.join(src, "b2"))
    )


def run_maintenance(spark, src, rollup_path, ck, layout) -> float:
    schema = "ts timestamp, g string, v long"
    stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
    t0 = time.perf_counter()
    q = maintain_rollup(
        stream, rollup_path, "ts", "1 day", ["g"], AGGS(),
        checkpoint=ck, watermark="3650 days", layout=layout,
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def one_case(spark, root, layout: str, n_days: int, groups: int):
    base = os.path.join(root, f"{layout}-{n_days}")
    src, rollup, ck = (os.path.join(base, n) for n in ("src", "rollup", "ck"))
    os.makedirs(src)
    os.makedirs(rollup)
    write_history_src(spark, src, n_days, groups)
    t_hist = run_maintenance(spark, src, rollup, ck, layout)
    write_touch_src(spark, src, n_days, groups)
    # same checkpoint: the second run processes ONLY the new file
    t_touch = run_maintenance(spark, src, rollup, ck, layout)
    if layout == "manifest":
        n = read_manifest_rollup(spark, rollup).count()
    else:
        n = spark.read.parquet(rollup).count()
    assert n == n_days * groups, (layout, n_days, n)
    return t_hist, t_touch


def main() -> None:
    groups = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROOF.md"
    )
    spark = build_session("rollup-scale-proof", shuffle_partitions=8)
    root = "/tmp/rollup_scale_proof"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    days_small, days_big = 60, 600
    res = {}
    # interleave layouts inside one process so box noise hits both alike
    for n_days in (days_small, days_big):
        for layout in ("swap", "manifest"):
            res[(layout, n_days)] = one_case(spark, root, layout, n_days, groups)
            print(layout, n_days, "hist %.2fs touch %.2fs" % res[(layout, n_days)])

    lines = [
        "",
        "## r9: rollup maintenance is O(touched), not O(history) "
        "(manifest layout)",
        "",
        f"One maintenance batch appending {groups} rows to a SINGLE day, "
        f"against {days_small} vs {days_big} days of materialized history "
        f"({groups} groups/day; history build time in parens). Same "
        "process, layouts interleaved:",
        "",
        "| layout | touch-1-day @ %dd | touch-1-day @ %dd | growth |"
        % (days_small, days_big),
        "|---|---|---|---|",
    ]
    for layout in ("swap", "manifest"):
        (h1, t1), (h2, t2) = res[(layout, days_small)], res[(layout, days_big)]
        lines.append(
            f"| {layout} | {t1:.2f}s ({h1:.1f}s) | {t2:.2f}s ({h2:.1f}s) "
            f"| {t2 / t1:.2f}x |"
        )
    swap_g = res[("swap", days_big)][1] / res[("swap", days_small)][1]
    man_g = res[("manifest", days_big)][1] / res[("manifest", days_small)][1]
    lines += [
        "",
        f"10x the history made the swap layout's single-day batch "
        f"{swap_g:.1f}x slower (its merge lists+scans the whole rollup to "
        f"recover untouched sibling buckets) while the manifest layout's "
        f"moved {man_g:.1f}x (pointer-file pruning reads only the touched "
        "partition). At object-store scale the asymmetry compounds: the "
        "manifest commit is one atomic PUT; the swap's per-partition "
        "renames are copy+delete.",
    ]
    with open(out_md, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to", out_md)


if __name__ == "__main__":
    main()
