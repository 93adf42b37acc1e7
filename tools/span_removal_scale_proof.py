"""Scale-prove remove_duplicated_spans: wall time and shuffle volume
must grow ~linearly with corpus size (the operator's claim: one
window-hash-keyed shuffle + one id-keyed island pass + row-local
excision — no pair materialization, no position explode).

Run: python tools/span_removal_scale_proof.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 .bench/sf1 (5k and 50k docs).
Appends a section to SCALE_PROOF.md. Run on a quiet box.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.operators.dedup import remove_duplicated_spans
from tailpipe_spark.session import build_session, read_table
from tools.relational_scale_proof import StageMeter

REPS = 3
K = 8


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".bench/sf1"]
    spark = build_session(
        "span-removal-scale-proof",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4097"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    meter = StageMeter(spark)
    lines = ["", f"## Substring-span excision scaling ({time.strftime('%Y-%m-%d')})", ""]
    lines.append(f"remove_duplicated_spans k={K}; min-of-{REPS} wall, rebuild +")
    lines.append("noop-save per rep. Linear-cost claim: no pair materialization,")
    lines.append("no position explode — shuffle and wall should scale ~with tokens.")
    lines.append("")
    lines.append("| docs | wall s (min) | shuffle MB | docs cut | tokens removed |")
    lines.append("|---|---|---|---|---|")
    for d in dirs:
        docs = read_table(spark, f"{d}/documents.parquet", parallelize=True).persist()
        n = docs.count()
        meter.delta()
        walls, mb = [], None
        for _ in range(REPS):
            df = remove_duplicated_spans(docs, k=K)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            dd = meter.delta()
            if mb is None:
                mb = dd.get("shuffle_write_mb")
        stats = (
            remove_duplicated_spans(docs, k=K)
            .agg(
                F.sum((F.col("removed_tokens") > 0).cast("long")).alias("cut"),
                F.sum("removed_tokens").alias("rm"),
            )
            .collect()[0]
        )
        row = f"| {n:,} | {min(walls):.2f} | {mb} | {stats.cut:,} | {stats.rm:,} |"
        lines.append(row)
        print(row, flush=True)
        docs.unpersist()
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROOF.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
