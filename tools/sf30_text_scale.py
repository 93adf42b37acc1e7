"""r14 verdict ask #3: one decade beyond sf10 for the two heaviest
text operators — dedup_ngram_jaccard and text_lm_score — on an
sf30-equivalent documents corpus (1.8M docs), with wall + shuffle-byte
slopes against the sf1→sf10 trend.

Corpus: documents-only replication via gen_sf's exact transforms
(K=300 copies of the sf0.1 fixture with key offsets; per-copy vowel
permutation × consonant rotation keeps cross-copy texts distinct so
dup structure stays linear, not quadratic — see tools/gen_sf.py).
Only documents is generated (~105 MB): the two operators read nothing
else, and the full-sf30 star schema would spend disk the star-CC
ENOSPC write-up already mapped as scarce.

DuckDB oracle: attempted at sf30 for ngram (33.3 s at sf10 → minutes
at sf30); skipped with a note if it exceeds the timeout/memory — the
Spark-side values are hash-anchored by the sf0.01–sf10 green history.

Usage: python tools/sf30_text_scale.py [--reps N] [--fresh]
Writes .bench/SF30_text.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench as B
from tailpipe_spark.queries import build_registry
from tailpipe_spark.session import build_session, read_table

SRC = "/root/testdata/sf0.1"
KEY_OFF = 10_000_000
_VOWELS = "aeiou"
_PERMS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
          "aeuio", "eiaou", "ioeua", "ouiae", "uoaei"]
_CONS = "bcdfghjklm"
_CONS_ROT = [_CONS[i:] + _CONS[:i] for i in range(10)]
K = 300  # 6k docs × 300 = 1.8M ≈ sf30 (sf10 = 600k)


def gen_documents(spark, out_dir: str) -> None:
    df = read_table(spark, f"{SRC}/documents.parquet")
    parts = []
    for c in range(K):
        d = df.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(c * KEY_OFF)).cast("long")
        )
        if c:
            col = F.translate("text", _VOWELS, _PERMS[c % len(_PERMS)])
            tier = (c // len(_PERMS)) % len(_CONS_ROT)
            if tier:
                col = F.translate(col, _CONS, _CONS_ROT[tier])
            # third stage for c >= 100 (tier wraps): swap two rare
            # consonants keyed by c//100 so all 300 transforms distinct
            band = c // (len(_PERMS) * len(_CONS_ROT))
            if band:
                col = F.translate(col, "npq"[band - 1] + "vwx"[band - 1],
                                  "vwx"[band - 1] + "npq"[band - 1])
            d = d.withColumn("text", col)
        parts.append(d)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    for f_ in u.schema.fields:
        if f_.dataType.typeName() == "timestamp":
            u = u.withColumn(f_.name, F.col(f_.name).cast("timestamp_ntz"))
    u.repartition(16).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


class StageMeter:
    def __init__(self, spark):
        self.api = None
        url = spark.sparkContext.uiWebUrl
        if url:
            app = spark.sparkContext.applicationId
            self.api = f"{url}/api/v1/applications/{app}/stages?status=complete"
        self.seen: set[int] = set()

    def delta(self) -> dict:
        if not self.api:
            return {}
        try:
            with urllib.request.urlopen(self.api, timeout=10) as r:
                stages = json.loads(r.read())
        except Exception:  # noqa: BLE001
            return {}
        new = [s for s in stages if s["stageId"] not in self.seen]
        self.seen.update(s["stageId"] for s in stages)
        return {
            "stages": len(new),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 1
            ),
            "input_mb": round(sum(s.get("inputBytes", 0) for s in new) / 1e6, 1),
        }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--duckdb-timeout", type=int, default=900)
    ap.add_argument("--no-duckdb", action="store_true",
                    help="skip oracle arms (instrumentation-only rerun)")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, ".bench", "sf30docs")
    if args.fresh:
        shutil.rmtree(out_dir, ignore_errors=True)

    # UI on: StageMeter reads shuffle bytes via the REST status API,
    # which only exists with the UI server (build_session disables it)
    spark = build_session(
        "sf30-text", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.time()
        gen_documents(spark, out_dir)
        print(f"generated sf30 documents: {time.time() - t0:.1f}s", flush=True)
    n_docs = read_table(spark, f"{out_dir}/documents.parquet").count()
    print(f"corpus: {n_docs} docs", flush=True)

    registry = build_registry()
    meter = StageMeter(spark)
    results: dict[str, dict] = {}
    for name in ("text_lm_score", "dedup_ngram_jaccard"):
        fn = registry[name].fn
        df = fn(spark, out_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        meter.delta()  # reset seen
        times = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, out_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        m = meter.delta()
        # per-execution shuffle = total across reps / reps
        results[name] = {
            "min_s": min(times),
            "reps": times,
            "stages_total": m.get("stages"),
            "shuffle_write_mb_per_exec": (
                round(m["shuffle_write_mb"] / args.reps, 1)
                if m.get("shuffle_write_mb") is not None else None
            ),
            "shuffle_read_mb_per_exec": (
                round(m["shuffle_read_mb"] / args.reps, 1)
                if m.get("shuffle_read_mb") is not None else None
            ),
        }
        print(name, results[name], flush=True)

    # DuckDB oracle attempt (ngram only has a full-SQL oracle; lm_score
    # too). Guarded: a failure records the reason, not a crash.
    import multiprocessing as mp

    if args.no_duckdb:
        for name in results:
            results[name]["duckdb_s"] = "skipped (--no-duckdb)"
        payload = {"n_docs": n_docs, "k": K, "results": results}
        with open(os.path.join(repo, ".bench", "SF30_text_instrumented.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
        print(json.dumps(payload))
        return 0

    def duck_run(q, sql, path):
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        con.execute("SET memory_limit='40GB'")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/documents.parquet/**/*.parquet')"
        )
        t0 = time.time()
        con.execute(sql).fetchall()
        q.put(round(time.time() - t0, 3))

    for name in ("text_lm_score", "dedup_ngram_jaccard"):
        sql = registry[name].oracle
        if not sql:
            results[name]["duckdb_s"] = "no oracle"
            continue
        q = mp.Queue()
        p = mp.Process(target=duck_run, args=(q, sql, out_dir))
        p.start()
        p.join(args.duckdb_timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            results[name]["duckdb_s"] = f"timeout>{args.duckdb_timeout}s"
        elif not q.empty():
            results[name]["duckdb_s"] = q.get()
        else:
            results[name]["duckdb_s"] = f"died (exitcode {p.exitcode})"
        print(name, "duckdb:", results[name]["duckdb_s"], flush=True)

    payload = {"n_docs": n_docs, "k": K, "results": results}
    with open(os.path.join(repo, ".bench", "SF30_text.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
