"""r14 optimization A/B: q_json_extract's per-row JSON parse — JVM
tiered regex+variant (current) vs an Arrow-batch native kernel
(guide §4.2: hand whole batches to a vectorized native library inside
mapInArrow instead of chaining JVM expressions).

Prior rounds established the extraction-engine constant: yyjson parses
~40M docs/s while the JVM hybrid manages ~3.6M docs/s, and every
JVM-side variant (get_json_object / variant / hybrid) lands within 10%
(SCALE_PROOF §q_json_extract r10). The one lever never measured is
leaving the JVM: ship (event_type, props) to the Python worker as
Arrow batches and run the extraction through DuckDB's yyjson on each
batch (zero-copy Arrow in/out), then let Spark aggregate. Costs: one
Python boundary crossing for 2 pruned columns; gains: the parse runs
at native speed.

Variants:
  current  — q_json_extract (tiered regex fast path + variant fallback)
  dedup2   — same tiered plan, fast-path expression restructured so the
             key-extract regexp_extract is evaluated at most 2x per row
             instead of 4x (the current CASE nests `fast.isNotNull()`
             around `fast`, textually duplicating the extract; guide
             §7.2 "duplicated subtrees")
  duck     — mapInArrow + per-batch DuckDB json_extract_string/TRY_CAST
  orjson   — mapInArrow + per-row orjson dict parse (Python loop floor)

Interleaved min-of-N noop saves at $SPARK_GRAFT_SF_DIR; value identity
checked with the house full-result hash. One JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.queries.timeseries import q_json_extract
from tailpipe_spark.session import build_session, read_table


def _agg(extracted):
    return (
        extracted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def _duck_kernel(batches):
    import duckdb
    import pyarrow as pa

    con = duckdb.connect()
    # one Spark task = one core; don't oversubscribe with DuckDB threads
    con.execute("SET threads TO 1")
    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        con.register("b", tbl)
        out = con.execute(
            "SELECT event_type, "
            "TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k "
            "FROM b"
        ).fetch_arrow_table()
        yield from out.to_batches()


def _orjson_kernel(batches):
    import orjson
    import pyarrow as pa

    for batch in batches:
        et = batch.column(0)
        props = batch.column(1).to_pylist()
        ks = []
        for s in props:
            try:
                v = orjson.loads(s).get("k")
                ok = (
                    isinstance(v, int)
                    and not isinstance(v, bool)
                    and -(2**31) <= v < 2**31
                )
                ks.append(v if ok else None)
            except Exception:  # noqa: BLE001 — malformed doc -> NULL
                ks.append(None)
        yield pa.RecordBatch.from_arrays(
            [et, pa.array(ks, type=pa.int32())], names=["event_type", "k"]
        )


def variant_dedup2(spark, sf_dir):
    from tailpipe_spark.functions.json_fast import _FLAT_OBJECT_RE, _VAL

    e = read_table(spark, f"{sf_dir}/events.parquet")
    c = F.col("props")
    flat = c.rlike(_FLAT_OBJECT_RE)
    pat = rf'"k"\s*:\s*({_VAL})\s*[,}}]'
    raw = F.regexp_extract(c, pat, 1)
    slow = F.try_variant_get(F.try_parse_json(c), "$.k", "int")
    # flat & raw-is-int  <=>  flat & fast.isNotNull() (a matching <=9-digit
    # int literal can never cast to NULL), and under that condition
    # raw.cast == fast — same value, half the regexp_extract evaluations.
    k = F.when(
        flat & raw.rlike(r"^-?(?:0|[1-9]\d{0,8})$"), raw.cast("int")
    ).otherwise(slow)
    return _agg(e.select("event_type", k.alias("k")))


def variant_duck(spark, sf_dir):
    e = read_table(spark, f"{sf_dir}/events.parquet").select("event_type", "props")
    ext = e.mapInArrow(_duck_kernel, "event_type string, k int")
    return _agg(ext)


def variant_orjson(spark, sf_dir):
    e = read_table(spark, f"{sf_dir}/events.parquet").select("event_type", "props")
    ext = e.mapInArrow(_orjson_kernel, "event_type string, k int")
    return _agg(ext)


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
    spark = build_session("ab-json-kernel")

    variants = {
        "current": q_json_extract,
        "dedup2": variant_dedup2,
        "duck": variant_duck,
        "orjson": variant_orjson,
    }
    hashes = {name: _result_hash(fn(spark, sf_dir)) for name, fn in variants.items()}
    identical = len({h for h in hashes.values()}) == 1

    times: dict[str, list[float]] = {n: [] for n in variants}
    # warm each once (worker spin-up, codegen)
    for name, fn in variants.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for name, fn in variants.items():
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    out = {
        "sf_dir": sf_dir,
        "identical": identical,
        "hashes": {n: h for n, h in hashes.items()},
        **{f"{n}_min": round(min(t), 3) for n, t in times.items()},
        **{f"{n}_reps": [round(x, 3) for x in t] for n, t in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
