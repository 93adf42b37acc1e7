"""r14 verdict ask #2: grade q05/q03 at sf10 on the bucketed layout a
100 TB deployment would actually use, provisioned through the PRODUCT
CLI, and prove the layout changes no answers.

The r13 product-path A/B (tools/ab_bucketed_product.py) month-
partitioned the facts (tp_timestamp = order/ship date → 84 hive dirs ×
32 buckets = ~0.3 MB cells) and measured exactly the fragmentation
penalty bucket_rewrite's own guard warns about: per-file open cost ate
the exchange savings single-node. A 100 TB deployment doesn't run
0.3 MB cells — it sizes buckets so each (partition × bucket) cell is
full-size parquet. This harness reproduces THAT regime at sf10 by
ingesting the facts with a coarse layout (constant tp_timestamp → ONE
hive cell; lineitem 926 MB/32 ≈ 29 MB per file, orders 179 MB/32 ≈
5.6 MB — orders still trips the 8 MB floor, acknowledged via --force
because its join partner pins N=32), then rewriting through the
shipping CLI: ``compact <t> --bucket-by <key>:32 --force``.

Outputs:
- interleaved min-of-N walls for q05 (default + SMJ shape) and q03's
  big-scale branch, plain-fixture arm vs bucketed-workspace arm, with
  steal/busy telemetry bracketing the measurement window
  (bench.py-style; r13 verdict ask #6), written to
  .bench/SF10_r14_bucketed.json;
- value-identity assertion between arms (full collect compare);
- a TWIN sf dir (symlinks; lineitem/orders point at the bucketed
  workspace data trees) for tools/check_correctness.py to run the
  registry sweep against — layout invariance as hash evidence.

Usage: python tools/sf10_bucketed_grading.py [SF_DIR] [--buckets N]
       [--reps N] [--fresh]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench as B
from tailpipe_spark import writer
from tailpipe_spark.catalog import Catalog
from tailpipe_spark.cli import main as cli_main
from tailpipe_spark.functions.exact import dsum
from tailpipe_spark.session import build_session, read_table

FACT_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def ingest_coarse(spark, ws_dir: str, sf_dir: str) -> Catalog:
    """Facts into an engine workspace with ONE hive cell per table
    (constant tp_timestamp): the full-size-bucket-cell regime."""
    cat = Catalog(ws_dir)
    for name in FACT_KEYS:
        if name in cat.list_tables():
            continue
        df = read_table(spark, f"{sf_dir}/{name}.parquet")
        # keep source timestamp columns NTZ like the fixture: Spark's
        # TimestampType writes isAdjustedToUTC=true, DuckDB then reads
        # TIMESTAMPTZ and the typed oracle compare diverges on tz-aware
        # vs naive values (same reason gen_sf.py writes NTZ)
        for f_ in df.schema.fields:
            if f_.dataType.typeName() == "timestamp":
                df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp_ntz"))
        df = (
            df.withColumn(
                "tp_timestamp", F.lit("2024-01-01 00:00:00").cast("timestamp")
            )
            .withColumn("tp_partition", F.lit(name))
            .withColumn("tp_index", F.lit("default"))
        )
        cat.ensure_table(
            name, {f.name: f.dataType.simpleString() for f in df.schema.fields}
        )
        t0 = time.time()
        writer.append(cat, name, df)
        cat.refresh_file_index(name)
        print(f"ingest {name}: {time.time() - t0:.1f}s", flush=True)
    return cat


def bucket_via_cli(ws_dir: str, buckets: int) -> None:
    cat = Catalog(ws_dir)
    for t, k in FACT_KEYS.items():
        if cat.table_layout(t):
            continue
        t0 = time.time()
        rc = cli_main(
            ["--workspace", ws_dir, "compact", t,
             "--bucket-by", f"{k}:{buckets}", "--force"]
        )
        assert rc == 0
        print(f"compact --bucket-by {t}:{buckets}: {time.time() - t0:.1f}s",
              flush=True)


def build_twin(sf_dir: str, ws_dir: str, twin_dir: str) -> str:
    """Symlink twin of sf_dir with the facts served from the bucketed
    workspace trees (hive dirs; check_correctness reads them with the
    recursive glob + auto hive partitioning)."""
    os.makedirs(twin_dir, exist_ok=True)
    cat = Catalog(ws_dir)
    for t in ALL_TABLES:
        dst = os.path.join(twin_dir, f"{t}.parquet")
        if os.path.islink(dst) or os.path.exists(dst):
            continue
        src = (
            cat.table_dir(t) if t in FACT_KEYS
            else os.path.join(sf_dir, f"{t}.parquet")
        )
        os.symlink(src, dst)
    return twin_dir


def q05_arm(spark, sf_dir, li, orders, smj: bool):
    region = read_table(spark, f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    nation = read_table(spark, f"{sf_dir}/nation.parquet")
    cust = read_table(spark, f"{sf_dir}/customer.parquet")
    sup = read_table(spark, f"{sf_dir}/supplier.parquet")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    if smj:
        o = o.hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q03_arm(spark, sf_dir, li, orders):
    cust = read_table(spark, f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = orders.filter(F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp"))
    l = li.filter(F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp"))
    reduced = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_semi")
    return (
        l.join(reduced, l.l_orderkey == reduced.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=".bench/sf10")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    sf_dir = os.path.abspath(args.sf_dir)
    ws = os.path.join(os.path.dirname(sf_dir), "ws_sf10_coarse")
    twin = os.path.join(os.path.dirname(sf_dir), "sf10_bucketed_twin")
    if args.fresh:
        shutil.rmtree(ws, ignore_errors=True)
        shutil.rmtree(twin, ignore_errors=True)

    total = B._input_bytes(sf_dir)
    spark = build_session(
        "sf10-bucketed-grading",
        shuffle_partitions=B._auto_shuffle_partitions(total),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(B._auto_max_partition_bytes(total))
    )

    cat = ingest_coarse(spark, ws, sf_dir)
    bucket_via_cli(ws, args.buckets)
    build_twin(sf_dir, ws, twin)
    print(f"twin dir ready: {twin}", flush=True)

    li_p = read_table(spark, f"{sf_dir}/lineitem.parquet")
    or_p = read_table(spark, f"{sf_dir}/orders.parquet")
    li_b = cat.read_table(spark, "lineitem")
    or_b = cat.read_table(spark, "orders")

    cases = {
        "q05_default_plain": lambda: q05_arm(spark, sf_dir, li_p, or_p, False),
        "q05_default_bucketed": lambda: q05_arm(spark, sf_dir, li_b, or_b, False),
        "q05_smj_plain": lambda: q05_arm(spark, sf_dir, li_p, or_p, True),
        "q05_smj_bucketed": lambda: q05_arm(spark, sf_dir, li_b, or_b, True),
        "q03_plain": lambda: q03_arm(spark, sf_dir, li_p, or_p),
        "q03_bucketed": lambda: q03_arm(spark, sf_dir, li_b, or_b),
    }

    exchanges = {}
    for base in ("q05_default", "q05_smj", "q03"):
        a = [tuple(map(str, r)) for r in cases[f"{base}_plain"]().collect()]
        b = [tuple(map(str, r)) for r in cases[f"{base}_bucketed"]().collect()]
        assert sorted(a) == sorted(b), f"{base}: arms disagree"
        pp = cases[f"{base}_plain"]()._jdf.queryExecution().executedPlan().toString()
        bp = cases[f"{base}_bucketed"]()._jdf.queryExecution().executedPlan().toString()
        exchanges[base] = {
            "plain": pp.count("Exchange"), "bucketed": bp.count("Exchange"),
            "rows": len(a),
        }
        print(f"{base}: identical ({len(a)} rows); Exchanges "
              f"{pp.count('Exchange')} -> {bp.count('Exchange')}", flush=True)

    # warm
    for fn in cases.values():
        fn().write.format("noop").mode("overwrite").save()

    load0 = B._loadavg()
    t0ticks = B._cpu_ticks()
    times = {k: [] for k in cases}
    for _ in range(args.reps):
        for k, build in cases.items():
            df = build()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    t1ticks = B._cpu_ticks()
    d_busy = t1ticks[0] - t0ticks[0]
    d_idle = t1ticks[1] - t0ticks[1]
    d_steal = t1ticks[2] - t0ticks[2]
    payload = {
        "sf_dir": sf_dir,
        "buckets": args.buckets,
        "layout": "coarse (1 hive cell/table — full-size bucket cells)",
        "exchanges": exchanges,
        "mins": {k: round(min(v), 3) for k, v in times.items()},
        "reps": {k: [round(x, 3) for x in v] for k, v in times.items()},
        "telemetry": {
            "loadavg_start": load0,
            "loadavg_end": B._loadavg(),
            "steal_pct": (
                round(100.0 * d_steal / (d_busy + d_idle), 2)
                if (d_busy + d_idle) > 0 else None
            ),
            "busy_pct": (
                round(100.0 * d_busy / (d_busy + d_idle), 2)
                if (d_busy + d_idle) > 0 else None
            ),
        },
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       ".bench", "SF10_r14_bucketed.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: payload["mins"][k] for k in sorted(payload["mins"])}))
    print(f"telemetry: {payload['telemetry']}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
