"""Scale-prove the relational path: q01/q03-shaped plans over
row-local-generated fact tables at 10x and 100x the bench scale
(sf0.1 ≈ 600k lineitem rows → 6M and 60M here), recording wall time
and shuffle volume per stage. The claim under test: the headline
plans' cost is linear in the fact size — no shuffle explosion, no
driver materialization — so the sf0.1 bench numbers extrapolate.

Tables are generated deterministically inside Spark (expressions over
``spark.range`` — no driver-side data, no files): a lineitem-like fact
and an orders-like fact with the same key distribution as the test
data (4 lineitems per order on average).

Run: python tools/relational_scale_proof.py [rows ...] [--out out_md]
Default rows: 6000000 60000000. Appends a section to SCALE_PROOF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.session import build_session


def make_lineitem(spark, n_rows: int):
    """Deterministic lineitem-like fact: key distribution mirrors the
    testdata (l_orderkey = id/4, uniform qty/discount/price, dates over
    ~2.5 years, 3x2 flag/status values)."""
    h = lambda s: F.xxhash64(F.col("id").cast("string"), F.lit(s))  # noqa: E731
    return spark.range(n_rows).select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        (F.abs(h("pk")) % 20000).alias("l_partkey"),
        (F.abs(h("sk")) % 1000).alias("l_suppkey"),
        ((F.abs(h("q")) % 50) + 1).cast("double").alias("l_quantity"),
        (((F.abs(h("p")) % 90000) + 10000) / 100.0).alias("l_extendedprice"),
        ((F.abs(h("d")) % 11) / 100.0).alias("l_discount"),
        ((F.abs(h("t")) % 9) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.abs(h("rf")) % 3 + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O")), (F.abs(h("ls")) % 2 + 1).cast("int")
        ).alias("l_linestatus"),
        F.timestamp_seconds(
            F.lit(788918400) + (F.abs(h("sd")) % (86400 * 900))
        ).alias("l_shipdate"),
    )


def make_orders(spark, n_rows: int):
    h = lambda s: F.xxhash64(F.col("id").cast("string"), F.lit(s))  # noqa: E731
    return spark.range(n_rows).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(h("ck")) % (n_rows // 10 + 1)).alias("o_custkey"),
        F.timestamp_seconds(
            F.lit(788918400) + (F.abs(h("od")) % (86400 * 900))
        ).alias("o_orderdate"),
        F.element_at(
            F.array(
                F.lit("1-URGENT"), F.lit("2-HIGH"), F.lit("3-MEDIUM"),
                F.lit("4-NOT SPECIFIED"), F.lit("5-LOW"),
            ),
            (F.abs(h("op")) % 5 + 1).cast("int"),
        ).alias("o_orderpriority"),
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
        }


def run_suite(spark, meter, n_rows: int, rows: list[dict]) -> None:
    li = make_lineitem(spark, n_rows).persist()
    orders = make_orders(spark, n_rows // 4).persist()

    def stage(name, fn):
        t0 = time.time()
        result = fn()
        wall = round(time.time() - t0, 1)
        rows.append(
            {"rows": n_rows, "stage": name, "wall_sec": wall, **meter.delta(), **result}
        )
        print(f"[{n_rows:,}] [{name}] {wall}s {rows[-1]}", flush=True)

    stage("materialize", lambda: {"fact_rows": li.count(), "dim_rows": orders.count()})

    def q01():
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        out = (
            li.filter(F.col("l_shipdate") <= F.lit("1997-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(disc).alias("sum_disc"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        return {"groups": out.count()}

    stage("q01_agg", q01)

    def q03():
        out = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("revenue")
            )
            .orderBy(F.col("revenue").desc())
            .limit(10)
        )
        return {"topk": len(out.collect())}

    stage("q03_join_topk", q03)

    def window_rank():
        from pyspark.sql import Window

        w = Window.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc())
        out = (
            li.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return {"groups": out.count()}

    stage("window_rank", window_rank)

    li.unpersist()
    orders.unpersist()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(a) for a in args] or [6_000_000, 60_000_000]
    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROOF.md"
    )
    spark = build_session(
        "relational-scale-proof",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4097"},
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    meter = StageMeter(spark)
    rows: list[dict] = []
    for n in sizes:
        run_suite(spark, meter, n, rows)

    hdr = (
        "\n\n# Relational scale proof\n\n"
        "q01/q03-shaped plans over row-local-generated facts at "
        f"{' and '.join(f'{n:,}' for n in sizes)} lineitem rows "
        "(sf0.1 ≈ 600k) — `tools/relational_scale_proof.py`, "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS') or os.cpu_count()}], "
        "shuffle_partitions=64, AQE on.\n\n"
        "| rows | stage | wall sec | stages | shuffle write MB | detail |\n"
        "|---|---|---|---|---|---|\n"
    )
    lines = []
    for r in rows:
        detail = {
            k: v
            for k, v in r.items()
            if k not in ("rows", "stage", "wall_sec", "stages", "shuffle_write_mb")
        }
        lines.append(
            f"| {r['rows']:,} | {r['stage']} | {r['wall_sec']} | "
            f"{r.get('stages', '')} | {r.get('shuffle_write_mb', '')} | "
            f"{json.dumps(detail)} |"
        )
    reading = (
        "\n\nHow to read this: the agg's exchange carries only the "
        "group rows (map-side combine), so its shuffle stays ~zero and "
        "wall is scan-bound. The join's shuffle may step super-linearly "
        "across a size boundary when AQE transitions from broadcasting "
        "the small side to a two-sided shuffle join — that transition "
        "is correct size-aware behavior, and wall should stay "
        "sub-linear through it. The canary condition is wall growing "
        "FASTER than the data across a step with the SAME plan shape "
        "(lost partial agg, sort spill).\n"
    )
    with open(out_md, "a", encoding="utf-8") as f:
        f.write(hdr + "\n".join(lines) + reading)
    print(f"wrote {out_md}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
