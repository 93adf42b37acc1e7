"""Synthetic benchmark data generator (A35).

The reference generates deterministic rows for N columns cycling 12 type
templates, delivered as timed JSONL chunks — spec string
``synthetic_<cols>cols_<rows>rows_<chunk>chunk_<interval>ms``
(reference: cmd/collect.go:265-367,
internal/collector/collector_synthetic.go:83-234).

Here the generator is a single ``spark.range(rows)`` with generated
column expressions — fully distributed, no driver-side row loop — and an
optional chunked-JSONL writer to exercise the ingest path end-to-end.
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SPEC = re.compile(
    r"^synthetic_(\d+)cols_(\d+)rows_(\d+)chunk_(\d+)ms$", re.IGNORECASE
)


@dataclass
class SyntheticSpec:
    cols: int
    rows: int
    chunk_size: int
    interval_ms: int


def parse_synthetic_spec(name: str) -> SyntheticSpec | None:
    m = _SPEC.match(name.strip())
    if not m:
        return None
    return SyntheticSpec(*(int(g) for g in m.groups()))


#: 12 cycled templates (varchar, integer, double, boolean, json,
#: timestamp, array-json, nested-json, uuid, struct x3 — mirroring the
#: reference's synthetic column mix)
def _template(i: int, idx):
    base = F.col("id")
    kind = i % 12
    if kind == 0:
        return F.concat(F.lit(f"str_{i}_"), base.cast("string"))
    if kind == 1:
        return (base * (i + 1) % 1_000_000).cast("integer")
    if kind == 2:
        return (base * 1.5 + i).cast("double")
    if kind == 3:
        return (base % 2 == 0)
    if kind == 4:
        return F.to_json(F.struct((base % 100).alias("k"), F.lit(i).alias("col")))
    if kind == 5:
        return F.timestamp_micros(
            (F.lit(1704067200000000) + base * 1_000_000 + F.lit(i)).cast("long")
        )
    if kind == 6:
        return F.to_json(F.array(base % 10, (base + 1) % 10, (base + 2) % 10))
    if kind == 7:
        return F.to_json(
            F.struct(
                F.struct((base % 7).alias("inner")).alias("nested"),
                (base % 3).alias("n"),
            )
        )
    if kind == 8:  # deterministic uuid-shaped string
        h = F.md5(F.concat(base.cast("string"), F.lit(f"#{i}")))
        return F.concat_ws(
            "-",
            F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
            F.substring(h, 17, 4), F.substring(h, 21, 12),
        )
    if kind == 9:
        return F.struct((base % 50).alias("a"), F.lit(i).alias("b"))
    if kind == 10:
        return F.struct(
            F.struct((base % 5).alias("x")).alias("inner"), (base % 11).alias("y")
        )
    return F.struct(
        F.array(base % 3, base % 5).alias("arr"),
        F.struct((base % 13).alias("deep")).alias("s"),
        base.cast("string").alias("id_str"),
    )


def synthetic_df(spark: SparkSession, cols: int, rows: int) -> DataFrame:
    """Deterministic benchmark table: ``rows`` rows × ``cols`` generated
    columns + tp_timestamp (1s cadence from 2024-01-01)."""
    df = spark.range(rows)
    exprs = [
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 1_000_000).cast("long")
        ).alias("tp_timestamp")
    ]
    for i in range(cols):
        exprs.append(_template(i, i).alias(f"col_{i}"))
    return df.select("id", *exprs)


def write_jsonl_chunks(
    df: DataFrame, out_dir: str, chunk_size: int, interval_ms: int = 0
) -> list[str]:
    """Write the generated frame as `<n>_<chunk>.jsonl` files with
    optional timed delivery — feeds the ingest path exactly like the
    reference's plugin chunk stream. Chunk partitioning happens in
    Spark (repartition by chunk id), only the file rename is
    driver-side."""
    os.makedirs(out_dir, exist_ok=True)
    rows = df.count()
    n_chunks = max(1, (rows + chunk_size - 1) // chunk_size)
    staged = os.path.join(out_dir, "_staged")
    (
        # range-partition by chunk id: hash partitioning maps distinct
        # chunk ids onto colliding buckets (near-certain for n keys into
        # n partitions), merging chunks and emitting fewer files than
        # requested; range partitioning gives one contiguous chunk per
        # output partition
        df.withColumn("__chunk", (F.col("id") / chunk_size).cast("int"))
        .repartitionByRange(n_chunks, "__chunk")
        .sortWithinPartitions("id")
        .drop("__chunk")
        .write.mode("overwrite")
        .json(staged)
    )
    parts = sorted(
        f for f in os.listdir(staged) if f.startswith("part-") and f.endswith(".json")
    )
    out = []
    for i, part in enumerate(parts):
        dst = os.path.join(out_dir, f"exec_{i}.jsonl")
        os.replace(os.path.join(staged, part), dst)
        out.append(dst)
        if interval_ms:
            time.sleep(interval_ms / 1000.0)
    return out


def run_synthetic_collect(
    spark: SparkSession,
    catalog,
    spec: SyntheticSpec,
    work_dir: str,
) -> dict:
    """Full-pipeline benchmark: generate → chunked JSONL → collect →
    stats. Returns timings + row counts (the reference's synthetic
    partition benchmark, end-to-end)."""
    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    name = f"synthetic_{spec.cols}cols_{spec.rows}rows"
    t0 = time.time()
    df = synthetic_df(spark, spec.cols, spec.rows)
    chunks = write_jsonl_chunks(df, work_dir, spec.chunk_size, spec.interval_ms)
    gen_s = time.time() - t0

    t1 = time.time()
    src = read_jsonl(spark, chunks)
    table = TableConfig(name=name, columns=[], map_fields=["*"])
    res = collect(
        spark,
        catalog,
        table,
        PartitionConfig(name, "bench"),
        source_df=src,
        timestamp_source="tp_timestamp",
    )
    collect_s = time.time() - t1
    return {
        "table": name,
        "rows": res.rows_written,
        "chunks": len(chunks),
        "generate_sec": round(gen_s, 3),
        "collect_sec": round(collect_s, 3),
        "rows_per_sec": round(res.rows_written / max(collect_s, 1e-9)),
    }
