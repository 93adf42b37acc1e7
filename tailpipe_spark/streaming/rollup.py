"""Continuous aggregates (hypertable-style rollups).

A rollup table holds pre-aggregated buckets (e.g. hourly counts) for
history, maintained incrementally by a streaming job; queries read
``rollup ∪ fresh``: materialized buckets before the boundary, plus the
same aggregation computed on the raw tail at query time. This is the
timescale/druid "continuous aggregate" pattern re-expressed Spark-first:

- maintenance is Structured Streaming ``foreachBatch`` writing bucket
  partitions with dynamic partition overwrite (idempotent per bucket —
  a replayed micro-batch overwrites, never double-counts);
- the read path is one lazy plan: partition-pruned scan of the rollup
  (only buckets < boundary) unioned with a windowed agg over the raw
  tail (only files >= boundary survive pushdown/data skipping), so
  query cost is bounded by bucket count + tail size, not history size.

The boundary MUST be bucket-aligned; a mid-bucket boundary would split
one bucket across both sides and double-count. ``continuous_read``
enforces it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: canonical rollup schema columns produced by bucketize()
BUCKET_COL = "bucket_start"


def _check_aligned(boundary, window: str) -> None:
    import re
    from datetime import datetime, timezone

    m = re.match(r"^(\d+)\s+(hour|minute|day)s?$", window.strip())
    if not m:
        raise ValueError(f"unsupported rollup window {window!r}")
    qty, unit = int(m.group(1)), m.group(2)
    b = boundary if isinstance(boundary, datetime) else datetime.fromisoformat(boundary)
    sec = {"minute": 60, "hour": 3600, "day": 86400}[unit] * qty
    # naive datetimes are session-UTC; .timestamp() would apply local tz
    epoch = b.replace(tzinfo=b.tzinfo or timezone.utc).timestamp()
    if epoch % sec != 0:
        raise ValueError(
            f"boundary {b.isoformat()} is not aligned to the {window} bucket "
            "grid; a straddled bucket would be double-counted"
        )


def bucketize(
    df: DataFrame,
    ts_col: str,
    window: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Aggregate raw rows into (bucket_start, *group_cols, *aggs)."""
    w = F.window(F.col(ts_col), window)
    return (
        df.groupBy(w.start.alias(BUCKET_COL), *group_cols)
        .agg(*aggs)
    )


def maintain_rollup(
    stream: DataFrame,
    rollup_path: str,
    ts_col: str,
    window: str,
    group_cols: list[str],
    aggs: list[Column],
    checkpoint: str,
    watermark: str = "1 hour",
):
    """Streaming maintenance: each micro-batch emits only the buckets
    it UPDATED (``update`` output mode, so watermark eviction bounds
    the agg state — r6 ADVICE: ``complete`` mode never evicts and
    re-emits all history every batch), merges them against the
    already-materialized rows of the touched bucket dates, and
    overwrites exactly those date partitions (dynamic partition
    overwrite → idempotent under replay).

    State is O(open buckets within the watermark); each batch's sink
    work is O(touched bucket dates), not O(history).
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        rows = batch_df.withColumn("bucket_date", F.to_date(F.col(BUCKET_COL)))
        if not rows.take(1):
            return
        spark = rows.sparkSession
        if not (
            os.path.isdir(rollup_path)
            and any(n.startswith("bucket_date=") for n in os.listdir(rollup_path))
        ):
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            (
                rows.write.mode("overwrite")
                .partitionBy("bucket_date")
                .parquet(rollup_path)
            )
            return
        # Merge path: update mode emits only changed buckets; the
        # rewritten date partitions must keep their untouched sibling
        # buckets. The merged output goes to a STAGING directory and the
        # touched partitions are then swapped in with directory renames
        # — the sink is never a source and a sink of the same job, so a
        # task retry or executor loss during the write recomputes from a
        # still-intact rollup (r7 ADVICE: the previous
        # read-localCheckpoint-overwrite relied on executor-held blocks;
        # losing one mid-overwrite re-read a half-rewritten sink).
        # Replays stay idempotent: re-merging the same micro-batch swaps
        # in identical partitions.
        # Crash recovery from an interrupted previous swap: a lone
        # ``*.__old`` whose live partition is missing is restored (the
        # crash fell between the two renames); one whose live partition
        # exists is debris from after the second rename — dropped.
        for name in os.listdir(rollup_path):
            if not name.endswith(".__old"):
                continue
            live = os.path.join(rollup_path, name[: -len(".__old")])
            if os.path.isdir(live):
                shutil.rmtree(os.path.join(rollup_path, name), ignore_errors=True)
            else:
                os.rename(os.path.join(rollup_path, name), live)
        touched = rows.select("bucket_date").distinct()
        keys = [BUCKET_COL] + list(group_cols)
        existing = (
            spark.read.parquet(rollup_path)
            .join(F.broadcast(touched), "bucket_date", "semi")
            .join(rows.select(*keys).distinct(), keys, "left_anti")
        )
        staging = f"{rollup_path.rstrip('/')}.__staging-{batch_id}"
        shutil.rmtree(staging, ignore_errors=True)  # stale retry leftovers
        (
            existing.unionByName(rows)
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(staging)
        )
        try:
            for name in os.listdir(staging):
                if not name.startswith("bucket_date="):
                    continue
                target = os.path.join(rollup_path, name)
                retired = target + ".__old"
                shutil.rmtree(retired, ignore_errors=True)
                if os.path.isdir(target):
                    os.rename(target, retired)
                os.rename(os.path.join(staging, name), target)
                shutil.rmtree(retired, ignore_errors=True)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    agg = bucketize(
        stream.withWatermark(ts_col, watermark), ts_col, window, group_cols, aggs
    )
    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def continuous_read(
    raw: DataFrame,
    rollup: DataFrame,
    ts_col: str,
    window: str,
    group_cols: list[str],
    aggs: list[Column],
    boundary,
) -> DataFrame:
    """rollup(buckets < boundary) ∪ bucketize(raw >= boundary).

    One lazy plan; the rollup side prunes on bucket_start, the raw side
    pushes the timestamp bound to the scan."""
    _check_aligned(boundary, window)
    b = F.lit(boundary).cast("timestamp")
    hist = rollup.filter(F.col(BUCKET_COL) < b)
    fresh = bucketize(raw.filter(F.col(ts_col) >= b), ts_col, window, group_cols, aggs)
    return hist.select(fresh.columns).unionByName(fresh)
