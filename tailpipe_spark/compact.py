"""Compaction: overlap detection → time-ordered rewrite → small-file
merge (+ optional reindex), mirroring the reference's compactor
(reference: internal/database/compact.go:80-435,
internal/database/partition_key.go:96-170).

Spark shape:
- file stats (rows, min/max tp_timestamp) come from parquet footers —
  driver-side metadata, no data read (A20/A22)
- the interval-overlap sweep is pure Python on those stats (A21)
- the rewrite is ``repartitionByRange(tp_timestamp) +
  sortWithinPartitions`` with dynamic partition overwrite, so files end
  up time-clustered and non-overlapping — Parquet min/max row-group
  skipping then prunes time ranges inside a month partition (A23)
- small files merge by coalescing to a target size (A24)

Guardrails match the reference: rewrites chunked per partition key
(bounded memory), and a partition is only rewritten when it has
overlapping or too-many-small files — compaction is idempotent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tailpipe_spark.catalog import PARTITION_COLS, Catalog

TARGET_FILE_BYTES = 128 * 1024 * 1024

# bucket_rewrite warns when the projected per-(hive dir x bucket) file
# falls under this: sub-8MB shards pay more in per-file open/footer cost
# than the deleted exchanges save single-node (r11 sf0.1 measurement:
# 2,656 ~0.3 MB lineitem files -> q05 parity, q03 -47%)
MIN_BUCKET_CELL_BYTES = 8 * 1024 * 1024


def _hive_dir_count(tdir: str) -> int:
    """Distinct directories holding parquet files — the hive-partition
    fan-out factor of the projected bucketed layout."""
    dirs = set()
    for root, _dirs, names in os.walk(tdir):
        if any(n.endswith(".parquet") for n in names):
            dirs.add(root)
    return max(1, len(dirs))


@dataclass
class FileStat:
    path: str
    rows: int
    bytes: int
    min_ts: object
    max_ts: object


@dataclass
class PartitionKey:
    tp_partition: str
    tp_index: str
    tp_year: int
    tp_month: int

    @property
    def relpath(self) -> str:
        return (
            f"tp_partition={self.tp_partition}/tp_index={self.tp_index}/"
            f"tp_year={self.tp_year}/tp_month={self.tp_month}"
        )


def enumerate_partition_keys(catalog: Catalog, table: str) -> list[PartitionKey]:
    """A20: walk the hive layout."""
    keys = []
    base = catalog.table_dir(table)
    for root, dirs, files in os.walk(base):
        if not any(f.endswith(".parquet") for f in files):
            continue
        rel = os.path.relpath(root, base)
        parts = dict(p.split("=", 1) for p in rel.split(os.sep) if "=" in p)
        if set(parts) >= set(PARTITION_COLS):
            try:
                keys.append(
                    PartitionKey(
                        parts["tp_partition"],
                        parts["tp_index"],
                        int(parts["tp_year"]),
                        int(parts["tp_month"]),
                    )
                )
            except ValueError:
                continue  # foreign dir in the tree; not a partition key
    return sorted(keys, key=lambda k: k.relpath)


def file_stats(catalog: Catalog, table: str, key: PartitionKey) -> list[FileStat]:
    """A22: per-file stats from parquet footers (no data read).

    Footers go through catalog.FooterInfo so files carrying types the
    installed pyarrow cannot parse (VARIANT from json-typed columns)
    still compact; a file with any stat-less row group is treated as
    unranged rather than getting a partial (overlap-missing) range."""
    from tailpipe_spark.catalog import FooterInfo

    d = os.path.join(catalog.table_dir(table), key.relpath)
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(d, name)
        md = FooterInfo(p)
        ts = md.col_stats("tp_timestamp")
        mn, mx = (ts[0], ts[1]) if ts else (None, None)
        out.append(FileStat(p, md.num_rows, os.path.getsize(p), mn, mx))
    return out


def find_overlaps(stats: list[FileStat]) -> list[list[FileStat]]:
    """A21: sweep sorted time ranges; group files whose [min,max]
    intervals overlap (reference: partition_key.go:96-170)."""
    ranged = [s for s in stats if s.min_ts is not None and s.max_ts is not None]
    ranged.sort(key=lambda s: (s.min_ts, s.max_ts))
    groups: list[list[FileStat]] = []
    cur: list[FileStat] = []
    cur_max = None
    for s in ranged:
        if cur and s.min_ts <= cur_max:
            cur.append(s)
            cur_max = max(cur_max, s.max_ts)
        else:
            if len(cur) > 1:
                groups.append(cur)
            cur = [s]
            cur_max = s.max_ts
    if len(cur) > 1:
        groups.append(cur)
    return groups


MAX_CHUNK_ROWS = 5_000_000  # reference: internal/database/compact.go:16-19
MIN_CHUNK_WINDOW_HOURS = 1


def _ceil_hour(ts):
    from datetime import timedelta

    floored = ts.replace(minute=0, second=0, microsecond=0)
    return floored + timedelta(hours=1) if ts != floored else ts


def chunk_windows(stats: list[FileStat], max_rows: int) -> list[tuple]:
    """Split a partition's rewrite into bounded time windows so a hot
    partition never demands one giant job (reference chunks inserts at
    5M rows / >=1h windows — internal/database/compact.go:416-435).
    Returns [(lo, hi)] half-open windows; None = unbounded end."""
    total = sum(s.rows for s in stats)
    ranged = sorted(
        (s for s in stats if s.min_ts is not None and s.max_ts is not None),
        key=lambda s: (s.min_ts, s.max_ts),
    )
    if total <= max_rows or not ranged:
        return [(None, None)]
    windows: list[tuple] = []
    lo, acc, bound = None, 0, None
    for s in ranged:
        acc += s.rows
        bound = s.max_ts if bound is None else max(bound, s.max_ts)
        if acc >= max_rows:
            hi = _ceil_hour(bound)
            if lo is not None and hi <= lo:
                continue  # keep windows >= 1h: fold into the next chunk
            windows.append((lo, hi))
            lo, acc, bound = hi, 0, None
    windows.append((lo, None))
    return windows


def bucket_rewrite(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    bucket_by: list[str],
    num_buckets: int | None = None,
    sort_by: list[str] | None = None,
    force: bool = False,
) -> dict:
    """Rewrite a cataloged table into a BUCKETED physical layout — the
    co-located-join answer at cluster scale (reference analog: the
    physical-layout rewrites of internal/database/compact.go:264-435;
    DuckDB never shuffles single-node, bucketing is Spark's translation
    of that co-location).

    Whole-table staged rewrite through the A13/A23 path: write
    ``bucketBy(N, keys).sortBy(...)`` into ``catalog.staging_dir``
    (via a throwaway external saveAsTable — Spark's bucketed writer is
    only reachable through the table API), swap by rename, record the
    layout + revision in the manifest (``set_table_layout``), refresh
    the file index. ``read_table`` then serves the scan through a
    session-catalog registration carrying the bucket spec, so a join
    of two same-bucketed tables plans with ZERO Exchange on the fact
    sides (pinned in tests/test_bucketed_layout.py).

    The pre-write ``repartition(N, keys)`` aligns task hashing with
    bucket hashing (both Murmur3 mod N), so each task holds exactly
    one bucket → one file per bucket per hive partition instead of
    tasks×buckets shards.

    ``num_buckets=None`` auto-sizes: table bytes / 256 MB rounded UP
    to a power of two (floor 4) — pick the SAME count on both sides of
    an intended join (the CLI's ``--bucket-by key:N`` pins it).

    Small-scale guard (r11 verdict "what's wrong" #3): bucketing
    multiplies the file count by ``hive dirs × N``, and at workspace
    scale that fragments the table into sub-MB shards whose per-file
    open/footer cost erases the exchange savings (measured at sf0.1:
    month-partitioning × 32 buckets → 2,656 ~0.3 MB lineitem files,
    q05 parity instead of a win). When the PROJECTED per-cell file
    size — table bytes / (hive partition dirs × N) — falls under
    ``MIN_BUCKET_CELL_BYTES`` (8 MB), the rewrite WARNS with the
    numbers and the remedies (fewer buckets via ``key:N``, a coarser
    hive layout such as yearly partitioning); ``force=True``
    acknowledges the trade and silences it. The rewrite still runs —
    the layout is a deliberate cluster-scale flag and a small
    workspace may be about to grow into it — but the user hears the
    single-node cost before paying it.

    Runs under the workspace writer lock (see compact_table);
    reentrant when reached through compact_table or collect.
    """
    with catalog.writer_lock(f"bucket_rewrite {table}"):
        return _bucket_rewrite_locked(
            spark, catalog, table, bucket_by, num_buckets, sort_by, force
        )


def _bucket_rewrite_locked(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    bucket_by: list[str],
    num_buckets: int | None,
    sort_by: list[str] | None,
    force: bool,
) -> dict:
    import shutil

    stats = catalog.file_stats(table)
    bytes_ = stats["bytes"]
    if num_buckets is None:
        n = max(1, -(-bytes_ // TARGET_FILE_BYTES // 2))  # ceil(bytes/256MB)
        num_buckets = max(4, 1 << (n - 1).bit_length())
    hive_dirs = _hive_dir_count(catalog.table_dir(table))
    cell = bytes_ / max(1, hive_dirs * int(num_buckets))
    if not force and cell < MIN_BUCKET_CELL_BYTES:
        import warnings

        warnings.warn(
            f"bucket_rewrite({table!r}, N={num_buckets}) fragments "
            f"{bytes_ >> 20} MB across {hive_dirs} hive dirs x "
            f"{num_buckets} buckets = ~{cell / (1 << 20):.2f} MB per "
            f"file — below the {MIN_BUCKET_CELL_BYTES >> 20} MB floor "
            "where per-file open cost erases the exchange savings at "
            "single-node scale (measured: q05 parity at sf0.1 vs a 2-"
            "Exchange win at size). Use fewer buckets (--bucket-by "
            "key:N), a coarser partition layout (e.g. yearly), or "
            "force=True to acknowledge a layout the table will grow "
            "into.",
            UserWarning,
            stacklevel=2,
        )
    sort_by = list(sort_by or bucket_by)
    df = catalog.read_table(spark, table)
    rows = catalog.row_count(table)
    staged = catalog.new_staging_dir(f"{table}.bucket")
    tmp_name = f"tp_bucket_stage_{table}_{os.path.basename(staged).replace('.', '_').replace('-', '_')}"
    spark.sql(f"DROP TABLE IF EXISTS `{tmp_name}`")
    (
        df.repartition(int(num_buckets), *[F.col(c) for c in bucket_by])
        .write.bucketBy(int(num_buckets), *bucket_by)
        .sortBy(*sort_by)
        .partitionBy(*PARTITION_COLS)
        .option("path", staged)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(tmp_name)
    )
    spark.sql(f"DROP TABLE `{tmp_name}`")  # external: files stay
    shutil.rmtree(catalog.table_dir(table))
    os.replace(staged, catalog.table_dir(table))
    rev = catalog.set_table_layout(table, bucket_by, num_buckets, sort_by)
    catalog.record_snapshot(
        "bucket",
        {"table": table, "bucket_by": list(bucket_by), "num_buckets": int(num_buckets)},
    )
    catalog.refresh_file_index(table)
    return {
        "table": table,
        "bucket_by": list(bucket_by),
        "num_buckets": int(num_buckets),
        "layout_rev": rev,
        "rows": rows,
    }


def compact_table(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    reindex_expr: str | None = None,
    small_file_bytes: int = 32 * 1024 * 1024,
    max_chunk_rows: int = MAX_CHUNK_ROWS,
    zorder_by: list[str] | None = None,
) -> dict:
    """Compact every partition key that needs it. Returns a summary.

    A key needs compaction when it has time-overlapping files or >1
    file under ``small_file_bytes``. With ``reindex_expr`` every key is
    rewritten and rows move to their newly-computed tp_index (A25).
    With ``zorder_by`` (2-4 columns) rewritten chunks are clustered on
    the interleaved z-value instead of tp_timestamp alone, so footer
    stats prune on every listed column (plans/zorder.py).

    Rewrites stage into ``catalog.staging_dir`` (never inside the table
    tree — a crash must not leave tmp dirs a reader would scan) and are
    chunked at ``max_chunk_rows`` rows / >=1h time windows per job.

    A table with a recorded bucketed layout is STICKY: its compaction
    routes through :func:`bucket_rewrite` with the manifest's spec (a
    plain time-ordered rewrite would silently destroy the bucket
    clustering the layout promises to readers).

    Runs under the workspace writer lock (Catalog.writer_lock, shared
    pidfile+flock protocol with collect and the streaming rollup): a
    second live writer on this workspace is refused, never raced.
    """
    import shutil

    with catalog.writer_lock(f"compact {table}"):
        return _compact_table_locked(
            spark, catalog, table, reindex_expr, small_file_bytes,
            max_chunk_rows, zorder_by,
        )


def _compact_table_locked(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    reindex_expr: str | None,
    small_file_bytes: int,
    max_chunk_rows: int,
    zorder_by: list[str] | None,
) -> dict:
    import shutil

    lay = catalog.table_layout(table)
    if lay and reindex_expr is None:
        return bucket_rewrite(
            spark, catalog, table, lay["bucket_by"], lay["num_buckets"], lay["sort_by"]
        )

    keys = enumerate_partition_keys(catalog, table)
    rewritten, merged_files, rows_total, chunk_jobs = 0, 0, 0, 0
    rewritten_keys: list[str] = []

    if reindex_expr is not None:
        df = catalog.read_table(spark, table)
        rows_total = df.count()
        new = (
            df.withColumn("tp_index", F.expr(reindex_expr).cast("string"))
            .repartitionByRange("tp_partition", "tp_index", "tp_year", "tp_month", "tp_timestamp")
            .sortWithinPartitions("tp_timestamp")
        )
        staged = catalog.new_staging_dir(f"{table}.reindex")
        new.write.partitionBy(*PARTITION_COLS).mode("overwrite").parquet(staged)
        shutil.rmtree(catalog.table_dir(table))
        os.replace(staged, catalog.table_dir(table))
        catalog.record_snapshot("compact", {"table": table, "reindex": True})
        catalog.refresh_file_index(table)
        if lay:
            # the reindex wrote plain files; restore the promised layout
            bucket_rewrite(
                spark, catalog, table,
                lay["bucket_by"], lay["num_buckets"], lay["sort_by"],
            )
        return {"keys_rewritten": len(keys), "files_merged": 0, "rows": rows_total}

    base = catalog.table_dir(table)
    for key in keys:
        stats = file_stats(catalog, table, key)
        overlaps = find_overlaps(stats)
        small = [s for s in stats if s.bytes < small_file_bytes]
        if not overlaps and len(small) <= 1:
            continue
        part_dir = os.path.join(base, key.relpath)
        df = spark.read.parquet(part_dir)
        total_bytes = sum(s.bytes for s in stats)
        rows = sum(s.rows for s in stats)
        windows = chunk_windows(stats, max_chunk_rows)
        n_out = max(1, total_bytes // max(1, len(windows)) // TARGET_FILE_BYTES)
        staged = catalog.new_staging_dir(f"{table}.compact")
        for wi, (lo, hi) in enumerate(windows):
            chunk = df
            if lo is not None:
                chunk = chunk.filter(F.col("tp_timestamp") >= F.lit(lo))
            if hi is not None:
                cond = F.col("tp_timestamp") < F.lit(hi)
                if lo is None:  # first window keeps stat-less rows
                    cond = cond | F.col("tp_timestamp").isNull()
                chunk = chunk.filter(cond)
            if zorder_by:
                from tailpipe_spark.plans.zorder import zorder_rewrite

                out = zorder_rewrite(chunk, zorder_by, int(n_out))
            else:
                out = chunk.repartitionByRange(
                    int(n_out), F.col("tp_timestamp")
                ).sortWithinPartitions("tp_timestamp")
            out.write.mode("append").parquet(staged)
            chunk_jobs += 1
        shutil.rmtree(part_dir)
        os.replace(staged, part_dir)
        rewritten += 1
        rewritten_keys.append(key.relpath)
        merged_files += len(stats)
        rows_total += rows

    catalog.record_snapshot(
        "compact", {"table": table, "keys": rewritten, "files": merged_files}
    )
    if rewritten:
        # a z-ordered layout makes its companion columns selective per
        # file — index them so pruned_files() can skip on them too.
        # Only the rewritten partition keys are re-footer-read; the
        # rest of the index is untouched (O(files touched), not
        # O(table)). A changed companion-column set triggers the full
        # rebuild inside refresh_partition_index.
        catalog.refresh_partition_index(
            table,
            rewritten_keys,
            columns=[c for c in (zorder_by or []) if c != "tp_timestamp"] or None,
        )
    return {
        "keys_rewritten": rewritten,
        "files_merged": merged_files,
        "rows": rows_total,
        "chunk_jobs": chunk_jobs,
    }
