"""SparkSession construction + test-table registration.

The reference engine opens a single in-process DuckDB connection
(reference: internal/database/duck_db.go:38-104); our equivalent is one
SparkSession tuned for the local[N] harness but configured so the same
code runs unmodified on a multi-executor cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), shuffle
partitions sized to cores, Arrow enabled for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: tables the driver generates under /root/testdata/sf*/ (TESTDATA.md)
TEST_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_session(
    app_name: str = "tailpipe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism. All settings are
    cluster-safe: on a real cluster, pass ``master=None`` and submit with
    ``spark-submit`` — the builder only sets a local master when none is
    configured.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (Spark's legacy default) carries no parquet min/max
        # statistics: footer-based compaction overlap sweeps and
        # row-group time skipping silently stop working. Micros int64
        # stats make time-range scans prune inside month partitions.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # zstd: ~30% smaller files than snappy at similar decode speed —
        # at 100 TB the scan is IO-bound, so ratio wins
        .config("spark.sql.parquet.compression.codec", "zstd")
        # cap rows per written file (the reference chunks conversion at
        # 5M rows — internal/database/compact.go:16-19); bounds both
        # file sizes and the memory of any single write task
        .config("spark.sql.files.maxRecordsPerFile", "5000000")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_runtime(spark: SparkSession) -> None:
    """Runtime-settable conf we need even on a session we didn't build
    (the correctness driver hands us its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The driver's testdata stores TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects; read as long nanos and convert (lossless here: the
    # data has microsecond resolution).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # tp_index is VARCHAR by contract (SURVEY.md §1.2); don't let hive
    # partition discovery re-type `tp_index=0` as int. tp_year/tp_month
    # are cast back to int in Catalog.read_table.
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    # int64-micros timestamps carry footer min/max stats (INT96 doesn't);
    # compaction's overlap sweep and row-group time pruning depend on them
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    # The driver's testdata stores parquet timestamp[us] WITHOUT the
    # isAdjustedToUTC flag; Spark 4's default infers those as
    # TIMESTAMP_NTZ, which unix_micros()/time arithmetic reject at
    # analysis. The data is UTC by contract (TESTDATA.md) — read it as
    # plain TIMESTAMP.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


import functools


@functools.lru_cache(maxsize=256)
def _nano_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns], from the file footer.

    Cached per path: this is driver-side footer I/O on every read, and
    the answer is stable — the driver's testdata is immutable and
    engine-written tables are always micros (so the cached [] holds)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    target = path
    if _os.path.isdir(path):
        files = _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        if not files:
            return []
        target = sorted(files)[0]
    try:
        schema = pq.read_schema(target)
    except Exception:  # noqa: BLE001 — non-parquet or unreadable: no conversion
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


@functools.lru_cache(maxsize=256)
def _split_profile(path: str) -> tuple[int, int]:
    """(total row groups, total bytes) across a parquet file/dir.

    Spark parallelizes a parquet scan by row group: a 20 MB table
    written as ONE row group runs its whole scan+map pipeline in ONE
    task no matter how many cores the session has. Driver-side footer
    I/O, cached per immutable path."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = (
        _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        if _os.path.isdir(path)
        else [path]
    )
    groups = size = 0
    for f in files:
        try:
            groups += pq.ParquetFile(f).metadata.num_row_groups
            size += _os.path.getsize(f)
        except Exception:  # noqa: BLE001 — unreadable: claim no knowledge
            return (1 << 30, 1 << 60)
    return (groups, size)


#: only inputs this small ever get the map-parallelism repartition; a
#: real table is orders of magnitude larger and never pays the shuffle
_REPARTITION_MAX_BYTES = 512 * 1024 * 1024


@functools.lru_cache(maxsize=256)
def parquet_row_count(path: str) -> int | None:
    """Exact row count from parquet footer metadata — driver-side I/O
    only, no Spark job. Used as a ``corpus_size`` hint so operators
    whose plan depends on corpus scale (hot-gram cap guard, auto-LSH
    flip) don't pay a count job. None when the path isn't parquet."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = (
        sorted(_glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True))
        if _os.path.isdir(path)
        else [path]
    )
    if not files:
        return None
    try:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:  # noqa: BLE001 — unreadable/non-parquet: no hint
        return None


@functools.lru_cache(maxsize=256)
def parquet_column_range(path: str, col: str) -> tuple | None:
    """(min, max) of a column across a parquet file/dir from footer
    stats — driver-side I/O only, no Spark job. None when any row
    group lacks stats for the column (callers must then assume the
    full domain). Used to PROVE properties like 'all ids fit in 32
    bits' before enabling packed-key plan variants."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = (
        sorted(_glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True))
        if _os.path.isdir(path)
        else [path]
    )
    if not files:
        return None
    lo = hi = None
    try:
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                group = md.row_group(rg)
                st = next(
                    (
                        group.column(i).statistics
                        for i in range(group.num_columns)
                        if group.column(i).path_in_schema == col
                    ),
                    None,
                )
                if st is None or not st.has_min_max:
                    return None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
    except Exception:  # noqa: BLE001 — unreadable/non-parquet: no proof
        return None
    return (lo, hi) if lo is not None else None


@functools.lru_cache(maxsize=256)
def _provisioned_bucketed_ws(path: str) -> tuple[str, str] | None:
    """(workspace, table) when ``path`` resolves — typically via a
    provisioned-layout symlink — into an engine workspace's
    ``data/<table>`` tree whose manifest records a bucketed layout.

    This is how a provisioned physical layout TRAVELS WITH THE DATA
    (r14 verdict ask #1): a bench/sf dir whose fact entries are links
    into a ``compact --bucket-by``-rewritten workspace serves those
    scans through the catalog's bucket-spec registration, so same-key
    joins plan with the fact-side Exchanges deleted. A plain fixture
    dir resolves to itself (parent is not ``data/``) and costs two
    path checks, cached per path. Layout metadata is read through
    Catalog, so a layout_rev bump invalidates via the registration
    name, not this cache."""
    real = os.path.realpath(path)
    parent = os.path.dirname(real)
    if os.path.basename(parent) != "data":
        return None
    ws = os.path.dirname(parent)
    if not os.path.isfile(os.path.join(ws, "metadata", "manifest.json")):
        return None
    return ws, os.path.basename(real)


#: (applicationId, path) → DataFrame. The driver's testdata is
#: immutable, so the logical plan (file listing + schema) is reusable;
#: without this every query pays a driver-side directory listing,
#: JVM schema inference, and the footer scan above. Engine-written
#: (mutable) tables go through Catalog.read_table, never this cache.
_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def tune_scan_splits(spark: SparkSession, total_bytes: int | None) -> None:
    """Size ``spark.sql.files.maxPartitionBytes`` to ~2 scan splits per
    core for the ACTIVE dataset, clamped to [4 MB, 128 MB].

    The 128 MB default never splits a single-file table and packs a
    small workspace's files into a handful of scan tasks, so local
    interactive queries ran their scan+map pipelines on 1-2 cores of 32
    (measured 30-40% of q01/q03-shaped wall). Past the clamp — any real
    cluster-scale dataset — the standard default applies unchanged.
    ``None`` (unknown size) keeps the session default."""
    if total_bytes is None:
        return
    cores = spark.sparkContext.defaultParallelism or 8
    mpb = max(4 << 20, min(128 << 20, total_bytes // (cores * 2)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))


def read_table(
    spark: SparkSession,
    path: str,
    *,
    cache: bool = True,
    parallelize: bool = False,
) -> DataFrame:
    """Read a parquet table, transparently converting nano-timestamp
    columns (unreadable by Spark's vectorized reader) to TimestampType.

    ``cache=True`` memoizes the DataFrame (file listing + schema) per
    (application, path) — correct only for immutable directories like the
    driver's testdata. Engine-written (mutable) tables never come through
    here (they use Catalog.read_table, uncached); any other caller
    pointing at a directory that may be rewritten must pass
    ``cache=False``, which also drops stale cached state for the path so
    later cached reads can't resurrect an old file listing."""
    from pyspark.sql import functions as F

    app = spark.sparkContext.applicationId
    key = (app, path, parallelize)
    if not cache:
        # drop EVERY cached variant for the path, not just this call's
        # (a stale file listing under the other parallelize flag would
        # otherwise survive), and clear the footer-derived caches —
        # a stale parquet_row_count fed back as corpus_size is
        # plan-changing (it can wrongly disable the hot-gram cap)
        _DF_CACHE.pop((app, path, True), None)
        _DF_CACHE.pop((app, path, False), None)
        _nano_timestamp_cols.cache_clear()
        _split_profile.cache_clear()
        parquet_row_count.cache_clear()
        _provisioned_bucketed_ws.cache_clear()
    else:
        cached = _DF_CACHE.get(key)
        if cached is not None:
            return cached
    # entries from terminated applications are dead weight — evict them
    # when a new application shows up
    for k in [k for k in _DF_CACHE if k[0] != app]:
        del _DF_CACHE[k]
    configure_runtime(spark)
    # provisioned bucketed layout: serve the scan through the owning
    # catalog's bucket-spec registration so same-key joins co-locate
    # (fact-side Exchanges deleted). Only engages when the path
    # resolves into a workspace data tree AND the manifest records a
    # bucketed layout for the table; every other path reads plain.
    prov = _provisioned_bucketed_ws(path)
    if prov is not None:
        from tailpipe_spark.catalog import Catalog

        ws, table = prov
        cat = Catalog(ws)
        if table in cat.list_tables() and cat.table_layout(table):
            df = cat.read_table(spark, table)
            if cache:
                _DF_CACHE[key] = df
            return df
    df = spark.read.parquet(path)
    for c in _nano_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"CAST(`{c}` DIV 1000 AS BIGINT)")))
    # Safety net for sessions whose first read predated configure_runtime
    # (the NTZ inference conf is read at plan time, but a cached plan or a
    # driver-created session can still surface TIMESTAMP_NTZ): cast to
    # TIMESTAMP. With session tz pinned to UTC this is value-identical.
    from pyspark.sql.types import TimestampNTZType

    for f_ in df.schema.fields:
        if isinstance(f_.dataType, TimestampNTZType):
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    # Row-group-bound parallelism fix, OPT-IN for CPU-heavy consumers: a
    # small table written as a handful of row groups caps the scan AND
    # every fused map stage at that many tasks — a 12-hash MinHash over
    # a one-row-group file runs single-core on a 32-core box. One
    # round-robin shuffle of a few MB buys full map parallelism there,
    # but for plain scan→agg plans the shuffle costs more than the
    # single-task scan, so callers choose. Large tables (many row
    # groups at any real scale) never take this path even when asked.
    if parallelize:
        groups, nbytes = _split_profile(path)
        # full core count, NOT capped by shuffle.partitions: the
        # consumers that opt in are CPU-heavy map pipelines (gram
        # explode, signature folds) whose input bytes say nothing
        # about their map cost — an input-sized shuffle setting would
        # serialize them on a few cores (measured 7.4→4.8 s at 10×
        # bench scale from this cap alone)
        par = spark.sparkContext.defaultParallelism
        if groups < par and nbytes <= _REPARTITION_MAX_BYTES:
            df = df.repartition(par)
    if cache:
        _DF_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table from ``sf_dir`` as DataFrames."""
    configure_runtime(spark)
    return {t: read_table(spark, f"{sf_dir}/{t}.parquet") for t in TEST_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view (like the reference's
    per-table views over the DuckLake catalog, reference:
    internal/database/views.go:14-34) and return the DataFrames."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
