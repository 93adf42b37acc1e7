"""Manifest-based data skipping: the file index must prune only what
the predicate provably excludes, fall back on staleness, and never drop
null-timestamp rows (which the query layer's lower bound keeps)."""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from tailpipe_spark.cli import main


@pytest.fixture()
def monthly_workspace(spark, workspace, tmp_path):
    """Three months of data → three tp_month partition dirs/files."""
    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [
        {"server_id": f"srv-{i % 2}", "cpu": float(i),
         "time": f"2024-{m:02d}-{d:02d}T12:00:00"}
        for m in (3, 4, 5)
        for i, d in enumerate((1, 10, 20))
    ]
    p = tmp_path / "m.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="metrics",
        columns=[
            ColumnConfig(name="server_id", type="varchar"),
            ColumnConfig(name="cpu", type="double"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    collect(spark, workspace, table, PartitionConfig("metrics", "default"),
            source_df=read_jsonl(spark, [str(p)]))
    return workspace


def test_collect_builds_file_index(monthly_workspace):
    idx = monthly_workspace.load_file_index("metrics")
    assert idx, "collect must refresh the file index"
    assert all(e["min_ts"] is not None for e in idx)
    assert {e["path"] for e in idx} == {
        os.path.relpath(os.path.join(r, n), monthly_workspace.table_dir("metrics"))
        for r, _d, ns in os.walk(monthly_workspace.table_dir("metrics"))
        for n in ns
        if n.endswith(".parquet")
    }


def test_torn_trailing_index_line_degrades_not_raises(monthly_workspace):
    """A crash mid-_append_index leaves a torn final JSONL line; the
    loader returns the parsed prefix (r7 ADVICE — it used to raise
    JSONDecodeError, taking down every query path instead of degrading
    to a full scan). pruned_files then sees a file-set mismatch and
    falls back to None. Mid-file corruption returns None outright."""
    cat = monthly_workspace
    full = cat.load_file_index("metrics")
    p = cat._index_path("metrics")
    with open(p, "a") as f:
        f.write('{"path": "torn/partial')  # no newline, no close brace
    torn = cat.load_file_index("metrics")
    assert torn is not None
    assert {e["path"] for e in torn} == {e["path"] for e in full}
    # the prefix is self-consistent with disk, so pruning still works
    assert cat.pruned_files("metrics") is not None

    with open(p) as f:
        lines = f.read().splitlines()
    with open(p, "w") as f:
        f.write(lines[0][: len(lines[0]) // 2] + "\n")  # corrupt line 1
        f.write("\n".join(lines[1:]) + "\n")
    assert cat.load_file_index("metrics") is None  # mid-file corruption


def test_pruned_files_subset_and_correct(monthly_workspace, spark):
    cat = monthly_workspace
    all_files = cat.pruned_files("metrics")
    april = cat.pruned_files(
        "metrics",
        time_from=datetime.datetime(2024, 4, 1),
        time_to=datetime.datetime(2024, 5, 1),
    )
    assert april is not None and all_files is not None
    assert len(april) < len(all_files)
    # the pruned read returns exactly the rows the full read + filter does
    pruned = cat.read_table(
        spark, "metrics",
        time_from=datetime.datetime(2024, 4, 1),
        time_to=datetime.datetime(2024, 5, 1),
    ).filter(
        (F.col("tp_timestamp") >= "2024-04-01") & (F.col("tp_timestamp") < "2024-05-01")
    )
    full = cat.read_table(spark, "metrics").filter(
        (F.col("tp_timestamp") >= "2024-04-01") & (F.col("tp_timestamp") < "2024-05-01")
    )
    assert sorted(map(str, pruned.collect())) == sorted(map(str, full.collect()))
    assert full.count() == 3


def test_stale_index_falls_back_to_full_scan(monthly_workspace):
    cat = monthly_workspace
    # mutate the on-disk file set behind the index's back
    tdir = cat.table_dir("metrics")
    victim = next(
        os.path.join(r, n)
        for r, _d, ns in os.walk(tdir)
        for n in ns
        if n.endswith(".parquet")
    )
    os.rename(victim, victim + ".moved")
    assert cat.pruned_files("metrics", time_from=datetime.datetime(2024, 4, 1)) is None
    os.rename(victim + ".moved", victim)
    assert cat.pruned_files("metrics", time_from=datetime.datetime(2024, 4, 1)) is not None


def test_all_pruned_returns_empty_schema_preserving_scan(monthly_workspace, spark):
    df = monthly_workspace.read_table(
        spark, "metrics",
        time_from=datetime.datetime(2030, 1, 1),
    )
    assert df.count() == 0
    assert "server_id" in df.columns and "tp_partition" in df.columns


def test_cli_query_uses_index_and_matches(monthly_workspace, capsys):
    rc = main([
        "--workspace", monthly_workspace.workspace,
        "query", "select count(*) as n from metrics",
        "--from", "2024-04-01T00:00:00", "--to", "2024-05-01T00:00:00",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "3"


def test_null_stat_files_always_kept(monthly_workspace):
    cat = monthly_workspace
    idx = cat.load_file_index("metrics")
    # simulate a file whose footer had no usable stats (null_ts=None)
    idx[0]["min_ts"] = None
    idx[0]["max_ts"] = None
    idx[0]["null_ts"] = None
    cat._store_index("metrics", idx)
    kept = cat.pruned_files("metrics", time_from=datetime.datetime(2030, 1, 1))
    stats_less = os.path.join(cat.table_dir("metrics"), idx[0]["path"])
    assert stats_less in kept


def test_multi_column_index_prunes_on_companion_column(spark, tmp_path, workspace):
    """Z-order + multi-column file index: a predicate on the companion
    column must skip files via manifest stats alone, with identical
    query results."""
    from pyspark.sql import functions as F

    from tailpipe_spark.plans.zorder import zorder_rewrite

    # build a table dir by hand: z-ordered files over (ts-ish, cpu)
    df = spark.range(20000).select(
        F.col("id").alias("k"),
        F.abs(F.xxhash64(F.col("id"))).bitwiseAND(F.lit(0xFFFF)).alias("cpu"),
    )
    tdir = workspace.table_dir("zt")
    workspace.ensure_table("zt", {"k": "bigint", "cpu": "bigint"})
    zorder_rewrite(df, ["k", "cpu"], 16).write.mode("overwrite").parquet(tdir)
    n = workspace.refresh_file_index("zt", columns=["cpu"])
    assert n >= 16
    all_files = workspace.pruned_files("zt")
    narrow = workspace.pruned_files("zt", predicates={"cpu": (0, 2000)})
    assert narrow is not None
    assert len(narrow) < len(all_files)
    # equality: union of kept files covers every qualifying row
    kept = spark.read.parquet(*narrow).where(F.col("cpu") <= 2000)
    full = spark.read.parquet(tdir).where(F.col("cpu") <= 2000)
    assert kept.count() == full.count()
    assert kept.agg(F.sum("k")).collect()[0][0] == full.agg(F.sum("k")).collect()[0][0]


def test_pruned_files_accepts_tz_aware_bounds(monthly_workspace):
    """Relative CLI bounds (--from T-7d) arrive tz-aware; pruning must
    normalize instead of raising TypeError (r6 ADVICE, high)."""
    cat = monthly_workspace
    naive = cat.pruned_files(
        "metrics",
        time_from=datetime.datetime(2024, 4, 1),
        time_to=datetime.datetime(2024, 5, 1),
    )
    aware = cat.pruned_files(
        "metrics",
        time_from=datetime.datetime(2024, 4, 1, tzinfo=datetime.timezone.utc),
        time_to=datetime.datetime(2024, 5, 1, tzinfo=datetime.timezone.utc),
    )
    assert aware == naive


def _index_by_path(cat, table="metrics"):
    return {e["path"]: e for e in cat.load_file_index(table)}


def test_incremental_append_reads_only_new_footers(
    monthly_workspace, spark, tmp_path, monkeypatch
):
    """A collect into a table with N existing files must footer-read
    ONLY the files it wrote (r6 verdict: the full O(files) driver
    rescan per append was the one scale-killer-adjacent pattern), and
    the merged index must equal a full rebuild."""
    import pyarrow.parquet as pq

    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    cat = monthly_workspace
    n_existing = len(_index_by_path(cat))
    assert n_existing >= 3

    rows = [
        {"server_id": "srv-9", "cpu": 1.0, "time": "2024-06-05T12:00:00"},
        {"server_id": "srv-9", "cpu": 2.0, "time": "2024-06-15T12:00:00"},
    ]
    p = tmp_path / "new.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="metrics",
        columns=[
            ColumnConfig(name="server_id", type="varchar"),
            ColumnConfig(name="cpu", type="double"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )

    reads = []
    real = pq.read_metadata
    monkeypatch.setattr(pq, "read_metadata", lambda f, **kw: (reads.append(str(f)), real(f, **kw))[1])
    collect(spark, cat, table, PartitionConfig("metrics", "default"),
            source_df=read_jsonl(spark, [str(p)]))

    merged = _index_by_path(cat)
    n_new = len(merged) - n_existing
    assert n_new >= 1
    footer_reads = [f for f in reads if f.endswith(".parquet")]
    assert len(footer_reads) <= n_new  # never rescans existing files

    # merged index == full rebuild
    cat.refresh_file_index("metrics")
    rebuilt = _index_by_path(cat)
    assert merged == rebuilt


def test_compact_refreshes_only_rewritten_keys(
    monthly_workspace, spark, tmp_path, monkeypatch
):
    """compact re-footer-reads only the partition keys it rewrote."""
    import pyarrow.parquet as pq

    from tailpipe_spark.collect import collect
    from tailpipe_spark.compact import compact_table
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    cat = monthly_workspace
    # second batch into the same months → ≥2 small files per key, so
    # the small-file merge actually rewrites
    rows = [
        {"server_id": "srv-8", "cpu": 9.0, "time": f"2024-{m:02d}-25T12:00:00"}
        for m in (3, 4, 5)
    ]
    p = tmp_path / "second.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="metrics",
        columns=[
            ColumnConfig(name="server_id", type="varchar"),
            ColumnConfig(name="cpu", type="double"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    collect(spark, cat, table, PartitionConfig("metrics", "default"),
            source_df=read_jsonl(spark, [str(p)]))
    before = _index_by_path(cat)
    reads = []
    real = pq.read_metadata
    monkeypatch.setattr(pq, "read_metadata", lambda f, **kw: (reads.append(str(f)), real(f, **kw))[1])
    # force rewrite of every key by treating all files as small; the
    # point is that the index refresh is scoped to REWRITTEN keys
    res = compact_table(spark, cat, "metrics", small_file_bytes=1 << 30)
    assert res["keys_rewritten"] >= 1
    after = _index_by_path(cat)
    # index matches a from-scratch rebuild
    cat.refresh_file_index("metrics")
    assert after == _index_by_path(cat)
    assert set(after) != set(before)  # files actually changed


def test_delete_keeps_index_fresh(monthly_workspace, spark):
    """delete_range maintains the index for the keys it rewrote; the
    index stays usable (not stale) and matches a full rebuild."""
    from tailpipe_spark import writer

    cat = monthly_workspace
    n = writer.delete_range(
        cat, spark, "metrics", "default",
        time_from=datetime.datetime(2024, 4, 1),
        time_to=datetime.datetime(2024, 4, 30),
    )
    assert n > 0
    assert cat.pruned_files("metrics") is not None  # index not stale
    live = _index_by_path(cat)
    cat.refresh_file_index("metrics")
    assert live == _index_by_path(cat)


def test_connect_duckdb_views_glob_source_with_pruned_hint(monthly_workspace):
    """A time-bounded connect keeps the GLOB as the view source —
    resolved at query time, so files appended after connect stay
    visible to a long-lived session (the reference's catalog views
    behave this way) — and carries the manifest index's pruned file
    list only as a hint comment. Baking the list into the view (round
    7) froze the file set at connect time: the r7 advisor flagged that
    post-connect appends became silently invisible."""
    import re

    import duckdb

    from tailpipe_spark.connect import write_init_script

    cat = monthly_workspace
    tf, tt = "2024-04-01T00:00:00", "2024-05-01T00:00:00"
    path = write_init_script(
        cat, str(cat.workspace) + "/conn", dialect="duckdb",
        time_from=tf, time_to=tt,
    )
    script = open(path).read()
    assert "read_parquet([" not in script  # glob source, never a frozen list
    assert "**" in script
    hinted = sorted(
        re.findall(r"-- pruned-files: (.+)", script)[0].split()
    )
    expected = sorted(
        cat.pruned_files(
            "metrics",
            time_from=datetime.datetime(2024, 4, 1),
            time_to=datetime.datetime(2024, 5, 1),
        )
    )
    assert hinted == expected
    con = duckdb.connect()
    con.execute(script)
    n = con.execute('SELECT COUNT(*) FROM "metrics"').fetchone()[0]
    assert n == 3  # the April rows

    # query-time resolution: a file landing AFTER connect is visible
    # through the already-created view (within the baked time bound)
    import shutil

    april_file = next(
        os.path.join(r, n)
        for r, _d, ns in os.walk(cat.table_dir("metrics"))
        if "tp_month=4" in r
        for n in ns
        if n.endswith(".parquet")
    )
    shutil.copy(
        april_file, os.path.join(os.path.dirname(april_file), "late_append.parquet")
    )
    n2 = con.execute('SELECT COUNT(*) FROM "metrics"').fetchone()[0]
    assert n2 == 6  # the late append (a copy of the 3 April rows) is
    # visible without re-connecting — a frozen file list would still say 3


def test_connect_sql_dialect_emits_pruned_hint(monthly_workspace):
    """The spark-sql dialect (no multi-file syntax) carries the pruned
    list as a hint comment; unbounded connects carry neither."""
    from tailpipe_spark.connect import write_init_script

    cat = monthly_workspace
    bounded = open(
        write_init_script(
            cat, str(cat.workspace) + "/conn", dialect="sql",
            time_from="2024-04-01T00:00:00", time_to="2024-05-01T00:00:00",
        )
    ).read()
    assert "-- pruned-files: " in bounded
    unbounded = open(
        write_init_script(cat, str(cat.workspace) + "/conn", dialect="sql")
    ).read()
    assert "pruned-files" not in unbounded


def test_connect_stale_index_emits_no_pruned_hint(monthly_workspace):
    """A stale index must never advertise a wrong file list — the hint
    comment is dropped (the glob view source is unconditional)."""
    from tailpipe_spark.connect import write_init_script

    cat = monthly_workspace
    tdir = cat.table_dir("metrics")
    victim = next(
        os.path.join(r, n)
        for r, _d, ns in os.walk(tdir)
        for n in ns
        if n.endswith(".parquet")
    )
    os.rename(victim, victim + ".moved")
    try:
        script = open(
            write_init_script(
                cat, str(cat.workspace) + "/conn", dialect="duckdb",
                time_from="2024-04-01T00:00:00",
            )
        ).read()
        assert "read_parquet([" not in script
        assert "pruned-files" not in script  # stale index -> no hint
        assert "**" in script
    finally:
        os.rename(victim + ".moved", victim)


def test_merge_appends_constant_lines_not_index_rewrite(monthly_workspace, tmp_path, spark):
    """The JSONL sidecar grows by exactly the merged entries — the
    merge path must never rewrite the whole index (an O(index) JSON
    serialization per append is the driver bottleneck the sidecar
    exists to remove)."""
    import json as _json

    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    cat = monthly_workspace
    p = cat._index_path("metrics")
    before_lines = sum(1 for _ in open(p))
    before_mtime_manifest = os.path.getmtime(cat.manifest_path)

    rows = [{"server_id": "srv-7", "cpu": 3.0, "time": "2024-07-01T12:00:00"}]
    src = tmp_path / "one.jsonl"
    src.write_text(_json.dumps(rows[0]))
    table = TableConfig(
        name="metrics",
        columns=[
            ColumnConfig(name="server_id", type="varchar"),
            ColumnConfig(name="cpu", type="double"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    collect(spark, cat, table, PartitionConfig("metrics", "default"),
            source_df=read_jsonl(spark, [str(src)]))
    after_lines = sum(1 for _ in open(p))
    new_files = len(cat.load_file_index("metrics")) - before_lines
    assert new_files >= 1
    assert after_lines == before_lines + new_files  # append, not rewrite


def test_legacy_manifest_index_migrates_to_sidecar(monthly_workspace):
    """Pre-sidecar workspaces (index embedded in manifest.json) keep
    working: reads fall back, and the first merge migrates."""
    cat = monthly_workspace
    idx = cat.load_file_index("metrics")
    # simulate a legacy workspace: index in manifest, no sidecar
    m = cat._load()
    m["tables"]["metrics"]["file_index"] = idx
    cat._store(m)
    os.unlink(cat._index_path("metrics"))
    assert cat.load_file_index("metrics") == idx  # legacy fallback read
    assert cat.pruned_files("metrics") is not None
    n = cat.merge_file_index("metrics", [])  # no new files; migrates
    assert n == 0  # nothing appended; migration is a side effect
    assert os.path.exists(cat._index_path("metrics"))
    assert "file_index" not in cat._load()["tables"]["metrics"]
    assert {e["path"] for e in cat.load_file_index("metrics")} == {
        e["path"] for e in idx
    }
