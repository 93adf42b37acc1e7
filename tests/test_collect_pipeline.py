"""End-to-end collect → query pipeline tests (the Spark equivalent of
the reference's acceptance suite: write config → collect → query →
assert golden output; see SURVEY.md §5)."""

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tailpipe_spark import writer
from tailpipe_spark.collect import collect, load_state
from tailpipe_spark.compact import compact_table, enumerate_partition_keys
from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
from tailpipe_spark.schema import SchemaChangeError


@pytest.fixture()
def metrics_chunks(tmp_path):
    """server_metrics-style jsonl chunks (core_formats.bats:95-146)."""
    rows = [
        {"server_id": f"srv-{i % 3}", "cpu": 10.0 * i, "time": f"2024-05-{(i % 27) + 1:02d}T10:00:00"}
        for i in range(10)
    ]
    p = tmp_path / "exec1_0.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def _metrics_table():
    return TableConfig(
        name="server_metrics",
        columns=[
            ColumnConfig(name="server_id", type="varchar", required=True),
            ColumnConfig(name="cpu", type="double"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )


def test_collect_end_to_end(spark, workspace, metrics_chunks):
    from tailpipe_spark.sources.formats import read_jsonl

    src = read_jsonl(spark, [metrics_chunks])
    res = collect(
        spark,
        workspace,
        _metrics_table(),
        PartitionConfig("server_metrics", "default"),
        source_df=src,
        required=("tp_timestamp", "server_id"),
    )
    assert res.rows_written == 10
    assert res.rows_dropped == 0

    # registered view answers the acceptance query
    workspace.register_views(spark)
    out = spark.sql(
        "select server_id, count(*) as n from server_metrics group by server_id order by server_id"
    ).collect()
    assert [(r["server_id"], r["n"]) for r in out] == [
        ("srv-0", 4), ("srv-1", 3), ("srv-2", 3),
    ]
    # tp_* columns present; layout cols hidden from the view
    cols = spark.table("server_metrics").columns
    assert "tp_date" in cols and "tp_partition" in cols
    assert "tp_year" not in cols

    # collection state watermark persisted
    st = load_state(workspace, "server_metrics", "default")
    assert st["rows_total"] == 10 and st["watermark"]


def test_collect_json_column_stored_as_variant(spark, workspace, tmp_path):
    """A ``json``-typed column is tokenized ONCE at collect and stored
    as variant binary (the reference's DuckDB json storage type,
    ducklake_table.go:77-79); queries then navigate the binary via
    variant_get_int without re-parsing — measured 9.4x at 10M rows
    (SCALE_PROOF §json-ingest). Malformed documents store NULL (try_
    semantics), like the validation contract elsewhere."""
    from pyspark.sql import types as T

    from tailpipe_spark.functions.json_fast import variant_get_int
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [
        {"id": 1, "props": '{"k": 7, "tag": "a"}', "time": "2024-05-01T00:00:00"},
        {"id": 2, "props": '{"k": -3, "nested": {"x": 1}}', "time": "2024-05-01T01:00:00"},
        {"id": 3, "props": "not json at all", "time": "2024-05-01T02:00:00"},
        {"id": 4, "props": None, "time": "2024-05-01T03:00:00"},
    ]
    p = tmp_path / "j.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="jlogs",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="props", type="json"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    res = collect(
        spark,
        workspace,
        table,
        PartitionConfig("jlogs", "default"),
        source_df=read_jsonl(spark, [str(p)]),
    )
    assert res.rows_written == 4
    workspace.register_views(spark)
    view = spark.table("jlogs")
    assert isinstance(view.schema["props"].dataType, T.VariantType)
    got = {
        r["id"]: r["k"]
        for r in view.select("id", variant_get_int("props", "k").alias("k")).collect()
    }
    assert got == {1: 7, 2: -3, 3: None, 4: None}
    # catalog type string round-trips as "json"
    assert workspace.table_schema("jlogs")["props"] == "json"


def test_legacy_string_json_table_keeps_string_storage(spark, workspace, tmp_path):
    """Migration gate (ADVICE r13): a workspace whose json-declared
    column was collected by the pre-variant engine holds STRING parquet
    and a manifest type of ``varchar``. A new collect with the same
    ``json`` declaration must keep appending string (variant and string
    files cannot merge in one scan) rather than corrupting the table or
    raising SchemaChangeError at the upgrade boundary."""
    from pyspark.sql import types as T

    from tailpipe_spark.sources.formats import read_jsonl

    def chunk(path, ids):
        path.write_text(
            "\n".join(
                json.dumps({"id": i, "props": '{"k": %d}' % i,
                            "time": "2024-05-01T00:00:00"})
                for i in ids
            )
        )
        return read_jsonl(spark, [str(path)])

    def cfg(props_type):
        return TableConfig(
            name="legacyj",
            columns=[
                ColumnConfig(name="id", type="bigint"),
                ColumnConfig(name="props", type=props_type),
                ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
            ],
            map_fields=[],
        )

    # legacy collect: the old engine stored json as string → declared
    # varchar reproduces its on-disk layout and manifest entry exactly
    collect(spark, workspace, cfg("varchar"),
            PartitionConfig("legacyj", "default"),
            source_df=chunk(tmp_path / "l1.jsonl", [1, 2]))
    assert workspace.table_schema("legacyj")["props"] == "varchar"

    # upgraded engine, same user config now meaning variant: must detect
    # the legacy layout and keep string
    collect(spark, workspace, cfg("json"),
            PartitionConfig("legacyj", "default"),
            source_df=chunk(tmp_path / "l2.jsonl", [3, 4]))
    workspace.register_views(spark)
    view = spark.table("legacyj")
    assert isinstance(view.schema["props"].dataType, T.StringType)
    assert view.count() == 4


def test_footer_backends_agree(spark, tmp_path):
    """FooterInfo's DuckDB fallback (used when pyarrow can't parse a
    footer carrying VARIANT) must report the SAME num_rows and raw-typed
    column stats as the pyarrow primary — compaction's datetime
    arithmetic and the jsonable file index both consume them."""
    from tailpipe_spark.catalog import FooterInfo, _duck_footer

    df = spark.createDataFrame(
        [(i, datetime(2024, 5, 1 + i, 12, 0, 0), float(i)) for i in range(5)],
        "id long, tp_timestamp timestamp, v double",
    )
    (tmp_path / "plain").mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "plain"))
    pfile = next(
        str(f) for f in (tmp_path / "plain").iterdir()
        if f.name.endswith(".parquet")
    )
    fi = FooterInfo(pfile)
    assert fi._md is not None  # pyarrow path on a plain file
    duck_rows, duck_stats = _duck_footer(pfile)
    assert duck_rows == fi.num_rows == 5
    for col in ("id", "tp_timestamp", "v"):
        pa = fi.col_stats(col)
        dk = duck_stats[col]
        assert pa is not None and dk is not None
        assert pa == dk, f"{col}: pyarrow {pa} vs duckdb {dk}"


def test_collect_drops_invalid_rows(spark, workspace, tmp_path):
    p = tmp_path / "c.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"server_id": "a", "time": "2024-05-01T00:00:00"}),
                json.dumps({"server_id": None, "time": "2024-05-01T00:00:00"}),
                json.dumps({"server_id": "b", "time": None}),
            ]
        )
    )
    from tailpipe_spark.sources.formats import read_jsonl

    res = collect(
        spark,
        workspace,
        _metrics_table(),
        PartitionConfig("server_metrics", "default"),
        source_df=read_jsonl(spark, [str(p)]),
        required=("tp_timestamp", "server_id"),
    )
    assert res.rows_written == 1
    assert res.rows_dropped == 2
    assert set(res.null_columns) == {"server_id", "tp_timestamp"}


def test_collect_partition_filter_and_index(spark, workspace, tmp_path):
    rows = [{"id": i, "time": "2024-05-01T00:00:00"} for i in range(10)]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    from tailpipe_spark.sources.formats import read_jsonl

    table = TableConfig(
        name="t",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    res = collect(
        spark,
        workspace,
        table,
        PartitionConfig("t", "evens", filter="id % 2 = 0", tp_index="id"),
        source_df=read_jsonl(spark, [str(p)]),
    )
    # exactly half of 10 rows (partition_tests.bats parity)
    assert res.rows_written == 5
    df = workspace.read_table(spark, "t")
    assert df.filter(F.col("tp_index") == "0").count() == 1
    assert set(r["tp_partition"] for r in df.select("tp_partition").distinct().collect()) == {"evens"}


def test_schema_change_is_error(spark, workspace, tmp_path):
    from tailpipe_spark.sources.formats import read_jsonl

    a = tmp_path / "a.jsonl"
    a.write_text(json.dumps({"id": 1, "time": "2024-05-01T00:00:00"}))
    table = TableConfig(
        name="t2",
        columns=[ColumnConfig(name="tp_timestamp", type="timestamp", source="time")],
        map_fields=["*"],
    )
    part = PartitionConfig("t2", "default")
    collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(a)]))

    b = tmp_path / "b.jsonl"
    b.write_text(json.dumps({"id": "not-a-number", "time": "2024-05-02T00:00:00"}))
    with pytest.raises(SchemaChangeError):
        collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(b)]))


def test_overwrite_range_recollect(spark, workspace, tmp_path):
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [{"id": i, "time": f"2024-05-{i+1:02d}T00:00:00"} for i in range(6)]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="t3",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    part = PartitionConfig("t3", "default")
    src = read_jsonl(spark, [str(p)])
    collect(spark, workspace, table, part, source_df=src)
    assert workspace.file_stats("t3")["rows"] == 6

    # overwrite a sub-range: deletes then re-collects only that window
    res = collect(
        spark, workspace, table, part, source_df=src,
        time_from=datetime(2024, 5, 2), time_to=datetime(2024, 5, 4),
        overwrite=True,
    )
    assert res.rows_written == 3
    assert workspace.file_stats("t3")["rows"] == 6  # no duplicates


def test_delete_range(spark, workspace, tmp_path):
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [{"id": i, "time": f"2024-{m:02d}-01T00:00:00"} for i, m in enumerate([1, 2, 3])]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="t4",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    part = PartitionConfig("t4", "default")
    collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(p)]))
    n = writer.delete_range(
        workspace, spark, "t4", "default",
        datetime(2024, 2, 1), datetime(2024, 2, 28),
    )
    assert n == 1
    assert workspace.file_stats("t4")["rows"] == 2


def test_compaction_merges_small_files(spark, workspace, tmp_path):
    from tailpipe_spark.sources.formats import read_jsonl

    table = TableConfig(
        name="t5",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    part = PartitionConfig("t5", "default")
    # several collects → several small overlapping files in one month
    for batch in range(3):
        rows = [
            {"id": batch * 10 + i, "time": f"2024-05-{i+1:02d}T0{batch}:00:00"}
            for i in range(5)
        ]
        p = tmp_path / f"c{batch}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(p)]))

    keys = enumerate_partition_keys(workspace, "t5")
    assert len(keys) == 1
    before = workspace.file_stats("t5")
    assert before["files"] >= 3

    summary = compact_table(spark, workspace, "t5")
    after = workspace.file_stats("t5")
    assert summary["keys_rewritten"] == 1
    assert after["rows"] == before["rows"] == 15
    assert after["files"] < before["files"]
    # data intact and time-ordered within the file
    df = workspace.read_table(spark, "t5")
    assert df.count() == 15

    # idempotent: second run rewrites nothing
    assert compact_table(spark, workspace, "t5")["keys_rewritten"] == 0


def test_compaction_reindex(spark, workspace, tmp_path):
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [{"id": i, "time": "2024-05-01T00:00:00"} for i in range(4)]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="t6",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    collect(spark, workspace, table, PartitionConfig("t6", "default"),
            source_df=read_jsonl(spark, [str(p)]))
    df = workspace.read_table(spark, "t6")
    assert set(r["tp_index"] for r in df.select("tp_index").distinct().collect()) == {"default"}

    compact_table(spark, workspace, "t6", reindex_expr="id")
    df = workspace.read_table(spark, "t6")
    assert set(r["tp_index"] for r in df.select("tp_index").distinct().collect()) == {"0", "1", "2", "3"}


def test_collect_incremental_file_state(spark, workspace, tmp_path):
    import os
    import time as _time

    from tailpipe_spark.collect import collect_incremental
    from tailpipe_spark.config import FormatConfig, SourceConfig

    land = tmp_path / "land"
    land.mkdir()
    (land / "c0.jsonl").write_text(
        "\n".join(json.dumps({"id": i, "time": "2024-05-01T00:00:00"}) for i in range(4))
    )
    table = TableConfig(
        name="inc",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    part = PartitionConfig(
        "inc", "default",
        source=SourceConfig(paths=[str(land / "*.jsonl")], format=FormatConfig(type="jsonl")),
    )
    r1 = collect_incremental(spark, workspace, table, part)
    assert r1.rows_written == 4
    # nothing new: no-op, no spark job needed
    r2 = collect_incremental(spark, workspace, table, part)
    assert r2.rows_written == 0
    # a new chunk appears: only it is ingested
    (land / "c1.jsonl").write_text(json.dumps({"id": 9, "time": "2024-05-02T00:00:00"}))
    r3 = collect_incremental(spark, workspace, table, part)
    assert r3.rows_written == 1
    assert workspace.file_stats("inc")["rows"] == 5
    # a file is rewritten (mtime changes): re-ingested
    _time.sleep(0.02)
    (land / "c1.jsonl").write_text(json.dumps({"id": 10, "time": "2024-05-03T00:00:00"}))
    os.utime(land / "c1.jsonl")
    r4 = collect_incremental(spark, workspace, table, part)
    assert r4.rows_written == 1
    assert workspace.file_stats("inc")["rows"] == 6


def test_backfill_keeps_watermark_monotonic(spark, workspace, tmp_path):
    from tailpipe_spark.sources.formats import read_jsonl

    table = _metrics_table()
    part = PartitionConfig("server_metrics", "default")
    new = tmp_path / "new.jsonl"
    new.write_text(json.dumps(
        {"server_id": "a", "cpu": 1.0, "time": "2024-06-15T12:00:00"}))
    collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(new)]),
            required=("tp_timestamp",))
    wm1 = load_state(workspace, "server_metrics", "default")["watermark"]

    # backfill an OLDER range: the resume watermark must not move back
    old = tmp_path / "old.jsonl"
    old.write_text(json.dumps(
        {"server_id": "a", "cpu": 2.0, "time": "2024-01-01T00:00:00"}))
    collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(old)]),
            required=("tp_timestamp",))
    st = load_state(workspace, "server_metrics", "default")
    assert st["watermark"] == wm1
    assert st["earliest"].startswith("2024-01-01")

    # a resume after the backfill ingests nothing old twice
    res = collect(spark, workspace, table, part,
                  source_df=read_jsonl(spark, [str(old)]),
                  required=("tp_timestamp",), resume=True)
    assert res.rows_written == 0


def test_collect_does_not_walk_table_footers(spark, workspace, metrics_chunks):
    """Row accounting must ride the write job (Observation), not scan
    every parquet footer in the table before and after each append."""
    from tailpipe_spark.sources.formats import read_jsonl

    calls = []
    orig = type(workspace).file_stats
    type(workspace).file_stats = lambda self, t: calls.append(t) or orig(self, t)
    try:
        res = collect(
            spark, workspace, _metrics_table(),
            PartitionConfig("server_metrics", "default"),
            source_df=read_jsonl(spark, [metrics_chunks]),
            required=("tp_timestamp", "server_id"),
        )
    finally:
        type(workspace).file_stats = orig
    assert res.rows_written == 10
    assert calls == []


def test_compaction_chunks_large_partitions(spark, workspace, tmp_path):
    """A hot partition rewrites as multiple bounded jobs, not one giant
    one (reference chunks at 5M rows / >=1h windows)."""
    from tailpipe_spark.sources.formats import read_jsonl

    table = TableConfig(
        name="t7",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    part = PartitionConfig("t7", "default")
    # 3 overlapping batches spread over distinct hours of one month
    for batch in range(3):
        rows = [
            {"id": batch * 100 + i, "time": f"2024-05-01T{2*batch + i % 2:02d}:30:00"}
            for i in range(40)
        ]
        p = tmp_path / f"b{batch}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(p)]))

    before = workspace.file_stats("t7")["rows"]
    summary = compact_table(spark, workspace, "t7", max_chunk_rows=50)
    assert summary["keys_rewritten"] == 1
    assert summary["chunk_jobs"] >= 2  # bounded jobs, not one rewrite
    assert workspace.file_stats("t7")["rows"] == before == 120
    # no tmp droppings inside the table tree, staging swept
    import os
    for root, dirs, _files in os.walk(workspace.table_dir("t7")):
        assert not any(d.endswith(".tmp") for d in dirs)
    assert workspace.file_stats("t7")["rows"] == workspace.read_table(spark, "t7").count()


def test_stale_staging_swept_on_open(workspace):
    import os

    from tailpipe_spark.catalog import Catalog

    d = workspace.new_staging_dir("t.crashed")
    (open(os.path.join(d, "leftover.parquet"), "w")).close()
    assert os.path.isdir(d)
    Catalog(workspace.workspace)  # reopen: FRESH staging must survive
    assert os.path.isdir(d)       # (a live rewrite in another process)
    old = 1_000_000.0
    os.utime(d, (old, old))
    Catalog(workspace.workspace)  # stale (past TTL) staging is swept
    assert not os.path.isdir(d)


def test_delete_range_with_escaped_partition_values(spark, workspace, tmp_path):
    """Hive layout percent-escapes special chars in dir names
    (tp_index='a:b' -> tp_index=a%3Ab); delete_range must match dirs by
    unescaped value, not rebuild paths from raw strings."""
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [
        {"id": i, "idx": "a:b", "time": f"2024-{m:02d}-01T00:00:00"}
        for i, m in enumerate([1, 2, 3])
    ]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="t_esc",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="idx", type="varchar"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    part = PartitionConfig("t_esc", "default", tp_index="idx")
    collect(spark, workspace, table, part, source_df=read_jsonl(spark, [str(p)]))
    assert workspace.file_stats("t_esc")["rows"] == 3

    n = writer.delete_range(
        workspace, spark, "t_esc", "default",
        datetime(2024, 2, 1), datetime(2024, 2, 28),
    )
    assert n == 1
    df = workspace.read_table(spark, "t_esc")
    assert df.count() == 2
    assert {r["tp_index"] for r in df.select("tp_index").collect()} == {"a:b"}


def test_collect_all_rows_invalid_writes_nothing(spark, workspace, tmp_path):
    """Empty valid set: the observed write resolves (no metric hang),
    zero rows land, and the watermark stays unset."""
    from tailpipe_spark.sources.formats import read_jsonl

    p = tmp_path / "c.jsonl"
    p.write_text(json.dumps({"server_id": "a", "time": None}))
    res = collect(
        spark, workspace, _metrics_table(),
        PartitionConfig("server_metrics", "default"),
        source_df=read_jsonl(spark, [str(p)]),
        required=("tp_timestamp",),
    )
    assert res.rows_written == 0 and res.rows_dropped == 1
    st = load_state(workspace, "server_metrics", "default")
    assert st.get("watermark") is None
    assert st["rows_total"] == 0


def test_collect_drops_and_reports_corrupt_jsonl_rows(spark, workspace, tmp_path):
    """A malformed JSONL line yields an all-null row (Spark PERMISSIVE
    mode); its null tp_timestamp must be counted, reported, and the row
    deleted before insert — the reference's invalid-row contract
    (convertor_validate.go) extended to parse failures."""
    import json

    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    p = tmp_path / "corrupt.jsonl"
    p.write_text(
        json.dumps({"server_id": "s1", "time": "2024-05-01T00:00:00"})
        + "\nTHIS IS NOT JSON AT ALL\n"
        + json.dumps({"server_id": "s2", "time": "2024-05-02T00:00:00"})
    )
    table = TableConfig(
        name="corrupt_t",
        columns=[
            ColumnConfig(name="server_id", type="varchar"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    res = collect(
        spark, workspace, table, PartitionConfig("corrupt_t", "default"),
        source_df=read_jsonl(spark, [str(p)]),
    )
    assert res.rows_written == 2
    assert res.rows_dropped == 1
    assert "tp_timestamp" in res.null_columns
    back = workspace.read_table(spark, "corrupt_t")
    assert sorted(r["server_id"] for r in back.collect()) == ["s1", "s2"]
