import json

import pytest

from tailpipe_spark.shell import Shell


@pytest.fixture()
def shell(spark, workspace, tmp_path):
    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [{"id": i, "lvl": "E" if i % 2 else "I", "time": "2024-05-01T00:00:00"} for i in range(6)]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="logs",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="lvl", type="varchar"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    collect(spark, workspace, table, PartitionConfig("logs", "default"),
            source_df=read_jsonl(spark, [str(p)]))
    return Shell(spark, workspace)


def test_shell_sql(shell):
    out = shell.handle("select lvl, count(*) as n from logs group by lvl order by lvl")
    assert "E" in out and "3" in out


def test_shell_output_modes(shell):
    shell.handle(".output csv")
    out = shell.handle("select lvl, count(*) as n from logs group by lvl order by lvl")
    assert out.splitlines() == ["lvl,n", "E,3", "I,3"]
    shell.handle(".header off")
    out = shell.handle("select count(*) as n from logs")
    assert out == "6"
    shell.handle(".separator |")
    shell.handle(".header on")
    out = shell.handle("select lvl, count(*) as n from logs group by lvl order by lvl")
    assert out.splitlines()[1] == "E|3"


def test_shell_tables_and_inspect(shell):
    out = shell.handle(".tables")
    assert "logs" in out and "6 rows" in out
    detail = shell.handle(".inspect logs")
    assert "lvl: varchar" in detail
    assert "partitions: default" in detail
    assert shell.handle(".inspect nope").startswith("Error")


def test_shell_errors(shell):
    assert "no data has been collected" in shell.handle("select * from missing")
    assert shell.handle(".bogus").startswith("unknown metaquery")
    with pytest.raises(EOFError):
        shell.handle(".exit")


def test_shell_timing_toggle(shell):
    assert shell.handle(".timing on") == "timing: on"
    out = shell.handle("select count(*) as n from logs")
    assert "\nTime: " in out and out.rstrip().endswith("s")
    shell.handle(".timing off")
    assert "Time:" not in shell.handle("select count(*) as n from logs")


def test_shell_ctrl_c_cancels_query_and_survives(shell, monkeypatch):
    """Ctrl-C mid-query must cancel the Spark job group and leave the
    shell usable (reference: interactive_client_cancel.go)."""
    import tailpipe_spark.shell as shell_mod

    cancelled = []
    monkeypatch.setattr(
        shell.spark.sparkContext, "cancelJobGroup", lambda g: cancelled.append(g)
    )

    def interrupted_render(*a, **kw):
        raise KeyboardInterrupt

    monkeypatch.setattr(shell_mod, "render", interrupted_render)
    out = shell.handle("select count(*) as n from logs")
    assert out == "Query cancelled"
    assert cancelled == [Shell.JOB_GROUP]

    # the next statement runs normally on the same shell
    monkeypatch.undo()
    out = shell.handle("select count(*) as n from logs")
    assert "6" in out


def test_shell_live_reloads_new_tables(shell, spark, workspace, tmp_path):
    """A collect running in another process updates the workspace
    manifest; the shell's next statement must see the new table without
    restarting (reference: connection_watcher.go live reload)."""
    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    assert "no data has been collected" in shell.handle("select * from audit")

    p = tmp_path / "audit.jsonl"
    p.write_text(json.dumps({"id": 7, "time": "2024-06-01T00:00:00"}))
    table = TableConfig(
        name="audit",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    collect(spark, workspace, table, PartitionConfig("audit", "default"),
            source_df=read_jsonl(spark, [str(p)]))

    out = shell.handle("select id from audit")
    assert "7" in out


def test_file_watcher_detects_add_modify_remove(tmp_path):
    from tailpipe_spark.watcher import FileWatcher

    d = tmp_path / "cfg"
    d.mkdir()
    f1 = d / "a.tpc"
    f1.write_text("x = 1")
    w = FileWatcher([str(d)])
    assert w.changed() == []
    f2 = d / "b.json"
    f2.write_text("{}")
    assert w.changed() == [str(f2)]
    import os as _os

    _os.utime(f1, (1, 1))
    assert w.changed() == [str(f1)]
    f1.unlink()
    assert w.changed() == [str(f1)]
    assert w.changed() == []


def test_collect_resume_watermark(spark, workspace, tmp_path):
    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    table = TableConfig(
        name="resume_t",
        columns=[
            ColumnConfig(name="id", type="bigint"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    part = PartitionConfig("resume_t", "default")

    a = tmp_path / "a.jsonl"
    a.write_text("\n".join(
        json.dumps({"id": i, "time": f"2024-05-0{i+1}T00:00:00"}) for i in range(3)
    ))
    from_first = collect(spark, workspace, table, part,
                         source_df=read_jsonl(spark, [str(a)]))
    assert from_first.rows_written == 3

    # second run sees the old rows AND two new ones; resume skips the old
    b = tmp_path / "b.jsonl"
    b.write_text("\n".join(
        json.dumps({"id": i, "time": f"2024-05-0{i+1}T00:00:00"}) for i in range(5)
    ))
    res = collect(spark, workspace, table, part,
                  source_df=read_jsonl(spark, [str(b)]), resume=True)
    assert res.rows_written == 2
    assert workspace.file_stats("resume_t")["rows"] == 5


def test_shell_help_and_multi_autocomplete_toggles(shell):
    help_out = shell.handle(".help")
    for m in (".multi", ".autocomplete", ".headers", ".output", ".inspect"):
        assert m in help_out
    assert shell.multiline is False
    assert ".multi" in shell.handle(".multi")  # usage
    assert shell.handle(".multi on") == "multi: on" and shell.multiline
    assert shell.handle(".multi off") == "multi: off" and not shell.multiline
    assert shell.handle(".autocomplete off") == "autocomplete: off"
    assert shell.complete("lo") == []  # disabled
    assert shell.handle(".autocomplete on") == "autocomplete: on"
    assert shell.handle(".headers off") == "headers: off" and not shell.header


def test_shell_completion_tables_columns_metaqueries(shell):
    assert shell.complete(".out") == [".output"]
    assert "logs" in shell.complete("lo")
    assert "lvl" in shell.complete("lv")
    assert "tp_timestamp" in shell.complete("tp_")


def test_shell_history_persists(shell, spark, workspace):
    shell.handle("select 1")
    shell.handle(".tables")
    assert shell.history[-2:] == ["select 1", ".tables"]
    reopened = Shell(spark, workspace)
    assert reopened.history[-2:] == ["select 1", ".tables"]


def test_shell_line_output(shell):
    assert shell.handle(".output line") == "output format: line"
    out = shell.handle("select id, lvl from logs order by id limit 2")
    blocks = out.split("\n\n")
    assert len(blocks) == 2
    assert blocks[0].splitlines()[0].startswith("id ") and "= 0" in blocks[0]
    assert "lvl" in blocks[0]
