import json

import pytest

from tailpipe_spark.cli import main, render


@pytest.fixture()
def populated_workspace(spark, workspace, tmp_path):
    from tailpipe_spark.collect import collect
    from tailpipe_spark.config import ColumnConfig, PartitionConfig, TableConfig
    from tailpipe_spark.sources.formats import read_jsonl

    rows = [
        {"server_id": f"srv-{i % 2}", "cpu": float(i), "time": f"2024-05-0{i+1}T00:00:00"}
        for i in range(4)
    ]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    table = TableConfig(
        name="server_metrics",
        columns=[
            ColumnConfig(name="server_id", type="varchar"),
            ColumnConfig(name="cpu", type="double"),
            ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
        ],
        map_fields=[],
    )
    collect(spark, workspace, table, PartitionConfig("server_metrics", "default"),
            source_df=read_jsonl(spark, [str(p)]))
    return workspace


def test_cli_query_csv(populated_workspace, capsys):
    rc = main([
        "--workspace", populated_workspace.workspace,
        "query",
        "select server_id, count(*) as n from server_metrics group by server_id order by server_id",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["server_id,n", "srv-0,2", "srv-1,2"]


def test_cli_query_from_filter(populated_workspace, capsys):
    rc = main([
        "--workspace", populated_workspace.workspace,
        "query", "select count(*) as n from server_metrics",
        "--from", "2024-05-03T00:00:00",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "2"


def test_cli_query_missing_table(populated_workspace, capsys):
    rc = main([
        "--workspace", populated_workspace.workspace,
        "query", "select * from nope",
    ])
    assert rc == 1
    assert "no data has been collected" in capsys.readouterr().err


def test_cli_list_tables(populated_workspace, capsys):
    rc = main(["--workspace", populated_workspace.workspace, "list", "tables"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data[0]["table"] == "server_metrics"
    assert data[0]["rows"] == 4


def test_cli_connect_emits_bootstrap(populated_workspace, capsys, tmp_path):
    rc = main([
        "--workspace", populated_workspace.workspace,
        "connect", "--dialect", "pyspark", "--out-dir", str(tmp_path / "init"),
    ])
    assert rc == 0
    path = capsys.readouterr().out.strip()
    src = open(path).read()
    assert "register_views" in src and populated_workspace.workspace in src


def test_cli_connect_sql_script_runs_in_sql_session(
    populated_workspace, spark, capsys, tmp_path
):
    """The default (SQL) init script must be executable by a plain SQL
    client — spark-sql -i equivalent: run each statement via spark.sql
    and query the view it registered (reference: cmd/connect.go:94-172)."""
    rc = main([
        "--workspace", populated_workspace.workspace,
        "connect", "--from", "2024-05-02T00:00:00",
        "--out-dir", str(tmp_path / "init"),
    ])
    assert rc == 0
    path = capsys.readouterr().out.strip()
    assert path.endswith(".sql")
    src = open(path).read()
    for chunk in src.split(";"):
        stmt = "\n".join(
            l for l in chunk.splitlines() if not l.strip().startswith("--")
        ).strip()
        if stmt:
            spark.sql(stmt)
    rows = spark.sql(
        "select server_id, cpu from server_metrics order by cpu"
    ).collect()
    # --from dropped the 2024-05-01 row; layout cols are hidden
    assert [r["cpu"] for r in rows] == [1.0, 2.0, 3.0]
    assert "tp_year" not in spark.table("server_metrics").columns
    # the implied partition bound is baked in for external pruning
    assert "tp_year * 12" in src


def test_cli_connect_json_envelope(populated_workspace, capsys, tmp_path):
    rc = main([
        "--workspace", populated_workspace.workspace,
        "connect", "--output", "json", "--out-dir", str(tmp_path / "init"),
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert res["init_script_path"].endswith(".sql")
    assert "error" not in res


def test_render_formats(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "name"])
    csv = render(df.orderBy("id"), "csv")
    assert csv.splitlines()[0] == "id,name"
    assert csv.splitlines()[2] == "2,"
    js = json.loads(render(df.orderBy("id"), "json"))
    assert js[1]["name"] is None
    tbl = render(df.orderBy("id"), "table")
    assert "id" in tbl.splitlines()[0]


def test_cli_collect_with_config(spark, tmp_path, capsys):
    # end-to-end through the config file path
    rows = [{"id": i, "time": "2024-05-01T00:00:00"} for i in range(6)]
    data = tmp_path / "in.jsonl"
    data.write_text("\n".join(json.dumps(r) for r in rows))
    cfg = {
        "tables": [
            {
                "name": "t",
                "map_fields": [],
                "columns": [
                    {"name": "id", "type": "bigint"},
                    {"name": "tp_timestamp", "type": "timestamp", "source": "time"},
                ],
            }
        ],
        "partitions": [
            {
                "table": "t",
                "name": "evens",
                "filter": "id % 2 = 0",
                "source": {
                    "paths": [str(data)],
                    "format": {"type": "jsonl"},
                },
            }
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    ws = tmp_path / "ws"
    rc = main([
        "--workspace", str(ws),
        "collect", "t.evens", "--config", str(cfg_path), "--no-compact",
    ])
    assert rc == 0
    assert "collected t.evens: 3 rows" in capsys.readouterr().out


def test_render_streams_without_collect(spark, monkeypatch):
    """A huge result must flow through toLocalIterator pages, never a
    full driver-side collect (reference A32 streams row-by-row)."""
    from pyspark.sql import DataFrame

    from tailpipe_spark.cli import render_stream

    df = spark.range(0, 5000).selectExpr("id", "id * 2 as dbl")
    monkeypatch.setattr(
        DataFrame, "collect",
        lambda self: (_ for _ in ()).throw(AssertionError("collect() called")),
    )
    chunks = list(render_stream(df, "csv", page_size=500))
    # header + ceil(5000/500) pages — page size respected
    assert len(chunks) == 1 + 10
    assert chunks[0] == "id,dbl"
    assert all(len(c.split("\n")) == 500 for c in chunks[1:])
    rows = [line for c in chunks[1:] for line in c.split("\n")]
    assert len(rows) == 5000 and rows[0] == "0,0"


def test_render_stream_lazy_first_page(spark):
    """The first page is available without draining the iterator."""
    from tailpipe_spark.cli import render_stream

    df = spark.range(0, 100000).selectExpr("id")
    gen = render_stream(df, "table", page_size=100)
    header = next(gen)
    rule = next(gen)
    first = next(gen)
    assert header.strip() == "id" and set(rule) <= {"-", "+"}
    assert first.strip() == "0"
    gen.close()


def test_cli_query_no_sql_opens_shell(populated_workspace, capsys, monkeypatch):
    """`query` with no SQL drops into the interactive shell (reference:
    cmd/query.go:100-104) and the REPL survives prompt → statement →
    `.timing` → Ctrl-C, exiting cleanly on `.exit`."""
    feed = iter(
        [
            "select 17 as seventeen;",
            ".timing on",
            KeyboardInterrupt,  # Ctrl-C at the prompt: buffer reset, shell lives
            "select 21 as twentyone;",
            ".exit",
        ]
    )

    def fake_input(prompt=""):
        item = next(feed)
        if item is KeyboardInterrupt:
            raise KeyboardInterrupt
        return item

    monkeypatch.setattr("builtins.input", fake_input)
    rc = main(["--workspace", populated_workspace.workspace, "query"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "17" in out
    assert "21" in out
    assert "Time:" in out  # .timing on applied to the post-interrupt query


def test_cli_connect_filter_rejects_statements(populated_workspace, capsys, tmp_path):
    """connect --filter runs through the same lexical guard as partition
    filters (reference: internal/config/partition.go:139-186)."""
    rc = main([
        "--workspace", populated_workspace.workspace,
        "connect", "--filter", "1=1; drop table server_metrics",
        "--out-dir", str(tmp_path / "conn"),
    ])
    err = capsys.readouterr().err
    assert rc == 1
    assert "only plain expressions" in err
    # a plain predicate still passes
    rc = main([
        "--workspace", populated_workspace.workspace,
        "connect", "--filter", "tp_index = 'web-01'",
        "--out-dir", str(tmp_path / "conn"),
    ])
    assert rc == 0


def test_cli_compact_zorder(populated_workspace, capsys):
    rc = main([
        "--workspace", populated_workspace.workspace,
        "compact", "server_metrics", "--zorder", "tp_timestamp,cpu",
    ])
    assert rc == 0
    assert "compacted server_metrics" in capsys.readouterr().out
    # table still queryable and complete after the z-order rewrite
    rc = main([
        "--workspace", populated_workspace.workspace,
        "query", "select count(*) as n from server_metrics",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "4"


def test_connect_duckdb_dialect_executes(populated_workspace, tmp_path, capsys):
    """The duckdb-dialect init script must be directly sourceable by
    DuckDB and expose the same filtered view surface (the reference's
    own connect contract)."""
    import duckdb

    from tailpipe_spark.connect import write_init_script

    path = write_init_script(
        populated_workspace, str(tmp_path), dialect="duckdb",
        time_from="2024-05-02T00:00:00",
    )
    con = duckdb.connect()
    con.execute(open(path).read())
    rows = con.execute(
        "SELECT server_id, cpu FROM server_metrics ORDER BY cpu"
    ).fetchall()
    # --from drops the 2024-05-01 row, keeps the other three
    assert [r[0] for r in rows] == ["srv-1", "srv-0", "srv-1"]
    cols = [d[0] for d in con.execute("SELECT * FROM server_metrics").description]
    assert "tp_year" not in cols and "tp_month" not in cols
