"""Entry-point plugin discovery (reference: the plugin ecosystem —
internal/plugin/plugin_manager.go:74-164, cmd/plugin.go — re-expressed
as Python packaging entry points in group ``tailpipe_spark.plugins``).

The fixture fabricates an installed distribution the stdlib way: a
module plus a ``*.dist-info`` directory with ``entry_points.txt`` on
``sys.path`` is exactly what pip leaves behind, and is all
``importlib.metadata`` needs — no actual pip run.
"""

from __future__ import annotations

import json
import sys

import pytest

from tailpipe_spark import plugins
from tailpipe_spark.cli import main

PLUGIN_MODULE = '''
from tailpipe_spark.config import ColumnConfig, FormatConfig, TableConfig


def register(api):
    api.add_format_preset(
        "jsonl.demo_logs", FormatConfig(type="jsonl", name="demo_logs")
    )
    api.add_table(
        TableConfig(
            name="demo_logs",
            map_fields=[],
            columns=[
                ColumnConfig(name="id", type="bigint"),
                ColumnConfig(name="tp_timestamp", type="timestamp", source="time"),
                ColumnConfig(name="level", type="varchar"),
            ],
        )
    )


def register_broken(api):
    raise RuntimeError("intentionally broken plugin")
'''


@pytest.fixture()
def demo_plugin(tmp_path):
    """Install a fake plugin distribution onto sys.path, yield, clean up."""
    site = tmp_path / "site"
    site.mkdir()
    (site / "tailpipe_demo_plugin.py").write_text(PLUGIN_MODULE)
    dist = site / "tailpipe_demo_plugin-0.3.dist-info"
    dist.mkdir()
    (dist / "METADATA").write_text(
        "Metadata-Version: 2.1\nName: tailpipe-demo-plugin\nVersion: 0.3\n"
    )
    (dist / "entry_points.txt").write_text(
        "[tailpipe_spark.plugins]\n"
        "demo = tailpipe_demo_plugin:register\n"
        "broken = tailpipe_demo_plugin:register_broken\n"
    )
    sys.path.insert(0, str(site))
    try:
        yield plugins.load_all(refresh=True)
    finally:
        sys.path.remove(str(site))
        sys.modules.pop("tailpipe_demo_plugin", None)
        plugins.PLUGIN_TABLES.pop("demo_logs", None)
        plugins.load_all(refresh=True)


def test_discovery_registers_and_contains_errors(demo_plugin):
    by_name = {p.name: p for p in demo_plugin}
    demo = by_name["demo"]
    assert demo.dist == "tailpipe-demo-plugin"
    assert demo.version == "0.3"
    assert demo.formats == ["jsonl.demo_logs"]
    assert demo.tables == ["demo_logs"]
    assert demo.error is None
    # a raising plugin is reported, not fatal, and didn't block 'demo'
    assert "intentionally broken" in by_name["broken"].error

    from tailpipe_spark.config import resolve_format

    assert resolve_format("jsonl.demo_logs").type == "jsonl"
    assert plugins.plugin_table("demo_logs").name == "demo_logs"


def test_plugin_cli_verbs(demo_plugin, tmp_path, capsys):
    assert main(["--workspace", str(tmp_path / "ws"), "plugin", "list"]) == 0
    listed = {p["name"]: p for p in json.loads(capsys.readouterr().out)}
    assert listed["demo"]["formats"] == ["jsonl.demo_logs"]
    assert listed["broken"]["error"]

    assert main(["--workspace", str(tmp_path / "ws"), "plugin", "show", "demo"]) == 0
    assert json.loads(capsys.readouterr().out)["tables"] == ["demo_logs"]

    # `list formats` surfaces the plugin preset alongside builtins
    cfg = tmp_path / "empty.json"
    cfg.write_text("{}")
    assert main(
        ["--workspace", str(tmp_path / "ws"), "list", "formats", "--config", str(cfg)]
    ) == 0
    assert "jsonl.demo_logs" in json.loads(capsys.readouterr().out)


def test_plugin_table_collects_end_to_end(demo_plugin, spark, tmp_path, capsys):
    """A partition referencing a plugin-defined table (no local table
    block) collects through the full CLI path using the plugin's schema
    — the reference's plugin-defined-table flow."""
    rows = [
        {"id": i, "time": "2024-05-01T00:00:00", "level": "info" if i % 2 else "warn"}
        for i in range(4)
    ]
    data = tmp_path / "in.jsonl"
    data.write_text("\n".join(json.dumps(r) for r in rows))
    cfg = {
        "partitions": [
            {
                "table": "demo_logs",
                "name": "prod",
                "source": {"paths": [str(data)], "format": "jsonl.demo_logs"},
            }
        ]
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    ws = tmp_path / "ws"
    rc = main(
        ["--workspace", str(ws), "collect", "demo_logs.prod",
         "--config", str(cfg_path), "--no-compact"]
    )
    assert rc == 0
    assert "collected demo_logs.prod: 4 rows" in capsys.readouterr().out

    from tailpipe_spark.catalog import Catalog

    cat = Catalog(str(ws))
    cat.register_views(spark)
    got = spark.sql(
        "select id, level from demo_logs order by id"
    ).collect()
    # the plugin schema mapped 'time'→tp_timestamp and typed the columns
    assert [(r["id"], r["level"]) for r in got] == [
        (0, "warn"), (1, "info"), (2, "warn"), (3, "info")
    ]


WHEEL_MODULE = '''
from tailpipe_spark.config import FormatConfig


def register(api):
    api.add_format_preset(
        "jsonl.wheel_demo", FormatConfig(type="jsonl", name="wheel_demo")
    )
'''


def _build_wheel(tmp_path, version: str = "0.1") -> str:
    """Hand-assemble a minimal wheel (a wheel is a zip with dist-info)."""
    import base64
    import hashlib
    import zipfile

    name = f"tp_wheel_plugin-{version}-py3-none-any.whl"
    info = f"tp_wheel_plugin-{version}.dist-info"
    files = {
        "tp_wheel_plugin.py": WHEEL_MODULE,
        f"{info}/METADATA": (
            f"Metadata-Version: 2.1\nName: tp-wheel-plugin\nVersion: {version}\n"
        ),
        f"{info}/WHEEL": (
            "Wheel-Version: 1.0\nGenerator: test\nRoot-Is-Purelib: true\n"
            "Tag: py3-none-any\n"
        ),
        f"{info}/entry_points.txt": (
            "[tailpipe_spark.plugins]\nwheel_demo = tp_wheel_plugin:register\n"
        ),
    }
    record = f"{info}/RECORD"
    lines = []
    for path, content in files.items():
        digest = base64.urlsafe_b64encode(
            hashlib.sha256(content.encode()).digest()
        ).rstrip(b"=").decode()
        lines.append(f"{path},sha256={digest},{len(content.encode())}")
    lines.append(f"{record},,")
    files[record] = "\n".join(lines) + "\n"
    whl = tmp_path / name
    with zipfile.ZipFile(whl, "w") as z:
        for path, content in files.items():
            z.writestr(path, content)
    return str(whl)


def test_parse_plugin_ref():
    """Reference ref syntax `[registry/org/]name[@version]` → pip spec
    (reference: cmd/plugin.go:78-98)."""
    from tailpipe_spark.cli import _parse_plugin_ref

    assert _parse_plugin_ref("mypkg") == ("mypkg", "mypkg")
    assert _parse_plugin_ref("mypkg@1.2.0") == ("mypkg", "mypkg==1.2.0")
    assert _parse_plugin_ref("hub.example.com/org/mypkg@2.0") == (
        "mypkg", "mypkg==2.0"
    )
    assert _parse_plugin_ref("org/mypkg") == ("mypkg", "mypkg")
    dist, spec = _parse_plugin_ref("./dist/tp_wheel_plugin-0.1-py3-none-any.whl")
    assert dist is None and spec.endswith(".whl")


def test_plugin_install_update_uninstall_roundtrip(tmp_path, capsys):
    """`plugin install name@version` pins through pip, `update --all`
    upgrades every installed plugin dist, and `uninstall` removes it —
    all against an isolated --target dir + local wheel house so the
    live site-packages and the network are never touched
    (reference: cmd/plugin.go:49-142)."""
    import sys as _sys

    house = tmp_path / "house"
    house.mkdir()
    _build_wheel(house, "0.1")
    _build_wheel(house, "0.2")
    tgt = str(tmp_path / "target")
    ws = str(tmp_path / "ws")
    pip_flags = ["--target", tgt, "--find-links", str(house), "--no-index"]
    try:
        rc = main(["--workspace", ws, "plugin", "install",
                   "tp-wheel-plugin@0.1", *pip_flags])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0
        assert "wheel_demo" in out["plugins_added"]
        assert out["plugins_added"]["wheel_demo"]["formats"] == ["jsonl.wheel_demo"]
        # the @version pin resolved to exactly 0.1, reported for repro
        assert {"distribution": "tp-wheel-plugin", "version": "0.1"} in out[
            "installed_versions"
        ]

        # the contributed preset is live engine surface
        (tmp_path / "empty.tpc").write_text("")
        assert main(["--workspace", ws, "list", "formats",
                     "--config", str(tmp_path / "empty.tpc")]) == 0
        fmts = json.loads(capsys.readouterr().out)
        assert "jsonl.wheel_demo" in fmts

        # update --all walks every installed plugin dist and upgrades
        rc = main(["--workspace", ws, "plugin", "update", "--all", *pip_flags])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0
        assert "tp-wheel-plugin" in out["packages"]
        assert {"distribution": "tp-wheel-plugin", "version": "0.2"} in out[
            "installed_versions"
        ]

        rc = main(["--workspace", ws, "plugin", "uninstall",
                   "tp-wheel-plugin", "--target", tgt])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0
        assert "wheel_demo" in out["plugins_removed"]
    finally:
        if tgt in _sys.path:
            _sys.path.remove(tgt)
        _sys.modules.pop("tp_wheel_plugin", None)
        plugins.load_all(refresh=True)
        plugins.load_all(refresh=True)
