"""Workspace-profile precedence, mirroring the reference's acceptance
matrix (tests/acceptance/test_files/config_precedence.bats driving
test_data/source_files/config_tests/workspaces.tpc +
workspace_tests.json)."""

from __future__ import annotations

import json

import pytest

from tailpipe_spark.config import ConfigValidationError
from tailpipe_spark.workspace import load_profiles, resolve_settings

# the reference fixture's two profiles, plus a default one to exercise
# the default-profile tier of the chain
WORKSPACES_TPC = """
workspace "default" {
  log_level     = "info"
  memory_max_mb = 2048
}

workspace "workspace_profiles" {
  log_level     = "trace"
  update_check  = false
  memory_max_mb = 1024
  plugin_memory_max_mb = 512
  temp_dir_max_mb = 1024
}

workspace "development" {
  log_level     = "warn"
  update_check  = false
  memory_max_mb = 512
  plugin_memory_max_mb = 206
  temp_dir_max_mb = 512
}
"""


@pytest.fixture()
def config_dir(tmp_path):
    (tmp_path / "workspaces.tpc").write_text(WORKSPACES_TPC)
    return str(tmp_path)


def test_profiles_parse(config_dir):
    profiles = load_profiles(config_dir)
    assert set(profiles) == {"default", "workspace_profiles", "development"}
    assert profiles["development"].settings["memory_max_mb"] == 512
    assert profiles["workspace_profiles"].settings["update_check"] is False


def test_env_beats_default_profile(config_dir):
    # bats: "env variables set, no command line arguments set and no
    # workspace env variable set"
    s = resolve_settings(
        config_dir=config_dir,
        env={"TAILPIPE_SPARK_MEMORY_MAX_MB": "16384",
             "TAILPIPE_SPARK_UPDATE_CHECK": "false"},
    )
    assert s["profile"] == "default"
    assert s["memory_max_mb"] == 16384          # env > default profile
    assert s["update_check"] is False
    assert s["log_level"] == "info"             # default profile > baked


def test_explicit_profile_flag(config_dir):
    # bats: "only command line arguments set and no env variables set"
    s = resolve_settings(profile="workspace_profiles", config_dir=config_dir, env={})
    assert s["memory_max_mb"] == 1024 and s["log_level"] == "trace"


def test_profile_env_var_selects(config_dir):
    # bats: "workspace env variable set and no command line arguments"
    s = resolve_settings(
        config_dir=config_dir, env={"TAILPIPE_SPARK_PROFILE": "workspace_profiles"}
    )
    assert s["profile"] == "workspace_profiles" and s["memory_max_mb"] == 1024


def test_explicit_profile_beats_env_settings(config_dir):
    # bats: "All env variables set and command line argument set"
    s = resolve_settings(
        profile="workspace_profiles",
        config_dir=config_dir,
        env={"TAILPIPE_SPARK_PROFILE": "development",
             "TAILPIPE_SPARK_LOG_LEVEL": "debug",
             "TAILPIPE_SPARK_MEMORY_MAX_MB": "16384",
             "TAILPIPE_SPARK_TEMP_DIR_MAX_MB": "8192"},
    )
    # the flag-selected profile wins selection AND its settings beat env
    assert s["profile"] == "workspace_profiles"
    assert s["memory_max_mb"] == 1024
    assert s["log_level"] == "trace"


def test_profile_env_settings_beat_plain_env(config_dir):
    # bats: "all env variables set including workspace env variable"
    s = resolve_settings(
        config_dir=config_dir,
        env={"TAILPIPE_SPARK_PROFILE": "development",
             "TAILPIPE_SPARK_LOG_LEVEL": "debug",
             "TAILPIPE_SPARK_MEMORY_MAX_MB": "16384"},
    )
    assert s["profile"] == "development"
    assert s["memory_max_mb"] == 512 and s["log_level"] == "warn"


def test_flag_beats_everything(config_dir):
    s = resolve_settings(
        flags={"workspace_dir": "/explicit/ws"},
        profile="development",
        config_dir=config_dir,
        env={"TAILPIPE_SPARK_WORKSPACE": "/env/ws"},
    )
    assert s["workspace_dir"] == "/explicit/ws"


def test_unknown_profile_and_settings_rejected(config_dir, tmp_path):
    with pytest.raises(ConfigValidationError, match="not found"):
        resolve_settings(profile="nope", config_dir=config_dir, env={})
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "w.tpc").write_text('workspace "x" { not_a_setting = 1 }')
    with pytest.raises(ConfigValidationError, match="unknown setting"):
        load_profiles(str(bad))


def test_cli_config_dump_handshake(config_dir, tmp_path, capsys, monkeypatch):
    """The acceptance tests read the resolved config by running a verb
    under the dump env var (config_precedence.bats drives
    TAILPIPE_CONFIG_DUMP the same way)."""
    from tailpipe_spark.cli import main

    monkeypatch.setenv("TAILPIPE_SPARK_CONFIG_DUMP", "config_json")
    monkeypatch.setenv("TAILPIPE_SPARK_MEMORY_MAX_MB", "16384")
    rc = main([
        "--profile", "development", "--config-dir", config_dir,
        "query", "select 1",
    ])
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["profile"] == "development"
    assert cfg["memory_max_mb"] == 512
    assert cfg["workspace_dir"] == "./workspace"
