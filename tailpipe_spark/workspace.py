"""Workspace profiles and setting precedence.

The reference resolves engine settings through named ``workspace``
blocks in the install-dir config plus env vars and flags
(reference: internal/cmdconfig/cmd_hooks.go:185-200,
tests/acceptance/test_files/config_precedence.bats and its
workspaces.tpc / workspace_tests.json fixtures). Precedence there,
lowest to highest:

    baked defaults
    < "default" workspace profile
    < environment variables
    < explicitly selected workspace profile
    < command-line flags

and the profile itself is selected by ``--workspace`` flag over the
``TAILPIPE_WORKSPACE`` env var over the profile named ``default``.
This module reproduces that resolution for the Spark engine: profiles
live in ``workspace "<name>" { ... }`` HCL blocks in any ``*.tpc`` /
``*.hcl`` file under a config directory; env vars use the
``TAILPIPE_SPARK_`` prefix. Settings map to their Spark-native
meanings (``memory_max_mb`` → driver memory, ``log_level`` → Spark
log level); reference-only knobs (``update_check``,
``plugin_memory_max_mb``, ``temp_dir_max_mb``) are accepted and
surfaced so shared configs parse cleanly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from tailpipe_spark.config import ConfigValidationError
from tailpipe_spark.hcl import parse_hcl

#: setting name → (env var, baked default)
SETTINGS: dict[str, tuple[str, object]] = {
    "workspace_dir": ("TAILPIPE_SPARK_WORKSPACE", "./workspace"),
    "log_level": ("TAILPIPE_SPARK_LOG_LEVEL", "warn"),
    "update_check": ("TAILPIPE_SPARK_UPDATE_CHECK", True),
    "memory_max_mb": ("TAILPIPE_SPARK_MEMORY_MAX_MB", None),
    "plugin_memory_max_mb": ("TAILPIPE_SPARK_PLUGIN_MEMORY_MAX_MB", None),
    "temp_dir_max_mb": ("TAILPIPE_SPARK_TEMP_DIR_MAX_MB", None),
}

PROFILE_ENV = "TAILPIPE_SPARK_PROFILE"  # reference: TAILPIPE_WORKSPACE
CONFIG_DIR_ENV = "TAILPIPE_SPARK_CONFIG_DIR"


@dataclass
class WorkspaceProfile:
    name: str
    settings: dict[str, object] = field(default_factory=dict)


def _coerce(name: str, value: object) -> object:
    default = SETTINGS[name][1]
    if isinstance(value, str):
        if isinstance(default, bool) or name == "update_check":
            return value.strip().lower() in ("true", "1", "yes", "on")
        if name.endswith("_mb"):
            try:
                return int(value)
            except ValueError as exc:
                raise ConfigValidationError(
                    f"workspace setting {name}: expected integer, got {value!r}"
                ) from exc
    return value


def load_profiles(config_dir: str | None) -> dict[str, WorkspaceProfile]:
    """Parse every ``workspace`` block under ``config_dir``."""
    profiles: dict[str, WorkspaceProfile] = {}
    if not config_dir or not os.path.isdir(config_dir):
        return profiles
    for fname in sorted(os.listdir(config_dir)):
        if not fname.endswith((".tpc", ".hcl")):
            continue
        with open(os.path.join(config_dir, fname)) as f:
            root = parse_hcl(f.read())
        for wb in root.find("workspace"):
            if len(wb.labels) != 1:
                raise ConfigValidationError("workspace block needs exactly one label")
            name = wb.labels[0]
            if name in profiles:
                raise ConfigValidationError(f"duplicate workspace profile {name!r}")
            bad = set(wb.attrs) - set(SETTINGS)
            if bad:
                raise ConfigValidationError(
                    f"workspace {name!r}: unknown setting(s) {sorted(bad)}"
                )
            profiles[name] = WorkspaceProfile(
                name, {k: _coerce(k, v) for k, v in wb.attrs.items()}
            )
    return profiles


def resolve_settings(
    flags: dict[str, object] | None = None,
    profile: str | None = None,
    config_dir: str | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, object]:
    """Resolve every setting through the reference's precedence chain.

    ``flags`` holds explicitly-passed command-line values (absent keys
    mean "flag not given"). Returns the full setting map plus
    ``profile`` (the selected profile name) for diagnostics — the
    shape the reference dumps under TAILPIPE_CONFIG_DUMP.
    """
    env = os.environ if env is None else env
    flags = flags or {}
    config_dir = config_dir or env.get(CONFIG_DIR_ENV)
    profiles = load_profiles(config_dir)

    profile_name = profile or env.get(PROFILE_ENV) or "default"
    if profile and profile not in profiles:
        raise ConfigValidationError(f"workspace profile {profile!r} not found")
    explicit = profiles.get(profile_name, WorkspaceProfile(profile_name)).settings
    default = profiles.get("default", WorkspaceProfile("default")).settings

    out: dict[str, object] = {"profile": profile_name}
    for name, (env_var, baked) in SETTINGS.items():
        if name in flags and flags[name] is not None:
            out[name] = flags[name]
        elif profile_name != "default" and name in explicit:
            out[name] = explicit[name]
        elif env_var in env:
            out[name] = _coerce(name, env[env_var])
        elif name in default:
            out[name] = default[name]
        else:
            out[name] = baked
    return out
