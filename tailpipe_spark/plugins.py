"""Third-party extension discovery via Python entry points.

The reference distributes tables/sources/formats as out-of-process gRPC
plugins installed from an OCI registry (`tailpipe plugin install aws` —
reference: internal/plugin/plugin_manager.go:74-164,
internal/ociinstaller/, cmd/plugin.go). The idiomatic PySpark-native
analog is Python packaging itself: a plugin is any installed
distribution that exposes an entry point in the
``tailpipe_spark.plugins`` group. Installing the package (pip, conda,
a wheel on the cluster's PYTHONPATH) IS the install step; discovery is
``importlib.metadata`` — no registry daemon, no separate process, and
the plugin's DataFrame code runs inside the same Spark session so its
scans get the engine's pushdown/pruning for free.

A plugin's entry point resolves to a callable ``register(api)`` that
receives a :class:`PluginApi` and contributes, in-process:

- format presets   (``api.add_format_preset("grok.myapp", fmt)``)
- table defaults   (``api.add_table(TableConfig(...))``) — consulted
  when a user partition references a table no local config defines,
  exactly the reference's plugin-defined-table flow
- source factories (``api.add_source_type("mysource", factory)``)

Example ``pyproject.toml`` of a plugin package::

    [project.entry-points."tailpipe_spark.plugins"]
    myapp = "tailpipe_myapp:register"

Failures are contained: a plugin that raises during load or register is
reported in ``plugin list`` with its error, never crashes the CLI.
"""

from __future__ import annotations

from dataclasses import dataclass, field

ENTRY_POINT_GROUP = "tailpipe_spark.plugins"

#: plugin-contributed table defaults, keyed by table name
PLUGIN_TABLES: dict[str, object] = {}
#: plugin-contributed source-type factories, keyed by type name
PLUGIN_SOURCE_TYPES: dict[str, object] = {}


@dataclass
class PluginInfo:
    """One discovered entry point and what it contributed."""

    name: str
    dist: str
    version: str
    entry: str
    formats: list[str] = field(default_factory=list)
    tables: list[str] = field(default_factory=list)
    source_types: list[str] = field(default_factory=list)
    error: str | None = None

    def describe(self) -> dict:
        return {
            "name": self.name,
            "distribution": self.dist,
            "version": self.version,
            "entry": self.entry,
            "formats": self.formats,
            "tables": self.tables,
            "source_types": self.source_types,
            "error": self.error,
        }


class PluginApi:
    """The surface handed to a plugin's ``register`` callable."""

    def __init__(self, info: PluginInfo):
        self._info = info

    def add_format_preset(self, name: str, fmt) -> None:
        from tailpipe_spark.config import register_format_preset

        register_format_preset(name, fmt)
        self._info.formats.append(name)

    def add_table(self, table) -> None:
        PLUGIN_TABLES[table.name] = table
        self._info.tables.append(table.name)

    def add_source_type(self, name: str, factory) -> None:
        PLUGIN_SOURCE_TYPES[name] = factory
        self._info.source_types.append(name)


_LOADED: list[PluginInfo] | None = None


def load_all(refresh: bool = False) -> list[PluginInfo]:
    """Discover and register every installed plugin exactly once.

    Idempotent per process (``refresh=True`` rescans — used by tests
    that inject a distribution onto ``sys.path`` mid-run). Errors are
    captured per-plugin; one broken plugin never blocks the rest.
    """
    global _LOADED
    if _LOADED is not None and not refresh:
        return _LOADED

    from importlib import metadata

    found: list[PluginInfo] = []
    try:
        eps = metadata.entry_points(group=ENTRY_POINT_GROUP)
    except Exception:
        eps = []
    for ep in eps:
        dist_name, version = "", ""
        try:
            if ep.dist is not None:
                dist_name = ep.dist.name
                version = ep.dist.version
        except Exception:
            pass
        info = PluginInfo(name=ep.name, dist=dist_name, version=version, entry=ep.value)
        try:
            register = ep.load()
            register(PluginApi(info))
        except Exception as exc:  # noqa: BLE001 — contained by design
            info.error = f"{type(exc).__name__}: {exc}"
        found.append(info)
    _LOADED = found
    return found


def plugin_table(name: str):
    """Table defaults a plugin registered for ``name`` (or None)."""
    return PLUGIN_TABLES.get(name)
