"""Config file loading: HCL (.tpc/.hcl — the reference's native format)
and the JSON mirror, for a file or a config directory.

Block → dataclass mapping follows the reference's schema
(internal/config/partition.go:31-78, table.go, format.go,
internal/parse/load_config.go): ``format`` blocks register presets,
``table`` blocks carry ``column`` sub-blocks, ``partition`` blocks carry
an optional ``source`` sub-block whose ``format`` attribute may
reference a preset (``format.<type>.<name>``).

A config DIRECTORY is loaded in two phases like the reference: every
file is parsed first, all ``format`` blocks register, and only then are
tables/partitions built — so cross-file references never depend on
filename order.
"""

from __future__ import annotations

import json
import os
import re

from tailpipe_spark.config import (
    ColumnConfig,
    ConfigValidationError,
    FormatConfig,
    PartitionConfig,
    SourceConfig,
    TableConfig,
    register_format_preset,
    resolve_format,
)
from tailpipe_spark.hcl import HclBlock, HclRef, parse_hcl


def _resolve_format_value(v) -> FormatConfig | None:
    if v is None:
        return None
    if isinstance(v, HclRef):
        if v.path[0] != "format" or len(v.path) != 3:
            raise ConfigValidationError(f"unknown format reference {v}")
        return resolve_format(f"{v.path[1]}.{v.path[2]}")
    if isinstance(v, str):
        return resolve_format(v)
    raise ConfigValidationError(f"bad format value {v!r}")


def _check_attrs(kind: str, label: str, attrs: dict, allowed: set[str]) -> None:
    bad = set(attrs) - allowed
    if bad:
        raise ConfigValidationError(
            f"{kind} {label!r}: unknown attribute(s) {sorted(bad)} "
            f"(allowed: {sorted(allowed)})"
        )


def _column_from_block(b: HclBlock) -> ColumnConfig:
    if len(b.labels) != 1:
        raise ConfigValidationError("column block needs exactly one label")
    _check_attrs(
        "column", b.labels[0], b.attrs,
        {"type", "source", "transform", "required", "null_if", "description"},
    )
    return ColumnConfig(name=b.labels[0], **b.attrs)


def _table_from_block(b: HclBlock) -> tuple[TableConfig, FormatConfig | None]:
    if len(b.labels) != 1:
        raise ConfigValidationError("table block needs exactly one label")
    _check_attrs(
        "table", b.labels[0], b.attrs,
        {"format", "null_if", "map_fields", "bucket_by", "num_buckets"},
    )
    fmt = _resolve_format_value(b.attrs.get("format"))
    cols = [_column_from_block(c) for c in b.find("column")]
    kwargs = {}
    if "null_if" in b.attrs:
        kwargs["null_if"] = b.attrs["null_if"]
    if "bucket_by" in b.attrs:
        v = b.attrs["bucket_by"]
        kwargs["bucket_by"] = [v] if isinstance(v, str) else list(v)
    if "num_buckets" in b.attrs:
        kwargs["num_buckets"] = int(b.attrs["num_buckets"])
    if "map_fields" in b.attrs:
        kwargs["map_fields"] = list(b.attrs["map_fields"])
    elif cols:
        # a table with declared columns maps nothing implicitly — the
        # reference's table block is a full schema declaration
        kwargs["map_fields"] = []
    return TableConfig(name=b.labels[0], columns=cols, **kwargs), fmt


def _source_from_block(b: HclBlock, default_format: FormatConfig | None) -> SourceConfig:
    src_type = b.labels[0] if b.labels else "file"
    if src_type not in ("file",):
        raise ConfigValidationError(
            f"unsupported source type {src_type!r} (plugin sources are "
            "format readers here; use source \"file\" with a format)"
        )
    _check_attrs("source", src_type, b.attrs, {"format", "paths", "file_layout"})
    fmt = _resolve_format_value(b.attrs.get("format")) or default_format
    paths = b.attrs.get("paths")
    if not paths:
        raise ConfigValidationError("source block needs paths = [...]")
    options = {
        k: v for ob in b.find("options") for k, v in ob.attrs.items()
    } or None
    return SourceConfig(
        paths=list(paths),
        file_layout=b.attrs.get("file_layout"),
        format=fmt,
        options=options,
    )


_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_FORMAT_ATTRS = {"delimiter", "header", "pattern"}


def _check_name(kind: str, name: str) -> str:
    """Block labels must be bare identifiers (reference rejects e.g.
    'verify partition with invalid table name format' —
    partition_tests.bats)."""
    if not _NAME_RE.match(name):
        raise ConfigValidationError(f"invalid {kind} name {name!r}")
    return name


def _build_from_roots(roots: list[HclBlock]) -> dict:
    """Two-phase build over already-parsed HCL roots: formats first
    (registered globally), then tables, then partitions — references
    resolve regardless of which file a block lives in."""
    formats: dict[str, FormatConfig] = {}
    for root in roots:
        for fb in root.find("format"):
            if len(fb.labels) != 2:
                raise ConfigValidationError("format block needs type and name labels")
            ftype, fname = fb.labels
            _check_attrs("format", f"{ftype}.{fname}", fb.attrs, _FORMAT_ATTRS)
            if f"{ftype}.{fname}" in formats:
                raise ConfigValidationError(f"duplicate format {ftype}.{fname}")
            fmt = FormatConfig(type=ftype, name=fname, **fb.attrs)
            register_format_preset(f"{ftype}.{fname}", fmt)
            formats[f"{ftype}.{fname}"] = fmt

    tables: dict[str, TableConfig] = {}
    table_formats: dict[str, FormatConfig | None] = {}
    for root in roots:
        for tb in root.find("table"):
            tcfg, tfmt = _table_from_block(tb)
            _check_name("table", tcfg.name)
            if tcfg.name in tables:
                raise ConfigValidationError(f"duplicate table {tcfg.name!r}")
            tables[tcfg.name] = tcfg
            table_formats[tcfg.name] = tfmt

    partitions: list[PartitionConfig] = []
    seen_parts: set[str] = set()
    for root in roots:
        for pb in root.find("partition"):
            if len(pb.labels) != 2:
                raise ConfigValidationError(
                    "partition block needs table and name labels"
                )
            table, name = pb.labels
            _check_name("table", table)
            _check_name("partition", name)
            if f"{table}.{name}" in seen_parts:
                raise ConfigValidationError(f"duplicate partition {table}.{name}")
            seen_parts.add(f"{table}.{name}")
            srcs = pb.find("source")
            src = (
                _source_from_block(srcs[0], table_formats.get(table))
                if srcs
                else None
            )
            partitions.append(
                PartitionConfig(
                    table=table,
                    name=name,
                    source=src,
                    filter=pb.attrs.get("filter"),
                    tp_index=pb.attrs.get("tp_index"),
                )
            )
    return {"tables": tables, "partitions": partitions, "formats": formats}


def load_hcl_text(text: str) -> dict:
    """Parse HCL config text → {'tables', 'partitions', 'formats'}."""
    return _build_from_roots([parse_hcl(text)])


def load_json_text(text: str) -> dict:
    raw = json.loads(text)
    tables = {}
    for t in raw.get("tables", []):
        cols = [ColumnConfig(**c) for c in t.pop("columns", [])]
        tables[t["name"]] = TableConfig(columns=cols, **t)
    partitions = []
    for p in raw.get("partitions", []):
        src = p.pop("source", None)
        if src:
            fmt = src.pop("format", None)
            if isinstance(fmt, dict):
                fmt = FormatConfig(**fmt)
            elif isinstance(fmt, str):  # "type.preset" ref, incl. plugin presets
                fmt = resolve_format(fmt)
            src = SourceConfig(format=fmt, **src)
        partitions.append(PartitionConfig(source=src, **p))
    return {"tables": tables, "partitions": partitions, "formats": {}}


def load_config(path: str) -> dict:
    """Load one config file or every ``*.tpc``/``*.hcl``/``*.json`` in a
    directory (the reference loads the whole config dir before
    resolving references — internal/parse/load_config.go)."""
    if os.path.isdir(path):
        roots: list[HclBlock] = []
        merged = {"tables": {}, "partitions": [], "formats": {}}
        for name in sorted(os.listdir(path)):
            full = os.path.join(path, name)
            if name.endswith(".json"):
                part = load_config(full)
                dup_t = set(part["tables"]) & set(merged["tables"])
                if dup_t:
                    raise ConfigValidationError(
                        f"duplicate table(s) across config files: {sorted(dup_t)}"
                    )
                seen_p = {p.qualified_name for p in merged["partitions"]}
                dup_p = seen_p & {p.qualified_name for p in part["partitions"]}
                if dup_p:
                    raise ConfigValidationError(
                        f"duplicate partition(s) across config files: {sorted(dup_p)}"
                    )
                merged["tables"].update(part["tables"])
                merged["partitions"].extend(part["partitions"])
            elif name.endswith((".tpc", ".hcl")):
                with open(full) as f:
                    roots.append(parse_hcl(f.read()))
        built = _build_from_roots(roots)
        dup_t = set(built["tables"]) & set(merged["tables"])
        if dup_t:
            raise ConfigValidationError(
                f"duplicate table(s) across config files: {sorted(dup_t)}"
            )
        have = {p.qualified_name for p in merged["partitions"]}
        dup_p = have & {p.qualified_name for p in built["partitions"]}
        if dup_p:
            raise ConfigValidationError(
                f"duplicate partition(s) across config files: {sorted(dup_p)}"
            )
        merged["tables"].update(built["tables"])
        merged["partitions"].extend(built["partitions"])
        merged["formats"].update(built["formats"])
        return merged
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        return load_json_text(text)
    return load_hcl_text(text)
