"""Format readers (SURVEY.md §2.c): jsonl / delimited / regex / grok.

Each reader returns a DataFrame whose plan keeps parsing JVM-side:
- jsonl    → ``spark.read.json`` with an explicit schema when declared
             (A1) or inference on the first chunk (A2)
- delimited→ ``spark.read.csv`` with delimiter/header options
- regex    → ``spark.read.text`` + one ``regexp_extract`` per named
             capture group
- grok     → grok→regex compilation (sources.grok), then the regex path

Lines that don't match a regex/grok pattern yield all-NULL extracted
columns and are dropped (the reference's plugins skip unparseable
lines); pass ``keep_unparsed=True`` to keep them for quarantine.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tailpipe_spark.config import FormatConfig
from tailpipe_spark.sources.grok import GROK_TYPE_CASTS, compile_grok

_NAMED_GROUP = re.compile(r"\(\?P?<([A-Za-z][A-Za-z0-9_]*)>")


def read_jsonl(
    spark: SparkSession, paths: list[str], schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(paths)


def read_delimited(
    spark: SparkSession,
    paths: list[str],
    fmt: FormatConfig,
    schema: T.StructType | None = None,
) -> DataFrame:
    reader = (
        spark.read.option("delimiter", fmt.delimiter)
        .option("header", str(fmt.header).lower())
        .option("inferSchema", "false" if schema is not None else "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(paths)


def _java_named_groups(pattern: str) -> tuple[str, dict[str, int]]:
    """Convert ``(?P<name>...)``/``(?<name>...)`` to plain groups and
    return name → group index. Indices count EVERY capturing group (raw
    ``(`` too) and skip escapes/character classes — delegated to
    grok.capture_group_indices so ``[(]`` or an extra bare group can't
    shift the mapping."""
    from tailpipe_spark.sources.grok import capture_group_indices

    names = capture_group_indices(pattern)
    out = re.sub(r"\(\?P?<(?![=!])[^>]+>", "(", pattern)
    return out, names


def read_regex(
    spark: SparkSession,
    paths: list[str],
    fmt: FormatConfig,
    keep_unparsed: bool = False,
) -> DataFrame:
    """Named capture groups → columns (core_formats.bats:148-199)."""
    regex, names = _java_named_groups(fmt.pattern)
    if not names:
        raise ValueError("regex format requires named capture groups")
    lines = spark.read.text(paths)
    cols = [
        F.when(
            F.col("value").rlike(regex),
            F.regexp_extract(F.col("value"), regex, gi),
        ).alias(name)
        for name, gi in names.items()
    ]
    df = lines.select(*cols, F.col("value").alias("_raw"))
    if not keep_unparsed:
        any_ok = None
        for name in names:
            p = F.col(name).isNotNull()
            any_ok = p if any_ok is None else (any_ok | p)
        df = df.filter(any_ok)
    return df.drop("_raw") if not keep_unparsed else df


def read_grok(
    spark: SparkSession,
    paths: list[str],
    fmt: FormatConfig,
    extra_patterns: dict[str, str] | None = None,
    keep_unparsed: bool = False,
) -> DataFrame:
    """Grok patterns incl. nested/optional (core_formats.bats:4-43)."""
    compiled = compile_grok(fmt.pattern, extra_patterns)
    lines = spark.read.text(paths)
    matched = F.col("value").rlike(compiled.regex)
    cols = []
    for name, (gi, typ) in compiled.fields.items():
        c = F.when(matched, F.regexp_extract(F.col("value"), compiled.regex, gi))
        if typ in GROK_TYPE_CASTS:
            c = c.cast(GROK_TYPE_CASTS[typ])
        cols.append(c.alias(name))
    df = lines.select(*cols, matched.alias("_parsed"))
    if not keep_unparsed:
        df = df.filter(F.col("_parsed")).drop("_parsed")
    return df


def read_with_format(
    spark: SparkSession,
    paths: list[str],
    fmt: FormatConfig,
    schema: T.StructType | None = None,
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    if fmt.type == "jsonl":
        return read_jsonl(spark, paths, schema)
    if fmt.type == "delimited":
        return read_delimited(spark, paths, fmt, schema)
    if fmt.type == "regex":
        return read_regex(spark, paths, fmt)
    if fmt.type == "grok":
        return read_grok(spark, paths, fmt, extra_patterns)
    raise ValueError(f"unknown format type {fmt.type!r}")
