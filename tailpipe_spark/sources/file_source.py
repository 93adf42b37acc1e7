"""File source: glob paths + grok-templated ``file_layout`` filename
matching, with layout fields surfaced as columns (reference contract:
core_formats.bats:22-28,178-183; internal/parse/load_config.go:91-97).

Listing happens driver-side (cheap metadata); the matched files feed a
single Spark read so the data path stays distributed. Layout fields
(e.g. ``plugin-%{YEAR:year}-%{MONTHNUM:month}.log``) become literal
columns per file via ``input_file_name()`` mapping — no per-row Python.
"""

from __future__ import annotations

import glob as _glob
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tailpipe_spark.config import FormatConfig, SourceConfig
from tailpipe_spark.sources.formats import read_with_format
from tailpipe_spark.sources.grok import compile_grok


@dataclass
class MatchedFile:
    path: str
    layout_fields: dict[str, str]


class FileSource:
    def __init__(self, config: SourceConfig):
        self.config = config
        self._layout = (
            compile_grok(config.file_layout) if config.file_layout else None
        )

    def list_files(self) -> list[MatchedFile]:
        out: list[MatchedFile] = []
        for pattern in self.config.paths:
            paths = (
                sorted(_glob.glob(pattern, recursive=True))
                if any(ch in pattern for ch in "*?[")
                else ([pattern] if os.path.exists(pattern) else [])
            )
            # a directory path means "scan it" (reference: paths name the
            # source dir and file_layout picks files — core_formats.bats:22-28)
            expanded: list[str] = []
            for p in paths:
                if os.path.isdir(p):
                    for root, _dirs, names in os.walk(p):
                        expanded.extend(os.path.join(root, n) for n in sorted(names))
                else:
                    expanded.append(p)
            for p in expanded:
                if self._layout is None:
                    out.append(MatchedFile(p, {}))
                    continue
                m = re.fullmatch(self._layout.regex, os.path.basename(p))
                if m:
                    fields = {
                        name: m.group(gi)
                        for name, (gi, _typ) in self._layout.fields.items()
                    }
                    out.append(MatchedFile(p, fields))
        return out

    def read(
        self,
        spark: SparkSession,
        fmt: FormatConfig | None = None,
        only_paths: list[str] | None = None,
    ) -> DataFrame:
        fmt = fmt or self.config.format
        if fmt is None:
            raise ValueError("file source needs a format")
        files = self.list_files()
        if only_paths is not None:
            keep = set(only_paths)
            files = [f for f in files if f.path in keep]
        if not files:
            raise FileNotFoundError(
                f"no files match paths={self.config.paths} "
                f"layout={self.config.file_layout!r}"
            )
        df = read_with_format(spark, [f.path for f in files], fmt)
        if self._layout is not None:
            # map layout fields onto rows by source file, JVM-side:
            # chained when(input_file_name() endswith basename, lit(v))
            for name in self._layout.fields:
                expr = F.lit(None).cast("string")
                for f in files:
                    expr = (
                        F.when(
                            F.input_file_name().endswith(os.path.basename(f.path)),
                            F.lit(f.layout_fields[name]),
                        ).otherwise(expr)
                    )
                df = df.withColumn(name, expr)
        return df
