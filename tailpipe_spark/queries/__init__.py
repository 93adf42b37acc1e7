"""Query inventory: every operator class from SURVEY.md §2 expressed as
a named (Spark DataFrame plan, DuckDB oracle SQL) pair.

The driver runs each Spark plan and its oracle side-by-side at sf0.01
and hash-compares results (CORRECTNESS_r{N}.json). Entries with
``oracle=None`` are non-SQL-expressible (or engine-specific hashing)
and get a rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


def build_registry() -> dict[str, QuerySpec]:
    """Full query inventory in stable module-definition order.

    Product consumers (CLI, shell, tests) see this fixed ordering.
    Verification-harness concerns (e.g. rotating a sampling window)
    belong to the harness entry point, not here.
    """
    from tailpipe_spark.queries import (
        advanced,
        relational,
        sampling_q,
        streaming_q,
        textdata,
        timeseries,
        tpch,
        vectors_q,
    )

    registry: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        tpch,
        timeseries,
        textdata,
        sampling_q,
        vectors_q,
        advanced,
        streaming_q,
    ):
        for spec in mod.SPECS:
            if spec.name in registry:
                raise ValueError(f"duplicate query name {spec.name}")
            registry[spec.name] = spec
    return registry
