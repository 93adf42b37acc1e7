"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
full operator inventory from SURVEY.md §2 (see
tailpipe_spark/queries/*) for the DuckDB-oracle correctness harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tailpipe_spark.queries import build_registry

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tailpipe_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _REGISTRY.items()
        if spec.oracle is not None
    }
