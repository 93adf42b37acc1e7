"""Required-column validation: count, report, and drop rows with NULLs
in required columns — reference semantics from
internal/database/convertor_validate.go:11-110 (rows are *deleted* and
counted, never silently kept).

The report is a single aggregation pass (one map-side-combinable agg,
no per-column scans); the drop is one filter. Both scale linearly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_count_report(df: DataFrame, required: list[str]) -> DataFrame:
    """One row per required column: (column_name, null_count)."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(c)
        for c in required
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{c}', `{c}`" for c in required)
    return wide.select(
        F.expr(f"stack({len(required)}, {pairs}) as (column_name, null_count)")
    )


def _any_null(cols: list[str]):
    cond = None
    for c in cols:
        p = F.col(c).isNull()
        cond = p if cond is None else (cond | p)
    return cond


@dataclass
class ValidationResult:
    valid: DataFrame
    invalid_count: int
    null_columns: list[str]


def validate_required(df: DataFrame, required: list[str]) -> ValidationResult:
    """Split off rows with any NULL required column.

    Returns the clean DataFrame plus the count of dropped rows and the
    list of columns that had nulls (for the status report, mirroring the
    reference's RowValidationError).
    """
    present = [c for c in required if c in df.columns]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"required columns missing from schema: {missing}")

    # one aggregation pass yields BOTH the per-column null counts and
    # the any-null row count — a separate count() would re-scan the
    # whole source on the ingest hot path
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(c)
        for c in present
    ]
    invalid_agg = (
        F.sum(F.when(_any_null(present), 1).otherwise(0)).cast("long")
        if present
        else F.lit(0).cast("long")
    )
    row = df.agg(*aggs, invalid_agg.alias("__invalid")).collect()[0] if present else None
    report = {c: row[c] for c in present} if row is not None else {}
    null_cols = sorted(c for c, n in report.items() if n and n > 0)
    invalid = int(row["__invalid"] or 0) if row is not None else 0

    cond = None
    for c in present:
        p = F.col(c).isNotNull()
        cond = p if cond is None else (cond & p)
    valid = df.filter(cond) if cond is not None else df
    return ValidationResult(valid=valid, invalid_count=invalid, null_columns=null_cols)
