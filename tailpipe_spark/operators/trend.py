"""Per-group time-series trend statistics.

Two operators, two execution strategies — picked deliberately:

- :func:`linear_trend` — ordinary least squares per group. Spark has
  ``regr_slope``/``regr_intercept`` built in, but their streaming
  double sums are partition-order-dependent in the last ulps (the same
  reason functions/exact.py exists). Since slope/intercept are rational
  functions of Σx, Σy, Σxy, Σx² and those sums are EXACT in integer
  arithmetic after fixed-point scaling, we compute the sums as longs
  (one map-side-combined aggregation, deterministic, replayable in any
  SQL engine) and do the two final double divisions at the end.
- :func:`ewma` — exponentially weighted moving average. Inherently
  sequential within a group (EWMA_t depends on EWMA_{t-1}), which SQL
  window functions cannot express without pow() chains; this is the
  textbook case for Arrow-batched ``applyInPandas``: each group
  arrives as one pandas frame, the recurrence runs vectorized, nothing
  crosses groups. One shuffle on the group key — the same cost as any
  grouped aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for the y axis (micro-units)
_Y_SCALE = 1_000_000


def linear_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col,
    y_col,
) -> DataFrame:
    """Exact OLS slope/intercept per group.

    ``x_col`` must already be an integral column (e.g. days since an
    epoch — rebase before calling so Σx² stays well inside a long);
    ``y_col`` is fixed-point-scaled to micro-units internally. Output:
    group cols + n, slope, intercept (slope in y-units per x-unit).
    """
    x = F.col(x_col).cast("long") if isinstance(x_col, str) else x_col.cast("long")
    y = F.round(
        (F.col(y_col) if isinstance(y_col, str) else y_col) * _Y_SCALE
    ).cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n = F.col("n")
    # the combination step multiplies two ~1e18 longs — at 10× bench
    # scale (1M rows/group, micro-unit y) n·Σxy crossed 2^63 and threw
    # ARITHMETIC_OVERFLOW under ANSI. The per-row sums stay long (fast
    # map-side combine); only these four products widen to
    # DECIMAL(38,0) (values ≤ ~1e36, exact), then one double cast —
    # the oracle widens identically via HUGEINT.
    d38 = "decimal(38,0)"
    nD, sx, sy, sxy, sxx = (
        n.cast(d38),
        F.col("__sx").cast(d38),
        F.col("__sy").cast(d38),
        F.col("__sxy").cast(d38),
        F.col("__sxx").cast(d38),
    )
    det = (nD * sxx - sx * sx).cast("double")
    slope_u = (nD * sxy - sx * sy).cast("double")
    slope = F.when(det == 0, F.lit(None)).otherwise(slope_u / det) / _Y_SCALE
    intercept = (
        F.col("__sy").cast("double") / _Y_SCALE
        - slope * F.col("__sx").cast("double")
    ) / n.cast("double")
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def oracle_linear_trend_sql(
    table: str, group_cols: list[str], x_sql: str, y_sql: str
) -> str:
    """DuckDB twin of :func:`linear_trend` — same integer sums, same
    two final divisions, bit-identical output."""
    g = ", ".join(group_cols)
    return f"""
WITH sums AS (
  SELECT {g}, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM (SELECT {g}, CAST({x_sql} AS BIGINT) AS x,
               CAST(ROUND(({y_sql}) * {_Y_SCALE}) AS BIGINT) AS y
        FROM {table})
  GROUP BY {g})
SELECT {g}, n,
       CASE WHEN nH * sxxH - sxH * sxH = 0 THEN NULL
            ELSE CAST(nH * sxyH - sxH * syH AS DOUBLE)
                 / CAST(nH * sxxH - sxH * sxH AS DOUBLE) END / {_Y_SCALE} AS slope,
       (CAST(sy AS DOUBLE) / {_Y_SCALE}
        - (CASE WHEN nH * sxxH - sxH * sxH = 0 THEN NULL
                ELSE CAST(nH * sxyH - sxH * syH AS DOUBLE)
                     / CAST(nH * sxxH - sxH * sxH AS DOUBLE) END / {_Y_SCALE}) * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept
FROM (SELECT *, CAST(n AS HUGEINT) AS nH, CAST(sx AS HUGEINT) AS sxH,
             CAST(sy AS HUGEINT) AS syH, CAST(sxy AS HUGEINT) AS sxyH,
             CAST(sxx AS HUGEINT) AS sxxH
      FROM sums)
"""


def ewma(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-group EWMA over time order via Arrow-batched applyInPandas.

    Output: one row per input row with an ``ewma`` column. The
    recurrence is row-sequential within a group but groups run in
    parallel; ties on the timestamp break by the remaining columns'
    order after a stable sort, so output is deterministic.
    """
    out_fields = df.schema.fields
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    out_schema += ", ewma double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col] + [c for c in pdf.columns if c != ts_col],
                              kind="mergesort").reset_index(drop=True)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*group_cols).applyInPandas(run, schema=out_schema)
