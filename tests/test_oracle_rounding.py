"""Pins the cross-engine decimal→double conversion contract behind
oracle_dsum/oracle_davg (functions/exact.py).

DuckDB's direct ``CAST(decimal AS DOUBLE)`` computes int128→double ÷
10^scale, which double-rounds once the value needs more than ~16
significant digits; its string→double (strtod) is correctly rounded.
Spark's BigDecimal.doubleValue is correctly rounded. The oracle
therefore routes the final cast through VARCHAR — this test pins both
that the route is correctly rounded AND that the direct cast still
misbehaves (if a DuckDB upgrade fixes the direct cast, the second
assertion fails and the VARCHAR detour can be retired).

No Spark session needed — pure DuckDB + Python decimal.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb

from tailpipe_spark.functions.exact import oracle_davg, oracle_dsum

# the r8 live repro from the 10x bench set: a DECIMAL(38,6) sum whose
# double conversion needs 17 significant digits
_HARD = Decimal("27864155010.941590")


def test_varchar_route_is_correctly_rounded():
    got = duckdb.sql(
        f"SELECT CAST(CAST(CAST('{_HARD}' AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()[0]
    assert got == float(_HARD)  # Python float() of Decimal is correctly rounded


def test_direct_cast_still_double_rounds():
    direct = duckdb.sql(
        f"SELECT CAST(CAST('{_HARD}' AS DECIMAL(38,6)) AS DOUBLE)"
    ).fetchone()[0]
    assert direct != float(_HARD), (
        "DuckDB's direct decimal->double cast is now correctly rounded; "
        "the VARCHAR detour in oracle_dsum/oracle_davg can be retired"
    )


def test_oracle_helpers_emit_varchar_route():
    for sql in (oracle_dsum("x"), oracle_davg("x")):
        assert "AS VARCHAR" in sql
        assert "AS DOUBLE" in sql


def test_end_to_end_sum_matches_python_decimal():
    """A 3-row aggregation through the actual helper SQL equals the
    exact decimal sum converted by Python (the correctly-rounded
    reference)."""
    vals = ["9999999999.123456", "8888888888.654321", "8975268123.163813"]
    rows = ", ".join(f"({v})" for v in vals)
    sql = oracle_dsum("v") + f" FROM (VALUES {rows}) t(v)"
    got = duckdb.sql("SELECT " + sql).fetchone()[0]
    want = float(sum(Decimal(v) for v in vals))
    assert got == want


def test_dsum_fp_equals_decimal_dsum_on_grid(spark):
    """dsum_fp's exactness claim (SCALE_PROOF §q_topk_window r12): for
    values on a <=6-decimal grid with group totals under 2^53
    micro-units, the fixed-point long fold equals the decimal
    accumulation bit-for-bit — per group, across many groups, on
    adversarial 2-decimal values (the o_totalprice shape)."""
    from pyspark.sql import functions as F

    from tailpipe_spark.functions.exact import dsum, dsum_fp

    df = (
        spark.range(200_000)
        .select(
            (F.col("id") % 997).alias("g"),
            # 2-decimal prices, sign-mixed, up to ~9e5 like o_totalprice
            ((F.xxhash64("id") % 90_000_000) / F.lit(100.0)).alias("v"),
        )
    )
    got = (
        df.groupBy("g")
        .agg(dsum_fp("v", "fp"), dsum("v", "dec"))
        .where(F.col("fp") != F.col("dec"))
        .count()
    )
    assert got == 0


def test_dsum_fp_revenue_equals_decimal_on_grid(spark):
    """dsum_fp_revenue's exactness claim: for 2-decimal price and
    discount grids, price_micro x (100 - discount_cents) is exactly
    100x the DECIMAL(27,6) numerator of the double product, so the
    grouped sums match the decimal path bit-for-bit."""
    from pyspark.sql import functions as F

    from tailpipe_spark.functions.exact import dsum, dsum_fp_revenue

    df = spark.range(200_000).select(
        (F.col("id") % 991).alias("g"),
        ((F.xxhash64("id") % 9_000_000) / F.lit(100.0) + 901.0).alias("p"),
        ((F.xxhash64("id", F.lit(1)) % 11) / F.lit(100.0)).alias("d"),
    )
    got = (
        df.groupBy("g")
        .agg(
            dsum_fp_revenue("p", "d", "fp"),
            dsum(F.col("p") * (1 - F.col("d")), "dec"),
        )
        .where(F.col("fp") != F.col("dec"))
        .count()
    )
    assert got == 0
