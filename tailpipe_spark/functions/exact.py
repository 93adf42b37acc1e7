"""Deterministic floating-point aggregation.

Distributed ``SUM(double)`` is order-dependent: partial sums combine in
whatever order partitions finish, so the last bits of a 600k-row sum can
differ run-to-run (and differ from any single-threaded engine). The
engine's contract (like the reference delegating to DuckDB's exact
decimal arithmetic) is deterministic aggregates, so money/measure sums
go through a decimal cast: per-row double→decimal rounding is
deterministic and order-free, decimal addition is exact and associative,
and the final cast back to double is a single deterministic rounding.

Cost at scale: decimal sum is still a one-pass hash aggregate with
map-side partial aggregation — no extra shuffle, slightly more CPU per
row than a double add. Worth it for a reproducible engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 27 digits / 6 decimal places holds any per-row product in the test
# schema (prices < 1e7) and sums promote to decimal(38,6) before overflow.
_DEC = "decimal(27,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact, order-independent sum of a double expression."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic average: exact decimal sum, then one double divide."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dwindow_sum(col: Column | str, window) -> Column:
    """Deterministic windowed sum: fixed-point long accumulation.

    round(v*1e6) is the integer numerator of CAST(v AS DECIMAL(·,6)), so
    the long sum equals the decimal sum exactly (and double(n)/1e6 is
    correctly rounded like decimal→double), at ~2x the speed of the
    BigDecimal frame accumulator. Safe while a single window PARTITION's
    sum stays under 2^53 micro-units (~9e9 in value units) — window
    partitions are per-key by construction, so this holds far beyond
    100 TB totals; unbounded cross-row sums keep the decimal path
    (:func:`dsum`)."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.round(c * F.lit(1e6)).cast("long")
    return F.sum(u).over(window).cast("double") / F.lit(1e6)


def dsum_fp(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic GROUPED sum via fixed-point long accumulation —
    :func:`dwindow_sum`'s trick lifted to groupBy aggregates.

    round(v*1e6) is the integer numerator of CAST(v AS DECIMAL(·,6))
    for values on a <=6-decimal grid (prices etc. — verified 0
    mismatching rows over orders at sf0.1 AND sf10), so the long sum
    equals the decimal sum exactly while running in whole-stage-codegen
    long addition instead of one BigDecimal add per row; the final
    double(n)/1e6 is a single correctly-rounded IEEE divide, identical
    to BigDecimal.doubleValue on the same quotient. Measured on
    q_topk_window at sf10: the per-row BigDecimal path is ~45% of the
    aggregation wall (SCALE_PROOF §q_topk_window r12).

    Preconditions (caller's judgment, both violated loudly at the
    oracle, not silently): (1) input values sit on a <=6-decimal grid
    — derived EXPRESSIONS like price*(1-discount) do NOT qualify
    (their double product is off-grid and round-vs-decimal-cast can
    disagree by one micro-unit; keep :func:`dsum` there); (2) each
    GROUP's |sum| stays under 2^53 micro-units (~9e9 in value units) —
    right for per-entity groups (a customer's revenue), wrong for
    whole-table rollups at 100 TB, which keep :func:`dsum`."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.round(c * F.lit(1e6)).cast("long")
    out = F.sum(u).cast("double") / F.lit(1e6)
    return out.alias(alias) if alias else out


def dsum_fp_revenue(
    price: Column | str, discount: Column | str, alias: str | None = None
) -> Column:
    """Deterministic grouped sum of the TPC-H revenue shape
    ``price * (1 - discount)`` in EXACT integer arithmetic — the
    :func:`dsum_fp` discipline extended to the one derived expression
    the fixed-point rule would otherwise exclude (an off-grid double
    PRODUCT). The trick: both factors are on-grid (price 2-decimal,
    discount 2-decimal), so price_micro x (100 - discount_cents) is an
    exact INTEGER equal to 100x the DECIMAL(·,6) numerator of the
    double product — per-row equality verified with 0 mismatches over
    all lineitem rows at sf0.1 and sf10 (the double product of <=10-
    sig-digit rationals round-trips exactly through both engines'
    double→decimal casts). One long multiply-add per row in codegen,
    one correctly-rounded divide by 1e8 per group.

    Precondition: per-GROUP |sum| under 2^53 in micro-x-100 units (NOT
    2^63: the long sum is exact to 2^63, but the final
    ``cast('double')/1e8`` silently rounds any integer above 2^53, so
    the bit-exact-vs-decimal contract ends there — same bound as
    :func:`dsum_fp`). That is ~5.3e2 rows x max-price 1.7e13 per group;
    right for per-order groups (line items per order are BOUNDED — 17
    in this corpus — independent of SF); wrong for per-nation /
    whole-table rollups, which keep :func:`dsum` (or need a decimal
    surface for the quotient)."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    u = F.round(p * F.lit(1e6)).cast("long") * (
        F.lit(100).cast("long") - F.round(d * F.lit(100)).cast("long")
    )
    out = F.sum(u).cast("double") / F.lit(1e8)
    return out.alias(alias) if alias else out


def dsum_dec(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum SURFACED AS DECIMAL(38,6) — no double conversion.

    The double-returning :func:`dsum` is correct until the sum needs
    >16 significant digits; beyond that, engines differ in the
    decimal→double conversion itself (Spark's BigDecimal.doubleValue is
    correctly rounded; DuckDB converts via int128→double / 10^scale,
    which double-rounds) — observed at 10× bench scale as a last-ulp
    sum_charge divergence. Keeping the DECIMAL type end-to-end makes
    the comparison exact at ANY scale."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("decimal(38,6)")
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`dsum` for oracle parity.

    The decimal→double conversion is routed through VARCHAR: DuckDB's
    direct ``CAST(decimal AS DOUBLE)`` computes int128→double ÷ 10^scale,
    which DOUBLE-ROUNDS once the sum needs >16 significant digits
    (observed at 10× bench scale: sum_charge …941593 vs the correctly
    rounded …94159), while its string→double (strtod) is correctly
    rounded — matching Spark's BigDecimal.doubleValue exactly at ANY
    magnitude. The decimal→string step is exact, so the round trip adds
    no error, only removes the double-rounding."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)"


def oracle_dsum_dec(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`dsum_dec`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DECIMAL(38,6))"


def oracle_davg(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`davg` (same VARCHAR-routed
    conversion as :func:`oracle_dsum` — see there)."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr})"
    )
