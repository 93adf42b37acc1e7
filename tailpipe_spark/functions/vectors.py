"""Vector math over ``array<float>`` embedding columns — pure JVM-side
expressions (``F.zip_with`` / ``F.aggregate``), no Python UDFs, so the
hot loop stays inside whole-stage codegen and scales linearly with rows.

Accumulation is sequential left-to-right over the array (both in Spark's
``aggregate`` higher-order function and in any single-node engine), so
results are deterministic for a fixed element order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
