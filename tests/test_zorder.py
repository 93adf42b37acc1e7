"""Z-order clustering: the files it writes must prune on BOTH columns.

The measurable claim: with two independent uniform columns, a
time-sorted layout gives every file ~the full range of the second
column (footer stats prune nothing), while the z-ordered layout gives
each file a small sub-rectangle — average per-file span shrinks by a
large factor.
"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tailpipe_spark.plans.zorder import with_zvalue, zorder_rewrite


def _df(spark, n=20000):
    return spark.range(n).select(
        F.col("id").alias("ts"),
        # independent second dimension (decorrelated from ts by hashing)
        F.abs(F.xxhash64(F.col("id"))).bitwiseAND(F.lit(0xFFFF)).alias("user_id"),
    )


def _file_spans(path, col):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            idx = next(
                i
                for i in range(group.num_columns)
                if group.column(i).path_in_schema == col
            )
            stats = group.column(idx).statistics
            lo = stats.min if lo is None else min(lo, stats.min)
            hi = stats.max if hi is None else max(hi, stats.max)
        spans.append(hi - lo)
    return spans


def test_zvalue_is_deterministic_and_row_local(spark):
    df = _df(spark, 2000)
    a = with_zvalue(df, ["ts", "user_id"]).select("__z").collect()
    b = with_zvalue(df, ["ts", "user_id"]).select("__z").collect()
    assert sorted(r["__z"] for r in a) == sorted(r["__z"] for r in b)
    plan = (
        with_zvalue(df, ["ts", "user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchange is the broadcast of the 1-row bounds aggregate
    assert "Exchange hashpartitioning" not in plan


def test_zorder_files_prune_on_second_column(spark, tmp_path):
    df = _df(spark)
    n_files = 16

    time_sorted = str(tmp_path / "time_sorted")
    (
        df.repartitionByRange(n_files, F.col("ts"))
        .sortWithinPartitions("ts")
        .write.parquet(time_sorted)
    )
    zordered = str(tmp_path / "zordered")
    zorder_rewrite(df, ["ts", "user_id"], n_files).write.parquet(zordered)

    full = 0xFFFF
    t_spans = _file_spans(time_sorted, "user_id")
    z_spans = _file_spans(zordered, "user_id")
    t_avg = sum(t_spans) / len(t_spans) / full
    z_avg = sum(z_spans) / len(z_spans) / full
    # time-sorted files each cover ~the whole user_id range…
    assert t_avg > 0.9
    # …z-ordered files cover a small sub-rectangle on BOTH columns
    assert z_avg < 0.5 * t_avg
    zt_avg = sum(_file_spans(zordered, "ts")) / n_files / 20000
    assert zt_avg < 0.6  # ts locality is retained too


def test_zorder_rejects_bad_arity(spark):
    import pytest

    with pytest.raises(ValueError):
        with_zvalue(_df(spark), ["ts"])


def test_compact_zorder_by_roundtrip(spark, tmp_path):
    """compact_table(zorder_by=...) rewrites without losing rows."""
    from tailpipe_spark.plans.zorder import zorder_rewrite as zr

    df = _df(spark, 5000).withColumn("v", F.col("ts") * 2)
    out = zr(df, ["ts", "user_id"], 4)
    path = str(tmp_path / "zc")
    out.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 5000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    assert set(back.columns) == {"ts", "user_id", "v"}  # __z dropped


def test_zvalue_accepts_date_column(spark):
    """DATE columns go through unix_date — CAST(DATE AS BIGINT) is an
    AnalysisException on Spark 4.x (r6 ADVICE)."""
    from pyspark.sql import functions as F

    from tailpipe_spark.plans.zorder import with_zvalue

    df = spark.range(10).select(
        F.expr("date_add(date'2024-01-01', cast(id as int))").alias("d"),
        (F.col("id") % 3).alias("k"),
    )
    out = with_zvalue(df, ["d", "k"]).collect()
    assert len(out) == 10
    zs = [r["__z"] for r in out]
    assert len(set(zs)) > 1
