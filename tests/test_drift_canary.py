"""Environment-drift canary.

Round 4 lesson: the driver regenerated /root/testdata with parquet
timestamp[us] columns, which Spark 4's default `inferTimestampNTZ`
reads as TIMESTAMP_NTZ — and `unix_micros()` rejects NTZ at analysis
time, silently breaking three oracle queries and the whole bench.

This test pins the contract: every time column in every driver table
must resolve to plain TimestampType through our read path, and
`unix_micros()` must analyze against it. A future testdata or Spark
upgrade fails ONE named test here instead of a scattering of oracle
rows.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from tailpipe_spark.session import TEST_TABLES, read_table

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)


def test_all_time_columns_resolve_to_timestamp(spark):
    offenders = []
    for t in TEST_TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if not os.path.exists(path):
            continue
        df = read_table(spark, path)
        for f_ in df.schema.fields:
            name = f_.dataType.typeName()
            if "timestamp" in name and not isinstance(f_.dataType, TimestampType):
                offenders.append(f"{t}.{f_.name}: {name}")
    assert not offenders, f"non-TIMESTAMP time columns leaked through read_table: {offenders}"


def test_unix_micros_analyzes_on_events_ts(spark):
    df = read_table(spark, f"{SF_DIR}/events.parquet")
    # analysis (not execution) is where the NTZ mismatch throws
    df.select(F.unix_micros("ts").alias("us")).schema


def test_unix_micros_analyzes_on_lineitem_shipdate(spark):
    df = read_table(spark, f"{SF_DIR}/lineitem.parquet")
    ship = [f.name for f in df.schema.fields if "ship" in f.name and "date" in f.name]
    for c in ship:
        if isinstance(df.schema[c].dataType, TimestampType):
            df.select(F.unix_micros(c)).schema
