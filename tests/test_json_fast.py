"""Edge-case battery for the tiered JSON extraction
(functions/json_fast.py): the fast path must agree with the variant
fallback on every admissible input class, malformed input must be
null-tolerant (r7 ADVICE — no exceptions), and the documented
duplicate-key divergence stays pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tailpipe_spark.functions.json_fast import json_get_int


CASES = [
    # (doc, expected)
    ('{"k": 5}', 5),
    ('{"k":-3}', -3),
    ('{"k": 0}', 0),
    ('{"k": -0}', 0),
    ('{"nk": 7}', None),          # wrong key, quote-anchored
    ('{"kk": 1, "k": 3}', 3),
    ('{"k" : 12 , "b": 1}', 12),  # whitespace around members
    ('{"a": {"k": 5}, "k": 6}', 6),       # nested k must not shadow
    ('{"a": "\\"k\\": 9", "k": 6}', 6),   # escaped fake member in string
    ('{"k": "76"}', 76),          # string-encoded int: variant casts
    ('{"k": 1.5}', 1),            # float truncates like variant 'int'
    ('{"k": 2e3}', 2000),
    ('{"k": true}', 1),           # bool->int like variant
    ('{"k": null}', None),
    ('{"k": 9999999999}', None),  # > int32: variant nulls, fast skips
    ('{"k": 007}', None),         # invalid JSON number (leading zeros)
    ('{"k": 05}', None),
    ('{"k": 5,}', None),          # trailing comma = malformed
    ("not json", None),           # malformed: NULL, never an exception
    ("{}", None),
    (None, None),
]


def test_json_get_int_edge_cases(spark):
    docs = [(i, d) for i, (d, _want) in enumerate(CASES)]
    df = spark.createDataFrame(docs, "i int, props string")
    got = {
        r["i"]: r["k"]
        for r in df.select("i", json_get_int("props", "k").alias("k")).collect()
    }
    for i, (doc, want) in enumerate(CASES):
        assert got[i] == want, f"doc {doc!r}: got {got[i]}, want {want}"


def test_json_get_int_matches_variant_path(spark):
    """On every case above (the duplicate-key class is pinned
    separately) the tiered plan equals Spark's own variant
    extraction."""
    docs = [(i, d) for i, (d, _w) in enumerate(CASES)]
    df = spark.createDataFrame(docs, "i int, props string")
    out = df.select(
        "i",
        json_get_int("props", "k").alias("fast"),
        F.try_variant_get(
            F.try_parse_json("props"), "$.k", "int"
        ).alias("variant"),
    ).collect()
    for r in out:
        assert r["fast"] == r["variant"], CASES[r["i"]]


def test_json_get_int_duplicate_keys_first_wins(spark):
    """Documented divergence: the fast path keeps the FIRST duplicate
    key (yyjson/DuckDB behavior, what the oracle replays); Spark's
    variant parser rejects the document to NULL. RFC 8259 leaves
    duplicate-key behavior implementation-defined."""
    df = spark.createDataFrame([('{"k":1,"k":2}',)], "props string")
    row = df.select(
        json_get_int("props", "k").alias("fast"),
        F.try_variant_get(F.try_parse_json("props"), "$.k", "int").alias("variant"),
    ).collect()[0]
    assert row["fast"] == 1
    assert row["variant"] is None

    import duckdb

    assert duckdb.sql(
        """SELECT CAST(json_extract_string('{"k":1,"k":2}', '$.k') AS INT)"""
    ).fetchone()[0] == 1  # the oracle agrees with the fast path


def test_json_get_int_duplicate_keys_mixed_types(spark):
    """First-wins must be POSITIONAL over all value types (r8 ADVICE):
    on {"k":"9","k":5} the first occurrence is a string, so the fast
    path must NOT return 5 (the first *integer* occurrence). It defers
    to the variant path, which rejects duplicate-key documents to NULL.
    DuckDB's yyjson would take "9" -> 9; that residual divergence is
    documented in the module docstring and pinned here."""
    mixed = [
        ('{"k":"9","k":5}', None),   # first value non-int -> variant -> NULL
        ('{"k":1.5,"k":7}', None),   # float first: same
        ('{"k":null,"k":7}', None),  # null first: same
        ('{"k":3,"k":"9"}', 3),      # int first: fast path, yyjson-first
        ('{"k":3,"k":1.5}', 3),
    ]
    df = spark.createDataFrame(
        [(i, d) for i, (d, _w) in enumerate(mixed)], "i int, props string"
    )
    got = {
        r["i"]: r["k"]
        for r in df.select("i", json_get_int("props", "k").alias("k")).collect()
    }
    for i, (doc, want) in enumerate(mixed):
        assert got[i] == want, f"doc {doc!r}: got {got[i]}, want {want}"

    import duckdb

    # the live oracle's positional first-wins, for the record: it reads
    # "9" on the doc the fast path defers to NULL on
    assert duckdb.sql(
        """SELECT CAST(json_extract_string('{"k":"9","k":5}', '$.k') AS INT)"""
    ).fetchone()[0] == 9


def test_json_get_int_rejects_pathy_keys():
    with pytest.raises(ValueError):
        json_get_int("props", "a.b")
    with pytest.raises(ValueError):
        json_get_int("props", 'x"]')


def test_q_json_extract_variant_matches_raw_path(spark):
    """The driver-visible json-storage entry (r14): events collected
    through the engine with props declared `json` must (a) actually
    store VARIANT, (b) produce aggregates identical to the raw-string
    extraction plan, and (c) reuse the cached workspace on the second
    call instead of re-collecting."""
    import os

    from pyspark.sql import types as T

    from tailpipe_spark.queries.timeseries import (
        _variant_events_catalog,
        q_json_extract,
        q_json_extract_variant,
    )

    sf = "/root/testdata/sf0.001"
    cat = _variant_events_catalog(spark, sf)
    view = cat.read_table(spark, "events")
    assert isinstance(view.schema["props"].dataType, T.VariantType)

    got = {tuple(r) for r in q_json_extract_variant(spark, sf).collect()}
    want = {tuple(r) for r in q_json_extract(spark, sf).collect()}
    assert got == want and got

    # second call must be a cache hit: manifest mtime unchanged
    manifest = cat.manifest_path
    m0 = os.path.getmtime(manifest)
    cat2 = _variant_events_catalog(spark, sf)
    assert cat2.workspace == cat.workspace
    assert os.path.getmtime(manifest) == m0
