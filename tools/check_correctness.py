"""Local replica of the driver's oracle harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same parquet dir, then compares row count, column
names, and order-insensitive TYPE-TAGGED values.

Round-1 lesson: a plain ``str()`` normalization masked a DuckDB HUGEINT
(int128, surfaces as ``Decimal``) vs Spark BIGINT mismatch that the
driver's hasher caught. Cells are therefore tagged by type class before
comparison — ``int`` != ``Decimal`` != ``float`` != ``bool``, and
``date`` != ``datetime`` — so the local gate can never be greener than
the driver on a typing divergence. DuckDB results are fetched through
Arrow (HUGEINT -> decimal128, DATE -> date32) to surface the same typed
values the driver sees.

Round-7 lesson (``--driver-canon``): the driver's hasher fetches the
DuckDB oracle pandas-style, which converts DECIMAL(38,6) to float64,
while Spark collects ``Decimal`` — so a DECIMAL-typed output column
hash-diverges at the driver even when every value matches under the
typed Arrow fetch (q01's CORRECTNESS_r07 ``hash_match: false``).
``--driver-canon`` replays that behavior (oracle decimals -> float64)
so the gate fails exactly what the driver fails. Independently, any
driver-facing (non-local_only) entry whose Spark schema contains a
DecimalType output column is linted as a failure in BOTH modes —
DECIMAL surfaces belong only to ``local_only`` exactness twins.

Run both modes each round; an entry whose greenness depends on the
mode is a bug in the entry, not the gate.

    python tools/check_correctness.py [sf_dir] [query ...] [--driver-canon] [--json=FILE]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from tailpipe_spark.session import TEST_TABLES, build_session


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "bool:" + ("true" if v else "false")
    if isinstance(v, int):
        return "int:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return "float:" + repr(v)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, datetime.datetime):
        return "ts:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "date:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "bin:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_norm_cell(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "asDict"):  # pyspark Row (struct column)
        d = v.asDict()
        return "{" + ",".join(f"{k}={_norm_cell(d[k])}" for k in sorted(d)) + "}"
    return "str:" + str(v)


def _canon_dec(v):
    """Driver-canon cell rewrite: Decimal -> float64, as a pandas-style
    DuckDB fetch does (decimal128 column -> float64 ndarray). Recurses
    into containers so nested decimals canonicalize too."""
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (list, tuple)):
        return [_canon_dec(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon_dec(x) for k, x in v.items()}
    return v


def _normalize(rows, cols, driver_canon=False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    if driver_canon:
        rows = [tuple(_canon_dec(c) for c in r) for r in rows]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def _duck_rows(con, sql):
    """Fetch through Arrow so HUGEINT surfaces as Decimal (like the
    driver's typed hasher), not a Python int that str()-matches BIGINT."""
    tbl = con.execute(sql).fetch_arrow_table()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return rows, cols


def _decimal_cols(schema) -> list[str]:
    """Names of top-level output columns whose type contains a DecimalType
    anywhere (struct/array/map elements included)."""
    from pyspark.sql import types as T

    def has_dec(dt) -> bool:
        if isinstance(dt, T.DecimalType):
            return True
        if isinstance(dt, T.StructType):
            return any(has_dec(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return has_dec(dt.elementType)
        if isinstance(dt, T.MapType):
            return has_dec(dt.keyType) or has_dec(dt.valueType)
        return False

    return [f.name for f in schema.fields if has_dec(f.dataType)]


def _complex_cols(schema) -> list[str]:
    """Names of top-level output columns with a complex (array/map/struct)
    type. Driver-hash-unsafe for a different reason than DECIMAL: the
    driver's pandas canonicalizer sorts rows over all columns, and a list
    cell is unhashable there (`TypeError: unhashable type: 'list'` — the
    r12 emb_quantize_int8 err row). VariantType is in the same class:
    VariantVal cells are neither sortable nor hashable in pandas. Only
    local_only twins may surface them; driver entries serialize
    (CSV/JSON) or digest instead."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType, T.VariantType)
        )
    ]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )
    driver_canon = "--driver-canon" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    spark = build_session("correctness-check")
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(
            # generated bench sets (tools/gen_sf.py) are flat
            # directories; engine-workspace twins (the bucketed-layout
            # invariance sweep, r14) are HIVE trees — the recursive
            # glob covers both (zero-or-more dirs), and DuckDB's
            # auto hive_partitioning surfaces tp_* partition columns,
            # which named-column oracle SQL never touches
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet"
            + ("/**/*.parquet')" if os.path.isdir(f"{sf_dir}/{t}.parquet") else "')")
        )

    # The full registry INCLUDING local_only exactness twins — the
    # driver-facing entry module filters those out, but the local gate
    # still value-checks them (typed mode); under --driver-canon their
    # expected failure is recorded as the r7 regression proof without
    # failing the run.
    from tailpipe_spark.queries import build_registry

    registry = build_registry()
    queries = {n: s.fn for n, s in registry.items()}
    oracles = {n: s.oracle for n, s in registry.items() if s.oracle is not None}
    local_only = {n for n, s in registry.items() if s.local_only}
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "fail", "err": f"spark: {e}"[:200]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        dec_cols = _decimal_cols(sdf.schema)
        if dec_cols and name not in local_only:
            # Lint (both modes): DECIMAL output columns are
            # driver-hash-unsafe; only local_only twins may surface them.
            failures.append(name)
            results[name] = {
                "status": "fail",
                "err": f"driver-unsafe DECIMAL surface: {dec_cols}",
            }
            print(f"FAIL {name}: driver-unsafe DECIMAL output columns {dec_cols}")
            continue
        cpx_cols = _complex_cols(sdf.schema)
        if cpx_cols and name not in local_only:
            # Lint (both modes): array/map/struct output columns crash the
            # driver's pandas row sort (r12 emb_quantize_int8 incident).
            failures.append(name)
            results[name] = {
                "status": "fail",
                "err": f"driver-unsafe complex surface: {cpx_cols}",
            }
            print(f"FAIL {name}: driver-unsafe complex output columns {cpx_cols}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(srows)}
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            orows, ocols = _duck_rows(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "fail", "err": f"duckdb: {e}"[:200]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        # Driver-canon rewrites the ORACLE side only (the driver's
        # pandas-style fetch converts DuckDB decimals to float64; Spark's
        # collect keeps Decimal) — reproducing the asymmetry exactly.
        sc, sv = _normalize([tuple(r) for r in srows], scols)
        oc, ov = _normalize(orows, ocols, driver_canon=driver_canon)
        if len(sv) != len(ov):
            failures.append(name)
            results[name] = {
                "status": "fail", "err": f"rowcount {len(sv)} vs {len(ov)}"
            }
            print(f"FAIL {name}: rowcount spark={len(sv)} duckdb={len(ov)}")
            continue
        if sc != oc:
            failures.append(name)
            results[name] = {"status": "fail", "err": "column mismatch"}
            print(f"FAIL {name}: columns spark={sc} duckdb={oc}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a != b:
                bad = (i, a, b)
                break
        if bad and driver_canon and name in local_only:
            # The r7 regression proof: a DECIMAL-surfaced twin diverging
            # under the driver's canonicalization is EXPECTED — it is why
            # the twin is local_only. Recorded, not a run failure.
            results[name] = {
                "status": "driver_unsafe_expected",
                "err": f"value diff at row {bad[0]} under driver canon",
            }
            print(f"note {name}: local_only twin diverges under --driver-canon "
                  f"(expected; row {bad[0]})")
        elif bad:
            failures.append(name)
            results[name] = {"status": "fail", "err": f"value diff at row {bad[0]}"}
            print(f"FAIL {name}: first diff at sorted row {bad[0]}")
            print(f"  cols : {sc}")
            print(f"  spark: {bad[1]}")
            print(f"  duck : {bad[2]}")
        else:
            results[name] = {"status": "hash_match", "rows": len(sv)}
            print(f"ok   {name}: {len(sv)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        import json as _json

        summary = {
            "sf_dir": sf_dir,
            "mode": "driver_canon" if driver_canon else "typed",
            "entries": len(results),
            "hash_match": sum(
                1 for r in results.values() if r["status"] == "hash_match"
            ),
            "rows_only": sum(
                1 for r in results.values() if r["status"] == "rows_only"
            ),
            "failures": len(failures),
            "results": results,
        }
        with open(json_out, "w") as f:
            _json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
