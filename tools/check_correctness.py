"""Local replica of the driver's oracle harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same parquet dir, then compares row count, column
names, and order-insensitive values (column-name-sorted, stringified,
row-sorted). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
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
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session("correctness-check")
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
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
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sc, sv = _normalize([tuple(r) for r in srows], scols)
        oc, ov = _normalize(orows, ocols)
        if len(sv) != len(ov):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sv)} duckdb={len(ov)}")
            continue
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duckdb={oc}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: first diff at sorted row {bad[0]}")
            print(f"  cols : {sc}")
            print(f"  spark: {bad[1]}")
            print(f"  duck : {bad[2]}")
        else:
            print(f"ok   {name}: {len(sv)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
