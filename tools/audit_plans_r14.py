"""r14 optimization round: registry-wide physical-plan audit.

Builds every registry entry's DataFrame at the given SF dir and greps
the executed-plan string for the scale-killer and Python-boundary
markers the optimization guide names (§4 BatchEvalPython/ArrowEval,
§3 CartesianProduct/BroadcastNestedLoopJoin, §2 Exchange counts), plus
scan-level pushdown evidence. One JSON line per entry to stdout;
summary at the end. This is the 'every operator examined' sweep —
entries flagged here get a manual look; clean entries are recorded
clean.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tailpipe_spark.queries import build_registry
from tailpipe_spark.session import build_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else ".bench/plan_audit_r14.json"
    spark = build_session("plan-audit")
    rows = {}
    for name, spec in build_registry().items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows[name] = {
                "exchanges": plan.count("Exchange hashpartitioning")
                + plan.count("Exchange rangepartitioning")
                + plan.count("Exchange SinglePartition"),
                "range_exchanges": plan.count("Exchange rangepartitioning"),
                "py_eval": plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython"),
                "map_in_arrow": plan.count("MapInArrow") + plan.count("MapInPandas"),
                "cartesian": plan.count("CartesianProduct"),
                "bnlj": plan.count("BroadcastNestedLoopJoin"),
                "smj": plan.count("SortMergeJoin"),
                "bhj": plan.count("BroadcastHashJoin"),
                "reused": plan.count("ReusedExchange"),
                "err": None,
            }
        except Exception as e:  # noqa: BLE001
            rows[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({name: rows[name]}), flush=True)
    flagged = {
        n: r
        for n, r in rows.items()
        if not r.get("err")
        and (r["py_eval"] or r["cartesian"] or r["bnlj"])
    }
    summary = {
        "entries": len(rows),
        "errors": sorted(n for n, r in rows.items() if r.get("err")),
        "py_eval_entries": sorted(n for n, r in rows.items() if r.get("py_eval")),
        "map_in_arrow_entries": sorted(
            n for n, r in rows.items() if r.get("map_in_arrow")
        ),
        "cartesian_or_bnlj": sorted(
            n for n, r in rows.items() if r.get("cartesian") or r.get("bnlj")
        ),
        "flagged": sorted(flagged),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump({"summary": summary, "entries": rows}, fh, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
