"""r14 optimization A/B: session-configuration levers (guide §1.2 step
3, §3.1, §2.3) measured over a query subset — one conf-set per process
(SparkSession confs like join preference are planner-level and must not
leak between variants; run this tool once per variant and compare).

    python tools/ab_r14_conf.py '<conf_json>' <query,query,...> [reps]

Env: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_CPUS. Prints one JSON line
with min-of-reps per query under the given conf overrides.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tailpipe_spark.queries import build_registry
from tailpipe_spark.session import build_session


def main():
    conf = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    names = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["q05_local_supplier"])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench/sf10")
    spark = build_session("ab-conf", extra_conf=conf)
    registry = build_registry()
    out = {"sf_dir": sf_dir, "conf": conf, "queries": {}}
    for name in names:
        fn = registry[name].fn
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(reps):
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        out["queries"][name] = {
            "min": round(min(times), 3),
            "reps": [round(t, 3) for t in times],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
