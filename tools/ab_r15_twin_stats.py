"""r15: which planner inputs should a provisioned bucketed registration
carry? Interleaved A/B over the sf10 twin for the two levers:

- ``stats``: NOSCAN size stats on the registration (planner may
  broadcast a fact side whose byte-estimate slips under the threshold —
  q12's 15M-row orders broadcast) vs no stats (every bucket-key join is
  the co-located SMJ).
- ``ord``: spark.sql.legacy.bucketedTableScan.outputOrdering — with
  exactly one file per bucket (our compact layout) the scan can report
  its SORTED BY order and the co-located SMJ drops both per-task Sorts.

Arms are toggled at runtime: stats via ANALYZE NOSCAN / alterTableStats
(ident, None); ordering via session conf. Every rep rebuilds the frame.

Usage: python tools/ab_r15_twin_stats.py [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
from tailpipe_spark.catalog import Catalog
from tailpipe_spark.queries import build_registry
from tailpipe_spark.session import build_session

TWIN = os.path.abspath(".bench/sf10_bucketed_twin")
WS = os.path.abspath(".bench/ws_sf10_coarse")
NAMES = [
    "q05_local_supplier",
    "q03_shipping_priority",
    "q12_priority_shipping",
    "q_topk_window",
]
ARMS = {
    "stats_ord": (True, True),
    "stats_noord": (True, False),
    "nostats_ord": (False, True),
    "nostats_noord": (False, False),
}


def main() -> int:
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    total = B._input_bytes(TWIN)
    spark = build_session(
        "ab-r15-twin-stats", shuffle_partitions=B._auto_shuffle_partitions(total)
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(B._auto_max_partition_bytes(total))
    )
    registry = build_registry()
    cat = Catalog(WS)
    # force registrations to exist
    for t in ("orders", "lineitem"):
        cat.read_table(spark, t)
    regs = {
        t: cat._bucketed_reg_name(t, int(cat.table_layout(t)["layout_rev"]))
        for t in ("orders", "lineitem")
    }
    jvm = spark._jvm
    jcat = spark._jsparkSession.sessionState().catalog()

    def set_arm(stats: bool, ordering: bool) -> None:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering",
            "true" if ordering else "false",
        )
        for t, reg in regs.items():
            if stats:
                spark.sql(f"ANALYZE TABLE `{reg}` COMPUTE STATISTICS NOSCAN")
            else:
                ident = jvm.org.apache.spark.sql.catalyst.TableIdentifier(reg)
                jcat.alterTableStats(ident, jvm.scala.Option.empty())
        spark.catalog.clearCache()
        # invalidate cached relation metadata so the next plan re-reads stats
        for reg in regs.values():
            spark.catalog.refreshTable(reg)

    # warm each (query, arm)
    for arm, (st, od) in ARMS.items():
        set_arm(st, od)
        for n in NAMES:
            registry[n].fn(spark, TWIN).write.format("noop").mode("overwrite").save()

    times = {n: {a: [] for a in ARMS} for n in NAMES}
    load0, t0 = B._loadavg(), B._cpu_ticks()
    for _ in range(reps):
        for arm, (st, od) in ARMS.items():
            set_arm(st, od)
            for n in NAMES:
                spark.catalog.clearCache()
                df = registry[n].fn(spark, TWIN)
                t = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times[n][arm].append(time.perf_counter() - t)
    t1 = B._cpu_ticks()
    d_busy, d_idle, d_steal = t1[0] - t0[0], t1[1] - t0[1], t1[2] - t0[2]
    payload = {
        "reps": reps,
        "mins": {
            n: {a: round(min(v), 3) for a, v in arms.items()}
            for n, arms in times.items()
        },
        "all": {
            n: {a: [round(x, 3) for x in v] for a, v in arms.items()}
            for n, arms in times.items()
        },
        "telemetry": {
            "loadavg_start": load0,
            "loadavg_end": B._loadavg(),
            "steal_pct": (
                round(100.0 * d_steal / (d_busy + d_idle), 2)
                if (d_busy + d_idle) > 0 else None
            ),
        },
    }
    with open(".bench/AB_r15_twin_stats.json", "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"mins": payload["mins"],
                      "telemetry": payload["telemetry"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
