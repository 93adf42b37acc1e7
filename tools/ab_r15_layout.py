"""r15 interleaved layout A/B: the UNMODIFIED registry entries over the
plain sf10 fixture vs the provisioned bucketed twin, alternating reps in
ONE session so box-noise drift hits both arms equally (the r14 capture
discipline). Value identity is asserted before timing (exact surfaces;
q01_fast's double sums are order-dependent by design and excluded).

Usage: python tools/ab_r15_layout.py [--reps N] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
from tailpipe_spark.queries import build_registry
from tailpipe_spark.session import build_session

PLAIN = os.path.abspath(".bench/sf10")
TWIN = os.path.abspath(".bench/sf10_bucketed_twin")
DEFAULT = ["q03_shipping_priority", "q05_local_supplier", "q_topk_window"]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--reps")]
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    names = args or DEFAULT

    total = B._input_bytes(PLAIN)
    spark = build_session(
        "ab-r15-layout", shuffle_partitions=B._auto_shuffle_partitions(total)
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(B._auto_max_partition_bytes(total))
    )
    registry = build_registry()

    times: dict[str, dict[str, list[float]]] = {
        n: {"plain": [], "twin": []} for n in names
    }
    # warm both arms once
    for n in names:
        for d in (PLAIN, TWIN):
            registry[n].fn(spark, d).write.format("noop").mode("overwrite").save()

    load0, t0 = B._loadavg(), B._cpu_ticks()
    for _ in range(reps):
        for n in names:
            for arm, d in (("plain", PLAIN), ("twin", TWIN)):
                spark.catalog.clearCache()
                df = registry[n].fn(spark, d)
                t = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times[n][arm].append(time.perf_counter() - t)
    t1 = B._cpu_ticks()
    d_busy, d_idle, d_steal = (
        t1[0] - t0[0], t1[1] - t0[1], t1[2] - t0[2],
    )
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
    with open(".bench/AB_r15_layout.json", "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"mins": payload["mins"],
                      "telemetry": payload["telemetry"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
