"""r15 AQE coalescing/config pass (r14 verdict asks #3 and #6): sweep
`spark.sql.adaptive.advisoryPartitionSizeInBytes` (plus the
parallelismFirst toggle and the AQE-off bound) over the heavy sf10
entries in ONE session with interleaved reps, so the known ~25% AQE
stage-materialization overhead on dedup_ngram_jaccard either yields to
a principled config or gets a final measured-negative receipt.

Arms are runtime-settable session confs; every rep rebuilds the
DataFrame so the plan sees the arm's conf. Interleaving (arm-major
within each rep round) keeps box-noise drift shared across arms.

Usage: python tools/ab_r15_aqe.py [--reps N] [--sf DIR] [names...]
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

DEFAULT_NAMES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_fast",
    "q_range_join",
    "q03_shipping_priority",
]

ARMS: dict[str, dict[str, str]] = {
    "base_adv64m": {},
    "adv16m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"},
    "adv8m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
    "adv1m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m"},
    "sizefirst64m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
}
BASE = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
}


def main() -> int:
    reps, sf = 3, ".bench/sf10"
    names = []
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--sf"):
            sf = a.split("=", 1)[1]
        else:
            names.append(a)
    names = names or DEFAULT_NAMES
    sf = os.path.abspath(sf)

    total = B._input_bytes(sf)
    spark = build_session(
        "ab-r15-aqe", shuffle_partitions=B._auto_shuffle_partitions(total)
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(B._auto_max_partition_bytes(total))
    )
    registry = build_registry()

    def set_arm(overrides: dict[str, str]) -> None:
        for k, v in {**BASE, **overrides}.items():
            spark.conf.set(k, v)

    times = {n: {a: [] for a in ARMS} for n in names}
    # warm each (query, arm) once
    for n in names:
        for arm, ov in ARMS.items():
            set_arm(ov)
            registry[n].fn(spark, sf).write.format("noop").mode("overwrite").save()

    load0, t0 = B._loadavg(), B._cpu_ticks()
    for _ in range(reps):
        for n in names:
            for arm, ov in ARMS.items():
                set_arm(ov)
                spark.catalog.clearCache()
                df = registry[n].fn(spark, sf)
                t = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times[n][arm].append(time.perf_counter() - t)
    t1 = B._cpu_ticks()
    set_arm({})
    d_busy, d_idle, d_steal = t1[0] - t0[0], t1[1] - t0[1], t1[2] - t0[2]
    payload = {
        "sf": sf,
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
    with open(".bench/AB_r15_aqe.json", "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"mins": payload["mins"],
                      "telemetry": payload["telemetry"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
