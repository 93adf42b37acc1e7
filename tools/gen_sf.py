"""Generate a larger bench dataset by key-offset replication of
/root/testdata/sf0.1 (the driver's generator isn't reproducible here,
and /root/testdata is read-only).

Purpose: settle the Spark-vs-DuckDB headline ratio at a scale where the
per-query JVM job floor (~0.1-0.2 s) amortizes — both engines run
IDENTICAL SQL over the SAME files, so the ratio is apples-to-apples
regardless of how the data was synthesized.

Replication semantics (K copies, default 10 → "sf1"):
- fact tables (lineitem/orders/events) replicate with key offsets of
  copy*10^7 on orderkey/custkey/suppkey/partkey/event_id and
  copy*10^4 on user_id, so join fan-outs and group cardinalities scale
  like real growth (10x keys, same per-key density), not 10x density.
- dimensions (customer/supplier/part) replicate with the same offsets;
  region/nation stay fixed (they are fixed-size in TPC-H too).
- documents: copy>0 texts pass through a per-copy vowel permutation
  (F.translate), so copies are NOT near-duplicates of each other —
  replicating verbatim would add ~K^2 planted cross-copy pairs per
  bucket and turn the dedup benches into a quadratic pair-explosion
  workload no real corpus growth produces. Within-copy duplicate
  structure is preserved (both members of a planted pair get the same
  translation).
- embeddings: per-copy deterministic element jitter (+sin(i*copy)*1e-2)
  keeps norms ~unchanged while making copies distinct neighbors.

Timestamps are rewritten as TIMESTAMP_MICROS (the engine's write
default); both engines read them natively.

Run: python tools/gen_sf.py [K] [out_dir]   (defaults: 10 .bench/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tailpipe_spark.session import build_session, read_table

SRC = "/root/testdata/sf0.1"
KEY_OFF = 10_000_000
USER_OFF = 10_000

#: per-copy vowel permutations (copy 0 = identity)
_VOWELS = "aeiou"
_PERMS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
          "aeuio", "eiaou", "ioeua", "ouiae", "uoaei"]
#: second-stage consonant rotations for k>10 (tier 0 = identity):
#: rotations of a fixed consonant set, applied on top of the vowel perm
_CONS = "bcdfghjklm"
_CONS_ROT = [_CONS[i:] + _CONS[:i] for i in range(10)]


def _copies(spark, df, k):
    return [(c, df) for c in range(k)]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf1"
    )
    os.makedirs(out, exist_ok=True)
    spark = build_session("gen-sf", shuffle_partitions=32)

    def load(t):
        return read_table(spark, f"{SRC}/{t}.parquet")

    def write(df, t, parts=8):
        # timestamps as NTZ like the driver's testdata: Spark writes
        # TimestampType as isAdjustedToUTC=true, which DuckDB then
        # surfaces as TIMESTAMPTZ and tz-aware values break typed
        # oracle comparison against Spark's naive timestamps
        for f_ in df.schema.fields:
            if f_.dataType.typeName() == "timestamp":
                df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp_ntz"))
        df.repartition(parts).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print("wrote", t)

    # fixed dims copied verbatim
    for t in ("region", "nation"):
        write(load(t), t, parts=1)

    def rep(t, shift_cols, extra=None):
        """Union k copies with key offsets; ``extra(df, c)`` applies
        further per-copy transforms."""
        df = load(t)
        parts = []
        for c in range(k):
            d = df
            for col, off in shift_cols.items():
                d = d.withColumn(col, (F.col(col) + F.lit(c * off)).cast("long"))
            if extra is not None:
                d = extra(d, c)
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    write(rep("customer", {"c_custkey": KEY_OFF}), "customer")
    write(rep("supplier", {"s_suppkey": KEY_OFF}), "supplier")
    write(rep("part", {"p_partkey": KEY_OFF}), "part")
    write(rep("orders", {"o_orderkey": KEY_OFF, "o_custkey": KEY_OFF}), "orders")
    write(
        rep(
            "lineitem",
            {"l_orderkey": KEY_OFF, "l_partkey": KEY_OFF, "l_suppkey": KEY_OFF},
        ),
        "lineitem",
        parts=16,
    )
    write(
        rep("events", {"event_id": KEY_OFF, "user_id": USER_OFF}),
        "events",
    )

    def doc_extra(d, c):
        if c == 0:
            return d
        out_col = F.translate("text", _VOWELS, _PERMS[c % len(_PERMS)])
        # k>10 reuses vowel perms (c%10 cycles): copies 10,20,... would
        # otherwise be VERBATIM cross-copy duplicates of copy 0 — the
        # quadratic planted-pair explosion this generator exists to
        # avoid. A second transform keyed by c//10 (consonant rotation)
        # makes all 100 per-copy transforms distinct; c<10 keeps the
        # identity second stage, so sf1 regenerates byte-identically.
        tier = (c // len(_PERMS)) % len(_CONS_ROT)
        if tier:
            out_col = F.translate(out_col, _CONS, _CONS_ROT[tier])
        return d.withColumn("text", out_col)

    write(rep("documents", {"doc_id": KEY_OFF}, extra=doc_extra), "documents")

    def emb_extra(d, c):
        if c == 0:
            return d
        return d.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> cast(x + sin(i * {c}) * 0.01 as float))"
            ),
        )

    write(rep("embeddings", {"vec_id": KEY_OFF}, extra=emb_extra), "embeddings")

    for t in sorted(os.listdir(out)):
        sz = sum(
            os.path.getsize(os.path.join(out, t, f))
            for f in os.listdir(os.path.join(out, t))
            if f.endswith(".parquet")
        ) if os.path.isdir(os.path.join(out, t)) else os.path.getsize(os.path.join(out, t))
        print(f"{t}: {sz/1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
