"""Regenerate QUERIES.md from the live registry."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tailpipe_spark.queries import build_registry


def main() -> int:
    r = build_registry()
    lines = [
        "# Query / operator registry catalog",
        "",
        "Auto-generated from `tailpipe_spark.queries.build_registry()` "
        f"({len(r)} entries, {sum(1 for s in r.values() if s.oracle)} with a "
        "DuckDB value-hash oracle; the rest are rows-only by design — "
        "engine-specific hashes/sketches or floating accumulations with no "
        "portable SQL twin, each pinned by pytest instead). Regenerate with "
        "`python tools/gen_queries_md.py`.",
        "",
        "| # | entry | oracle | description |",
        "|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(r.items(), 1):
        o = "hash" if spec.oracle else "rows-only"
        lines.append(f"| {i} | `{name}` | {o} | {spec.description} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(r)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
