"""Run the reference-harness practical bar and record INTERIM_BAR.md.

The bar (BASELINE.md): ingest the reference's documented synthetic
benchmark spec `synthetic_50cols_2000000rows_10000chunk_100ms` (2M rows
x 50 mixed-type columns, 10k-row chunks delivered at 100 ms — reference
cmd/collect.go:268-373, collector_synthetic.go:84-234) end-to-end
through collect, compact within the guardrails, then answer the README
group-by (~1.45M-row aggregate answered interactively — README.md:93-118)
through the query CLI.

Everything goes through the real CLI verbs, not library shortcuts.

Run: python tools/interim_bar.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPEC = "synthetic_50cols_2000000rows_10000chunk_100ms"
TABLE = "synthetic_50cols_2000000rows"


def main() -> int:
    from tailpipe_spark import cli

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="interim_bar_")
    ws = os.path.join(work, "ws")

    import io
    from contextlib import redirect_stdout

    timings: dict[str, float] = {}

    t0 = time.time()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["--workspace", ws, "collect", SPEC])
    assert rc == 0, buf.getvalue()
    timings["collect_total_sec"] = round(time.time() - t0, 2)
    collect_stats = json.loads(buf.getvalue().strip().splitlines()[-1])

    t1 = time.time()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["--workspace", ws, "compact", TABLE])
    assert rc == 0, buf.getvalue()
    timings["compact_sec"] = round(time.time() - t1, 2)
    compact_out = buf.getvalue().strip()

    # README group-by: low-cardinality aggregate over the full table,
    # top group ~1M rows (README's CloudTrail example: 1.45M events,
    # 793,845-row top group), answered interactively
    q = (
        f"select col_3, count(*) as n from {TABLE} "
        "group by col_3 order by n desc"
    )
    t2 = time.time()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["--workspace", ws, "query", q, "--output", "table"])
    assert rc == 0
    timings["readme_groupby_sec"] = round(time.time() - t2, 2)
    result = buf.getvalue().strip()

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count()
    md = f"""# Interim practical bar — reference harness equivalent

Spec: `{SPEC}` (reference cmd/collect.go:268-373) run end-to-end through
the CLI on local[{cpus}], then compacted, then the README group-by
(README.md:93-118) answered through the query CLI.

| stage | wall sec | detail |
|---|---|---|
| collect (generate + chunked JSONL + ingest) | {timings['collect_total_sec']} | {collect_stats['rows']} rows, {collect_stats['chunks']} chunks, {collect_stats['rows_per_sec']} rows/s ingest ({collect_stats['collect_sec']}s ingest phase, {collect_stats['generate_sec']}s generate incl. {collect_stats['chunks']}x100ms delivery pacing) |
| compact | {timings['compact_sec']} | {compact_out.splitlines()[-1] if compact_out else ''} |
| README group-by (interactive) | {timings['readme_groupby_sec']} | full-table aggregate over {collect_stats['rows']} rows |

Group-by answer:

```
{result}
```

Notes: the collect stage includes synthetic data generation and the
reference's 100 ms per-chunk delivery pacing (~{collect_stats['chunks'] * 0.1:.0f}s
of sleep by design); `collect_sec` above is the pure ingest phase. The
query wall time includes Spark SQL planning + execution + streamed
rendering through the CLI — the interactive-latency claim the README
makes.
"""
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "INTERIM_BAR.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(md)
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
