"""Pins the bench stdout contract: the driver captures only the last
~2000 characters of stdout and parses the LAST line as JSON. BENCH_r06
and BENCH_r07 both arrived `parsed: None` because the full payload
(per-rep arrays included) overflowed that window and got
front-truncated. The contract is therefore: last stdout line is a
single compact JSON object under 1900 chars carrying the driver-facing
metrics; the complete record goes to $SPARK_GRAFT_BENCH_OUT.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_last_stdout_line_is_compact_json(tmp_path):
    out_file = tmp_path / "bench_full.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_OUT=str(out_file),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=560,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench printed nothing to stdout"
    last = lines[-1]
    # the driver's tail window is ~2000 chars; stay safely inside it
    assert len(last) < 1900, f"stdout JSON line too long: {len(last)} chars"
    parsed = json.loads(last)
    assert parsed["metric"] == "headline_query_wall_sec"
    assert parsed["unit"] == "sec"
    assert isinstance(parsed["value"], (int, float))
    assert parsed["sf"] == 0.001
    assert "queries" in parsed and parsed["queries"]
    # per-rep arrays are file-only — they are what overflowed the window
    assert "queries_detail" not in parsed

    full = json.loads(out_file.read_text())
    assert "queries_detail" in full
    assert set(parsed["queries"]) <= set(full["queries"])
