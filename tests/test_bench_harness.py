"""Outage-hardened bench.py orchestration (VERDICT r3 item 1).

The heavy paths are covered operationally (the CPU smoke run and the
real-outage structured record were exercised when the tunnel was down);
these tests pin the parsing/selection logic the driver capture depends
on, and the CPU smoke mode end to end.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_last_json_line_selection():
    sys.path.insert(0, str(REPO))
    import bench

    out = "\n".join(
        [
            "some log line",
            '{"metric": "first", "value": 1}',
            "WARNING: noise",
            '{"not_a_metric": true}',
            "{broken json",
            '{"metric": "last", "value": 2, "unit": "x"}',
            "trailing",
        ]
    )
    got = bench._last_json_line(out)
    assert got == {"metric": "last", "value": 2, "unit": "x"}
    assert bench._last_json_line("no json here") is None


@pytest.mark.slow
def test_cpu_smoke_mode_emits_one_json_line():
    """JAX_PLATFORMS=cpu + MSMD_BENCH_TINY=1 must run the measurement
    in-process (no tunnel probe) and print a parse-able metric line."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        MSMD_BENCH_TINY="1",
        MSMD_BENCH_STEPS="4",
        MSMD_BENCH_REPS="1",
        MSMD_BENCH_TRAIN="0",
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    obj = json.loads(line)
    assert obj["unit"] == "x_realtime" and obj["value"] > 0
    assert "error" not in obj
