"""Marker-gating of the flagship-geometry multichip dryrun (VERDICT r4
item 1: the round-4 driver record was rc=124 because the flagship
subprocess outlived the driver's wall budget; the gate must make that
impossible on a cold machine)."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from __graft_entry__ import _flagship_gate  # noqa: E402


def test_gate_skips_without_marker(tmp_path):
    run_timeout, reason = _flagship_gate(str(tmp_path / "missing.json"), 240.0)
    assert run_timeout is None
    assert "no warm-compile-cache marker" in reason


def test_gate_skips_on_corrupt_marker(tmp_path):
    p = tmp_path / "m.json"
    p.write_text("{not json")
    assert _flagship_gate(str(p), 240.0)[0] is None
    p.write_text(json.dumps({"wrong_key": 1}))
    assert _flagship_gate(str(p), 240.0)[0] is None
    p.write_text(json.dumps({"wall_s": None}))
    assert _flagship_gate(str(p), 240.0)[0] is None


def test_gate_opens_when_warm_run_fits(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps({"wall_s": 100.0, "n_devices": 8}))
    run_timeout, reason = _flagship_gate(str(p), 240.0)
    assert reason is None
    # 1.3x + 30 s headroom over the recorded warm wall
    assert abs(run_timeout - 160.0) < 1e-6


def test_gate_skips_when_warm_run_does_not_fit(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps({"wall_s": 500.0}))
    run_timeout, reason = _flagship_gate(str(p), 240.0)
    assert run_timeout is None
    assert "680s needed > 240s budget" in reason
