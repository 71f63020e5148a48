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


def test_orchestrator_field_assembly(monkeypatch, capsys):
    """main() with a live (stubbed) tunnel assembles every section's
    fields into the one driver JSON line — incl. the r5 serving section."""
    sys.path.insert(0, str(REPO))
    import bench

    def fake_run_sub(cmd, timeout, extra_env=None):
        joined = " ".join(cmd)
        if "serving_probe.py" in joined:
            assert (extra_env or {}).get("MSMD_SERVE_SLOTS") == "16"
            assert (extra_env or {}).get("MSMD_SERVE_DEPTH") == "8"
            return 0, json.dumps({
                "metric": "StreamingBatcher aggregate (16 slots, bfloat16, pipeline_depth=8)",
                "value": 93.2, "unit": "audio-seconds/sec", "per_stream_rt": 5.82,
            }), ""
        if "real_asset_parity.py" in joined:
            return 0, json.dumps({"aggregate": {"coef_max_err": 3.1e-15, "vertex_mse": 0.0}}), ""
        if "bench_train.py" in joined:
            return 0, json.dumps({
                "metric": "train", "value": 8.3, "pipelined_steps_per_sec": 10.2,
                "mfu_pipelined_vs_197tflops": 0.31, "mfu_vs_197tflops": 0.25,
            }), ""
        # headline / batch-1 inner measurement
        reps = (extra_env or {}).get("MSMD_BENCH_REPS", "48")
        val = 52.3 if reps == "1" else 97.3
        return 0, json.dumps({
            "metric": "audio->FLAME vertices", "value": val, "unit": "x_realtime",
            "vs_baseline": val / 50.0, "window_wall_s": 0.08,
        }), ""

    monkeypatch.setattr(bench, "_run_sub", fake_run_sub)
    monkeypatch.setattr(bench, "_probe_tpu", lambda timeout: True)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("MSMD_BENCH_INNER", raising=False)
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    obj = json.loads(line)
    assert obj["value"] == 97.3 and obj["batch1_rtf"] == 52.3
    assert obj["serving_agg_audio_sec_per_sec"] == 93.2
    assert obj["serving_per_stream_rt"] == 5.82
    assert "pipeline_depth=8" in obj["serving_metric"]
    assert obj["parity_f64_vertex_mse"] == 0.0
    assert obj["train_mfu_vs_197tflops"] == 0.31
    assert obj["train_mfu_synced"] == 0.25
    for k in ("serving_error", "batch1_error", "parity_error", "train_error"):
        assert k not in obj


def test_sigterm_partial_emit(capsys):
    """A driver-side kill mid-capture must still yield a JSON line: the
    latest completed superset if the headline landed, else a structured
    error record. (os._exit is intercepted so the test survives.)"""
    sys.path.insert(0, str(REPO))
    import bench

    class _Exit(BaseException):
        pass

    real_exit = os._exit
    os._exit = lambda code: (_ for _ in ()).throw(_Exit())
    try:
        state = {"result": {"metric": "m", "value": 97.3, "batch1_rtf": 52.3}}
        with pytest.raises(_Exit):
            bench._emit_partial_and_exit(state, 15)
        obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert obj["value"] == 97.3 and obj["batch1_rtf"] == 52.3
        assert "signal 15" in obj["partial"]

        with pytest.raises(_Exit):
            bench._emit_partial_and_exit({"result": None}, 15)
        obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert obj["error"] == "killed_before_headline" and obj["value"] == 0.0
    finally:
        os._exit = real_exit


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
