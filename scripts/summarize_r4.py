#!/usr/bin/env python
"""Summarize the round-4 measurement batch (scripts/tpu_measure_r4.sh)
into a markdown table for BENCH.md / KNOBS.md updates.

Usage: python scripts/summarize_r4.py [/tmp/r4_measurements.jsonl]
"""

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_measurements.jsonl"
    rows = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            rows.append(json.loads(line))
        except ValueError:
            print(f"unparseable: {line[:120]}", file=sys.stderr)

    print("| tag | value | unit | extra | wall s |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['tag']} | ERROR | — | {r['error'][:80]} | {r.get('wall_s', '?')} |")
            continue
        res = r["result"]
        extra = []
        for k in ("frames_per_sec", "window_wall_s", "train_audio_seconds_per_sec",
                  "step_wall_s", "mfu_vs_197tflops", "vs_baseline"):
            if res.get(k) is not None:
                extra.append(f"{k}={res[k]}")
        print(f"| {r['tag']} | {res.get('value')} | {res.get('unit')} | {', '.join(extra)} | {r.get('wall_s', '?')} |")


if __name__ == "__main__":
    main()
