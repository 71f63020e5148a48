#!/bin/bash
# Round-4 on-silicon measurement batch (VERDICT r3 items 1-4, 8).
# Run the moment the axon TPU tunnel is up:  bash scripts/tpu_measure_r4.sh
# Appends one JSON line per measurement to $OUT (default
# /tmp/r4_measurements.jsonl), tagged, resilient to individual failures.
# Ordered by priority: batch-1 knob sweep (47x->50x gap), batch-48
# throughput knobs, training knobs, long-form, serving; the orchestrated
# headline (redundant with the driver's end-of-round capture) runs last.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r4_measurements.jsonl}
echo "=== tpu_measure_r4 $(date -u +%FT%TZ) -> $OUT ==="

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  # idempotent re-runs: a tag that already has a successful result is
  # skipped, so the watcher can re-invoke this script after every
  # tunnel flap until the whole batch is complete
  if [ -f "$OUT" ] && grep -q "\"tag\":\"$tag\",\"wall_s\":[0-9]*,\"result\"" "$OUT"; then
    echo "--- [$tag] already measured, skip"
    return 0
  fi
  echo "--- [$tag] $*"
  local t0=$SECONDS
  local out
  out=$(timeout "$to" env "$@" 2>/tmp/r4_err.log)
  local rc=$?
  local line
  line=$(printf '%s\n' "$out" | grep -E '^\{' | tail -1)
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    printf '{"tag":"%s","wall_s":%d,"result":%s}\n' "$tag" $((SECONDS-t0)) "$line" >> "$OUT"
    echo "    OK ${line:0:160}"
  else
    printf '{"tag":"%s","wall_s":%d,"error":"rc=%d %s"}\n' "$tag" $((SECONDS-t0)) $rc \
      "$(tail -1 /tmp/r4_err.log | tr '"' "'" | cut -c1-200)" >> "$OUT"
    echo "    FAIL rc=$rc (see /tmp/r4_err.log)"
  fi
}

B="python bench.py"           # headline (orchestrated)
BI="python bench.py"          # inner mode for sweeps (no probe, no train)
LP="python benchmarks/latency_probe.py"
BT="python benchmarks/bench_train.py"

# ---- B: batch-1 scan-kernel knob sweep (target: >=50x) ----------------
S1="MSMD_BENCH_INNER=1 MSMD_BENCH_TRAIN=0 MSMD_BENCH_REPS=1"
run b1_default        1800 $S1 $BI
run b1_merged_heads   1800 $S1 MSMD_MERGED_HEADS=1 $BI
run b1_no_concat      1800 $S1 MSMD_SCAN_CONCAT=0 $BI
run b1_no_pad         1800 $S1 MSMD_SCAN_PAD=0 $BI
run b1_mh_and_concat0 1800 $S1 MSMD_MERGED_HEADS=1 MSMD_SCAN_CONCAT=0 $BI
run b1_vmw_f32        1800 $S1 MSMD_VMW_F32=1 $BI

# ---- D: batch-48 throughput knobs --------------------------------------
S48="MSMD_BENCH_INNER=1 MSMD_BENCH_TRAIN=0"
run b48_default       1800 $S48 $BI
run b48_merged_person 1800 $S48 MSMD_MERGED_PERSON=1 $BI
run b48_decoder_pad   1800 $S48 MSMD_DECODER_PAD=1 $BI
run b48_resident      1800 $S48 MSMD_DECODER_RESIDENT=1 $BI
run b48_no_vmw        1800 $S48 MSMD_VMW_HOIST=0 $BI

# ---- C: training knobs at the paper config ----------------------------
run train_baseline    2400 $BT
run train_fused_ffn   2400 MSMD_TRAIN_FUSED_FFN=1 $BT
run train_band        2400 MSMD_TRAIN_IDENTITY_BAND=1 $BT
run train_ffn_band    2400 MSMD_TRAIN_FUSED_FFN=1 MSMD_TRAIN_IDENTITY_BAND=1 $BT
run train_remat       2400 MSMD_TRAIN_REMAT=1 $BT
run train_2clip       2400 MSMD_TRAIN_TWO_CLIP=1 $BT
run train_2clip_ffn   2400 MSMD_TRAIN_TWO_CLIP=1 MSMD_TRAIN_FUSED_FFN=1 $BT
run train_2clip_band  2400 MSMD_TRAIN_TWO_CLIP=1 MSMD_TRAIN_IDENTITY_BAND=1 $BT
run train_2clip_all   2400 MSMD_TRAIN_TWO_CLIP=1 MSMD_TRAIN_FUSED_FFN=1 MSMD_TRAIN_IDENTITY_BAND=1 $BT

# ---- E: long-form multi-window real-time factor ------------------------
run b1_windows5       2400 $S1 MSMD_BENCH_WINDOWS=5 $BI
run b48_windows5      2400 $S48 MSMD_BENCH_WINDOWS=5 $BI

# ---- F: multi-stream serving batcher aggregate rate ---------------------
SP="python benchmarks/serving_probe.py"
run serve_48slots     2400 MSMD_SERVE_SLOTS=48 $SP
run serve_16slots     1800 MSMD_SERVE_SLOTS=16 $SP

# ---- A (last): driver-headline recapture (incl. training + parity
#         fields) -- redundant with the driver's own end-of-round
#         capture, so it runs after every sweep row has landed ---------
run headline_default 5400 MSMD_BENCH_TRAIN=1 $B

# ADVICE r4: compute TOTAL from the script itself, and count only
# success LINES (an inner payload containing a "result" key must not
# inflate the count)
TOTAL=$(grep -c '^run ' "$0")
OKC=$(grep -c '^{"tag":.*,"result":' "$OUT" 2>/dev/null || echo 0)
echo "=== done; $OKC/$TOTAL measured OK; results in $OUT ==="
cat "$OUT"
[ "$OKC" -ge "$TOTAL" ]
