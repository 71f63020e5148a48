#!/bin/bash
# Round-5 on-silicon measurement batch (VERDICT r4 items 2-6).
# Run the moment the axon TPU tunnel is up:  bash scripts/tpu_measure_r5.sh
# Appends one JSON line per measurement to $OUT (default
# /tmp/r5_measurements.jsonl), tagged, resilient to individual failures,
# idempotent across tunnel flaps (re-runs skip already-measured tags).
# Ordered by priority: batch-1 (the 49.8x->50x gap), training knob
# combos (MFU), batch-48 knobs, long-form windows, serving probes.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r5_measurements.jsonl}
echo "=== tpu_measure_r5 $(date -u +%FT%TZ) -> $OUT ==="

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  if [ -f "$OUT" ] && grep -q "^{\"tag\":\"$tag\",\"wall_s\":[0-9]*,\"result\"" "$OUT"; then
    echo "--- [$tag] already measured, skip"
    return 0
  fi
  echo "--- [$tag] $*"
  local t0=$SECONDS
  local out
  out=$(timeout "$to" env "$@" 2>/tmp/r5_err.log)
  local rc=$?
  local line
  line=$(printf '%s\n' "$out" | grep -E '^\{' | tail -1)
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    printf '{"tag":"%s","wall_s":%d,"result":%s}\n' "$tag" $((SECONDS-t0)) "$line" >> "$OUT"
    echo "    OK ${line:0:160}"
  else
    printf '{"tag":"%s","wall_s":%d,"error":"rc=%d %s"}\n' "$tag" $((SECONDS-t0)) $rc \
      "$(tail -1 /tmp/r5_err.log | tr '"' "'" | cut -c1-200)" >> "$OUT"
    echo "    FAIL rc=$rc (see /tmp/r5_err.log)"
  fi
}

BI="python bench.py"          # inner mode for sweeps (no probe, no train)
BT="python benchmarks/bench_train.py"
SP="python benchmarks/serving_probe.py"

# ---- A: batch-1 scan-kernel knob sweep (target: >=50x) ----------------
S1="MSMD_BENCH_INNER=1 MSMD_BENCH_TRAIN=0 MSMD_BENCH_REPS=1"
run b1_default        1800 $S1 $BI
run b1_vmw_f32        1800 $S1 MSMD_VMW_F32=1 $BI
run b1_no_pad         1800 $S1 MSMD_SCAN_PAD=0 $BI
run b1_no_concat      1800 $S1 MSMD_SCAN_CONCAT=0 $BI
run b1_f32_nopad      1800 $S1 MSMD_VMW_F32=1 MSMD_SCAN_PAD=0 $BI
run b1_default_again  1800 $S1 MSMD_TAG=again $BI
run b1_blockdiag      1800 $S1 MSMD_SCAN_BLOCKDIAG=1 $BI
run b1_merged_person  1800 $S1 MSMD_MERGED_PERSON=1 $BI
run b1_bd_mp          1800 $S1 MSMD_SCAN_BLOCKDIAG=1 MSMD_MERGED_PERSON=1 $BI
run b1_bd_mp_f32      1800 $S1 MSMD_SCAN_BLOCKDIAG=1 MSMD_MERGED_PERSON=1 MSMD_VMW_F32=1 $BI
run b1_bd_nopad       1800 $S1 MSMD_SCAN_BLOCKDIAG=1 MSMD_SCAN_PAD=0 $BI
run b1_bd_mp_nopad    1800 $S1 MSMD_SCAN_BLOCKDIAG=1 MSMD_MERGED_PERSON=1 MSMD_SCAN_PAD=0 $BI

# ---- B: training knobs at the paper config (MFU target >=0.30) ---------
# NOTE: identity-band training became the bench_train DEFAULT mid-round
# (config.py r5 promotion); these tags predate that, so band is pinned
# off explicitly to keep the tag names truthful.
run train_baseline    2400 MSMD_TRAIN_IDENTITY_BAND=0 $BT
run train_2clip       2400 MSMD_TRAIN_IDENTITY_BAND=0 MSMD_TRAIN_TWO_CLIP=1 $BT
run train_fused_ffn   2400 MSMD_TRAIN_IDENTITY_BAND=0 MSMD_TRAIN_FUSED_FFN=1 $BT
run train_2clip_ffn   2400 MSMD_TRAIN_IDENTITY_BAND=0 MSMD_TRAIN_TWO_CLIP=1 MSMD_TRAIN_FUSED_FFN=1 $BT
run train_band        2400 MSMD_TRAIN_IDENTITY_BAND=1 $BT
run train_ffn_band    2400 MSMD_TRAIN_FUSED_FFN=1 MSMD_TRAIN_IDENTITY_BAND=1 $BT
run train_2clip_band  2400 MSMD_TRAIN_TWO_CLIP=1 MSMD_TRAIN_IDENTITY_BAND=1 $BT
run train_2clip_all   2400 MSMD_TRAIN_TWO_CLIP=1 MSMD_TRAIN_FUSED_FFN=1 MSMD_TRAIN_IDENTITY_BAND=1 $BT
run train_remat       2400 MSMD_TRAIN_REMAT=1 $BT

# ---- C: batch-48 throughput knobs --------------------------------------
S48="MSMD_BENCH_INNER=1 MSMD_BENCH_TRAIN=0"
run b48_default       2700 $S48 $BI
run b48_merged_person 1800 $S48 MSMD_MERGED_PERSON=1 $BI
run b48_decoder_pad   1800 $S48 MSMD_DECODER_PAD=1 $BI
run b48_resident      1800 $S48 MSMD_DECODER_RESIDENT=1 $BI
run b48_no_vmw        1800 $S48 MSMD_VMW_HOIST=0 $BI

# ---- D: long-form multi-window real-time factor ------------------------
run b1_windows5       2400 $S1 MSMD_BENCH_WINDOWS=5 $BI
run b48_windows5      2400 $S48 MSMD_BENCH_WINDOWS=5 $BI

# ---- E: multi-stream serving batcher aggregate rate ---------------------
run serve_48slots     2400 MSMD_SERVE_SLOTS=48 $SP
run serve_16slots     1800 MSMD_SERVE_SLOTS=16 $SP

# ---- F: train-MFU attribution probe (multi-line output -> its own file) -
if ! grep -q '"mfu_probe_done"' "$OUT" 2>/dev/null; then
  echo "--- [mfu_probe] train_mfu_probe.py -> /tmp/r5_mfu_probe.jsonl"
  if timeout 2400 python benchmarks/train_mfu_probe.py > /tmp/r5_mfu_probe.jsonl 2>/tmp/r5_err.log; then
    echo '{"tag":"mfu_probe_done","result":"see /tmp/r5_mfu_probe.jsonl"}' >> "$OUT"
  else
    echo "    FAIL (see /tmp/r5_err.log)"
  fi
fi

TOTAL=$(($(grep -c '^run ' "$0") + 1))  # +1: the mfu_probe block above
OKC=$(grep -c '^{"tag":.*,"result":' "$OUT" 2>/dev/null || echo 0)
echo "=== done; $OKC/$TOTAL measured OK; results in $OUT ==="
cat "$OUT"
[ "$OKC" -ge "$TOTAL" ]
