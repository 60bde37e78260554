#!/usr/bin/env bash
# Hardware validation sweep (VERDICT round-2 item 1: the TPU-return checklist).
# Runs every bench configuration sequentially on the real TPU and appends the
# JSON lines to $OUT. Each step has its own timeout and failures don't stop
# the sweep. Run ALONE — concurrent CPU load starves the host side of the
# tunnel and corrupts the timing.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/hw_sweep_r05.jsonl}
LOG=${LOG:-/tmp/hw_sweep_r05.log}
: > "$LOG"

run() { # run <tag> <timeout_s> <env...> -- cmd...
  local tag=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  # one retry per row: the tunnel-attached device occasionally drops a
  # dispatch mid-run (round-3 sweep: one rc=1 on serve-q4-capacity whose
  # immediate retry passed). A retried row records "retried": 1 so flaky
  # rows stay visible instead of silently passing.
  local attempt line rc
  for attempt in 1 2; do
    echo "=== $tag attempt $attempt ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
    line=$(env "${envs[@]}" timeout "$to" "$@" 2>>"$LOG")
    rc=$?
    echo "$line" >> "$LOG"
    if [ $rc -eq 0 ] && [ -n "$line" ]; then
      local extra=""
      [ $attempt -eq 2 ] && extra=", \"retried\": 1"
      echo "{\"tag\": \"$tag\"$extra, \"result\": $(echo "$line" | tail -1)}" >> "$OUT"
      echo "$tag OK: $(echo "$line" | tail -1)"
      return
    fi
    echo "$tag attempt $attempt FAILED rc=$rc (see $LOG)"
  done
  echo "{\"tag\": \"$tag\", \"error\": \"rc=$rc after retry\"}" >> "$OUT"
}

if [ "${SKIP_Q8:-0}" != "1" ]; then
  run serve-q8    900 LLMI_BENCH_MODE=serve-q8 -- python bench.py
fi
run serve-q       900 LLMI_BENCH_MODE=serve-q  -- python bench.py
run serve-q4      900 LLMI_BENCH_MODE=serve-q4 -- python bench.py
run serve-q4-capacity 900 LLMI_BENCH_MODE=serve-q4 LLMI_FORCE_CAPACITY=1 -- python bench.py
run batch8        900 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_BATCH=8  -- python bench.py
run batch16       900 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_BATCH=16 -- python bench.py
run batch32       1200 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_BATCH=32 -- python bench.py
run batch32-perop 1200 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_BATCH=32 LLMI_NO_FUSED_DECODE=1 -- python bench.py
run batch32-paged-4k 1500 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_BATCH=32 LLMI_BENCH_PAGED=96 LLMI_BENCH_MAX_SEQ=4096 -- python bench.py
# same paged configuration with the paged batched megakernel gated OFF —
# isolates the r5 fused_decode_batch_paged.py win over the per-op paged path
run batch32-paged-4k-perop 1500 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_BATCH=32 LLMI_BENCH_PAGED=96 LLMI_BENCH_MAX_SEQ=4096 LLMI_NO_FUSED_DECODE=1 -- python bench.py
# BASELINE config 2: other checkpoint quantizations (Q8_0 1B, Q4_K 4B —
# the K-quant offset path of the masked-dot megakernel)
run q8_0-serve-q    1200 LLMI_BENCH_MODE=serve-q  LLMI_BENCH_FMT=q8_0 -- python bench.py
run q8_0-serve-q8   1200 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_FMT=q8_0 -- python bench.py
run q4_k-4b-serve-q4 2400 LLMI_BENCH_MODE=serve-q4 LLMI_BENCH_FMT=q4_k LLMI_BENCH_GEOM=4b -- python bench.py
# BASELINE config 3: 8k context at DEEP fill (7900-token prompts, decode
# runs 7932..8188) — paged pool sized for 8 lanes x 32 blocks
run batch8-paged-8k-deep 2400 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_BATCH=8 LLMI_BENCH_PAGED=264 LLMI_BENCH_MAX_SEQ=8192 LLMI_BENCH_PREFILL=7900 -- python bench.py
# the capacity flagship: 12B streamed megakernel (tools/capacity_demo.py)
run capacity-12b    3000 LLMI_CAP_JSON=1 -- python tools/capacity_demo.py 12b --generate 128
# gemma4-class geometry (per-layer inputs + shared KV): the r5 megakernel
# fast path (VERDICT r4 weak #6 — previously correctness-only, never benched)
run gemma4-serve-q8 1200 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_GEOM=g4 -- python bench.py
run gemma4-serve-q8-perop 1200 LLMI_BENCH_MODE=serve-q8 LLMI_BENCH_GEOM=g4 LLMI_NO_FUSED_DECODE=1 -- python bench.py
echo "sweep done -> $OUT"
