#!/usr/bin/env bash
# TPU profiler wrapper (the reference's profile.sh equivalent): captures an
# XLA/jax.profiler trace of a benchmark run for xprof/tensorboard.
#   ./profile.sh [trace_dir] [-- bench args]
set -euo pipefail
cd "$(dirname "$0")"
TRACE_DIR="${1:-/tmp/llmi_profile}"
shift || true
LLMI_PROFILE_DIR="$TRACE_DIR" python bench.py "$@"
echo "profile written to $TRACE_DIR (open with xprof / tensorboard)"
