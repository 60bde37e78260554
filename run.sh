#!/usr/bin/env bash
# Build-and-run wrapper (the reference's run.sh equivalent):
#   ./run.sh -m model.gguf -p "prompt" -n 100
set -euo pipefail
cd "$(dirname "$0")"
exec python -m llm_inference_tpu "$@"
