#!/usr/bin/env bash
# Test gate (the reference's test.sh equivalent): full hermetic suite on the
# CPU backend with the virtual 8-device mesh.
set -euo pipefail
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
