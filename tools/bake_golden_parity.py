#!/usr/bin/env python
"""Bake the reference oracle's greedy token stream for the at-scale parity
test (tests/test_parity_at_scale.py).

The oracle leg is the slow half of the test (a 100-step 1B forward through
the compiled reference C++ engine); committing its stream lets a reviewer
verify any engine mode in minutes without rebuilding/running the oracle.
The JSON records every input that determines the stream (checkpoint seed /
std / geometry, prompt seed, oracle ISA) so the test can refuse a stale
bake instead of silently comparing against the wrong golden.

    python tools/bake_golden_parity.py [--steps 100]

Reference contrast: model_test.cpp:409-460 hardcodes golden logits the
same way (a committed regression target produced by a trusted run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "parity_1b_tame.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    import numpy as np

    import bench
    from oracle_harness import OracleModel, oracle_available

    if not oracle_available():
        print("reference oracle unavailable (g++/source missing)", file=sys.stderr)
        return 1

    ckpt = bench.build_tame_checkpoint()
    rng = np.random.default_rng(0)
    prompt = [2] + rng.integers(10, 10000, size=31).tolist()  # pinned 32

    t0 = time.time()
    ref = OracleModel(ckpt.read_bytes())
    logits = ref.forward(prompt, 0, bench.VOCAB_SIZE)
    out = []
    pos = len(prompt)
    for i in range(args.steps):
        nxt = int(logits.argmax())
        out.append(nxt)
        logits = ref.forward([nxt], pos, bench.VOCAB_SIZE)
        pos += 1
        if (i + 1) % 20 == 0:
            print(f"  {i+1}/{args.steps} ({time.time()-t0:.0f}s)", file=sys.stderr)
    ref.close()

    rec = {
        "checkpoint": {
            "seed": 20260816,
            "weight_std": 0.02,
            "geometry": bench.GEOM_1B,
            "vocab_size": bench.VOCAB_SIZE,
        },
        "prompt_seed": 0,
        "prefill_len": 32,
        "prompt": prompt,
        "steps": args.steps,
        "oracle_isa": "avx2",  # OracleModel default: the reference's
        # x86 production build flags (reference BUILD:45-50); on the
        # tame checkpoint the scalar build agrees 100/100 (PARITY_1B.md)
        "tokens": out,
    }
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"baked {args.steps} golden tokens -> {GOLDEN} "
          f"({time.time()-t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
