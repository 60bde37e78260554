#!/usr/bin/env python
"""Reference-vs-itself ISA divergence: the float-ordering noise floor.

Compiles the reference C++ engine twice — its x86 production flags
(-mavx2 -mfma -mf16c, reference BUILD:45-50) and its OWN scalar fallbacks
(ops.cpp #else branches, the code any non-AVX2 target runs) — and compares
the two builds' greedy streams on both synthetic 1B checkpoints.

This substantiates PARITY_1B.md's central claim with in-repo evidence:
on the EXPANSIVE (weight std 0.1) bench checkpoint, the reference cannot
match *itself* across ISAs — summation-order noise (~1e-7/dot) is amplified
~3x/layer by the expansive stack, so greedy argmax decorrelates within a
few tokens. On the TAME (std 2e-2, trained-model-like) checkpoint both
builds hold the same stream, which is why that checkpoint is the parity
acceptance target (tests/test_parity_at_scale.py).

    python tools/oracle_divergence.py [--steps 64] [--out ORACLE_DIVERGENCE.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from llm_inference_tpu.jaxenv import apply_platform_env

apply_platform_env()


def stream(buf: bytes, isa: str, prompt_ids: list[int], steps: int,
           vocab: int):
    """Greedy stream + the step-0 logits vector for noise quantification."""
    import numpy as np
    from oracle_harness import OracleModel

    ref = OracleModel(buf, isa=isa)
    t0 = time.time()
    logits = ref.forward(prompt_ids, 0, vocab)
    first_logits = np.array(logits)
    out = []
    pos = len(prompt_ids)
    for _ in range(steps):
        nxt = int(logits.argmax())
        out.append(nxt)
        logits = ref.forward([nxt], pos, vocab)
        pos += 1
    ref.close()
    print(f"  {isa}: {steps} tokens in {time.time()-t0:.1f}s", file=sys.stderr)
    return out, first_logits


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "ORACLE_DIVERGENCE.md"))
    args = ap.parse_args()

    import numpy as np
    import bench

    rng = np.random.default_rng(0)
    prompt = [2] + rng.integers(10, 10000, size=31).tolist()  # pinned 32

    if not bench.CACHE.exists():
        bench.build_checkpoint()
    ckpts = [
        ("expansive (bench, std 0.1)", bench.CACHE),
        ("tame (std 2e-2)", bench.build_tame_checkpoint()),
    ]

    lines = [
        "# Reference-vs-itself ISA divergence (the noise floor)",
        "",
        "The reference engine compiled with its x86 production flags "
        "(`-mavx2 -mfma -mf16c`, reference BUILD per-ISA copts) vs the SAME "
        "sources compiled to its own scalar fallbacks (`ops.cpp` `#else` "
        "branches). Both runs: identical checkpoint bytes, identical seeded "
        f"{len(prompt)}-token prompt, {args.steps} greedy tokens. "
        "Any divergence below is PURE float-summation-order noise inside "
        "one engine — the floor no bit-different engine pair can beat.",
        "",
        "| checkpoint | tokens matched | first divergence | step-0 logits max abs diff |",
        "|---|---|---|---|",
    ]
    for label, ckpt in ckpts:
        print(f"{label}:", file=sys.stderr)
        buf = ckpt.read_bytes()
        a, la = stream(buf, "avx2", prompt, args.steps, bench.VOCAB_SIZE)
        s, ls = stream(buf, "scalar", prompt, args.steps, bench.VOCAB_SIZE)
        n = 0
        for x, y in zip(a, s):
            if x != y:
                break
            n += 1
        first = ("— (identical stream)" if n == len(a)
                 else f"step {n}: avx2 {a[n]} vs scalar {s[n]}")
        d = float(np.abs(la - ls).max())
        lines.append(f"| {label} | {n}/{len(a)} | {first} | {d:.3e} |")
        print(f"  matched {n}/{len(a)}, step-0 max|dlogit| {d:.3e}",
              file=sys.stderr)

    lines += [
        "",
        "Conclusion: greedy parity is only a meaningful acceptance bar on a "
        "contractive (trained-model-like) checkpoint; the expansive bench "
        "checkpoint amplifies the noise floor past argmax stability. "
        "tests/test_parity_at_scale.py therefore asserts 100/100 on the "
        "tame checkpoint (see PARITY_1B.md for the engine-vs-reference rows).",
    ]
    out = "\n".join(lines) + "\n"
    Path(args.out).write_text(out)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
