#!/usr/bin/env python
"""At-scale greedy parity: 100-token greedy streams on the Gemma-3-1B
geometry, every serve mode vs the compiled reference engine.

The reference's correctness baseline is token-for-token greedy output at
temperature 0 (BASELINE.md). This runs the actual reference C++ engine
(ctypes oracle, AVX2 build of /root/reference sources) on the benchmark
checkpoint and compares each engine mode's 100-token greedy stream,
reporting match length and first divergence. Writes PARITY_1B.md.

    python tools/greedy_parity.py [--steps 100] [--modes parity serve ...]
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

ALL_MODES = ["parity", "serve", "serve-q", "serve-q4", "serve-q8"]


def oracle_stream(buf: bytes, prompt_ids: list[int], steps: int, vocab: int) -> list[int]:
    from oracle_harness import OracleModel

    ref = OracleModel(buf)
    t0 = time.time()
    logits = ref.forward(prompt_ids, 0, vocab)
    out = []
    pos = len(prompt_ids)
    for _ in range(steps):
        nxt = int(logits.argmax())
        out.append(nxt)
        logits = ref.forward([nxt], pos, vocab)
        pos += 1
    ref.close()
    print(f"oracle: {steps} tokens in {time.time()-t0:.1f}s", file=sys.stderr)
    return out


def engine_stream(path: str, mode: str, prompt_ids: list[int], steps: int) -> list[int]:
    from llm_inference_tpu.engine import Engine

    t0 = time.time()
    eng = Engine(path, max_seq=512, mode=mode, decode_chunk=16)
    eng.tokenizer.eos_id = -1
    eng.tokenizer.end_of_turn_id = -1
    out = eng.generate_from_ids(list(prompt_ids), n_predict=steps)
    print(f"{mode}: {len(out)} tokens in {time.time()-t0:.1f}s "
          f"(incl. load+compile)", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--modes", nargs="*", default=ALL_MODES)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "PARITY_1B.md"))
    ap.add_argument(
        "--checkpoint", choices=["bench", "tame"], default="tame",
        help="'tame' (weight std 2e-2) keeps the random 26-layer stack "
        "contractive like a trained model; 'bench' (std 0.1) is expansive "
        "— it amplifies the irreducible ~1e-7 float-ordering noise "
        "x~3/layer, so NO pair of bit-different engines can hold a long "
        "greedy stream on it",
    )
    args = ap.parse_args()

    import numpy as np
    import bench

    if args.checkpoint == "bench":
        if not bench.CACHE.exists():
            bench.build_checkpoint()
        ckpt = Path(bench.CACHE)
    else:
        t0 = time.time()
        ckpt = bench.build_tame_checkpoint()
        if time.time() - t0 > 1.0:
            print(f"built tame checkpoint in {time.time()-t0:.0f}s", file=sys.stderr)
    buf = ckpt.read_bytes()

    rng = np.random.default_rng(0)
    prompt_ids = [2] + rng.integers(10, 10000, size=31).tolist()  # pinned 32

    golden = oracle_stream(buf, prompt_ids, args.steps, bench.VOCAB_SIZE)

    lines = [
        "# Greedy-stream parity at the Gemma-3-1B geometry",
        "",
        f"Reference: the compiled reference engine (ctypes oracle of the C++ "
        f"sources), {args.steps} greedy tokens on the '{args.checkpoint}' "
        f"synthetic checkpoint (26 layers, d=1152, Q4_0 + F16 embeddings), "
        f"prompt = bench.py's seeded {len(prompt_ids)}-token prompt. "
        "Matching the reference stream at temperature 0 is the BASELINE.md "
        "correctness bar.",
        "",
        "| mode | weights in HBM | tokens matched | first divergence |",
        "|---|---|---|---|",
    ]
    descr = {
        "parity": "exact dequant, reference numeric contract",
        "serve": "bf16 dequantized",
        "serve-q": "int8 + exact group scales (lossless repack)",
        "serve-q4": "nibble-packed 4-bit, lossless repack",
        "serve-q8": "per-row int8 requant (lossy, <=0.8% weight err)",
    }
    ok = True
    for mode in args.modes:
        try:
            got = engine_stream(str(ckpt), mode, prompt_ids, args.steps)
        except Exception as e:  # record, keep going
            lines.append(f"| {mode} | {descr.get(mode, '')} | ERROR | {e} |")
            ok = False
            continue
        n = 0
        for a, b in zip(got, golden):
            if a != b:
                break
            n += 1
        if n == len(golden):
            first = "— (identical stream)"
        else:
            first = f"step {n}: ref {golden[n]} vs {got[n] if n < len(got) else 'EOS'}"
            ok = False if mode in ("parity",) else ok
        lines.append(f"| {mode} | {descr.get(mode, '')} | {n}/{len(golden)} | {first} |")
        print(f"{mode}: matched {n}/{len(golden)}", file=sys.stderr)

    out = "\n".join(lines) + "\n"
    Path(args.out).write_text(out)
    print(out)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
