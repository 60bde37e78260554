#!/usr/bin/env python
"""Perplexity of a GGUF checkpoint on a text corpus — the correctness
metric BASELINE.md names alongside greedy parity ("perplexity at the same
bit-width"). Point it at a real Gemma GGUF + any text file:

    python tools/perplexity.py -m gemma-3-1b-it-q4_0.gguf -t wiki.txt \
        --mode serve-q8 --max-tokens 2048

Teacher-forced evaluation: the token stream feeds the decode path one
position at a time (on-device chunks of --chunk steps; each step's
next-token log-prob is gathered IN-graph, so only [chunk] floats cross
the tunnel). ppl = exp(-mean log p(next token)). The same engine modes
as the CLI are available, so Q4_0/Q8_0/Q4_K checkpoints can be compared
at identical bit-widths to the reference engine's output.

No network access exists in this environment, so no real-checkpoint
number is recorded in-repo; the tool is validated on the synthetic 1B
(tests/test_perplexity.py: serve vs serve-q8 ppl agree to ~1%, and a
shuffled stream scores far worse than the model's own greedy stream).

Reference contrast: the reference engine has no perplexity tool at all —
its correctness story is greedy-token and activation parity only
(README.md, compare_tensors.py).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def perplexity(engine, token_ids, *, chunk: int = 64, progress=None):
    """exp(-mean log p) of token_ids[1:] under teacher forcing.

    Returns (ppl, mean_nll, n_scored)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from llm_inference_tpu.models import forward

    hp = engine.hparams
    w = engine.weights

    @partial(jax.jit, donate_argnums=(1,))
    def nll_chunk(w, cache, toks, targets, pos):
        def body(carry, tt):
            cache, p = carry
            tok, tgt = tt
            logits, cache = forward(hp, w, cache, tok[None], p, exact=False)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))[tgt]
            return (cache, p + 1), lp

        (cache, _), lps = jax.lax.scan(
            body, (cache, pos), (toks, targets))
        return lps, cache

    import numpy as np

    ids = np.asarray(token_ids, dtype=np.int32)
    if ids.size < 2:
        raise ValueError("need at least 2 tokens to score")
    # feed ids[:-1], score ids[1:]
    feed, tgt = ids[:-1], ids[1:]
    n = feed.size
    cache = engine.new_cache()
    total = 0.0
    scored = 0
    pos = 0
    for lo in range(0, n, chunk):
        k = min(chunk, n - lo)
        f = np.zeros(chunk, np.int32)
        t = np.zeros(chunk, np.int32)
        f[:k] = feed[lo : lo + k]
        t[:k] = tgt[lo : lo + k]
        lps, cache = nll_chunk(w, cache, jnp.asarray(f), jnp.asarray(t),
                               jnp.int32(pos))
        lps = np.asarray(lps)[:k]
        total += float(-lps.sum())
        scored += k
        pos += k
        if progress:
            progress(scored, total / scored)
    mean_nll = total / scored
    return math.exp(mean_nll), mean_nll, scored


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-t", "--text", help="UTF-8 text file to score")
    ap.add_argument("--token-file", help="whitespace-separated token ids "
                                         "(skips the tokenizer)")
    ap.add_argument("--mode", default="serve-q8",
                    choices=["serve", "serve-q", "serve-q4", "serve-q8"])
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args()

    from llm_inference_tpu.engine import Engine

    t0 = time.time()
    eng = Engine(args.model, max_seq=max(256, args.chunk * 2),
                 mode=args.mode, decode_chunk=args.chunk)
    print(f"loaded {args.model} ({args.mode}) in {time.time()-t0:.0f}s",
          file=sys.stderr)

    if args.token_file:
        ids = [int(x) for x in open(args.token_file).read().split()]
    elif args.text:
        text = open(args.text, encoding="utf-8").read()
        enc = eng.tokenizer.encode(text, apply_chat_template=False)
        ids = enc.ids
    else:
        print("need -t/--text or --token-file", file=sys.stderr)
        return 2
    ids = ids[: args.max_tokens]
    print(f"scoring {len(ids)} tokens", file=sys.stderr)

    def prog(n, nll):
        print(f"  {n} tokens, running ppl {math.exp(nll):.3f}",
              file=sys.stderr)

    ppl, nll, n = perplexity(eng, ids, chunk=args.chunk, progress=prog)
    print(f"perplexity: {ppl:.4f} (mean nll {nll:.4f}, {n} tokens, "
          f"mode {args.mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
