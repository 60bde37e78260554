#!/usr/bin/env python
"""Attribute the 12B streamed megakernel's gap to speed-of-light.

Loads the 12B capacity engine ONCE, then re-times the 64-step decode
chunk under kernel-bypass diagnostics and tile-size variants (the env
knobs are re-read when the jit cache is cleared, so one load serves the
whole sweep):

  baseline          the shipping kernel (6 MB weight tiles)
  no-attn           LLMI_STREAM_NO_ATTN=1  — serial attention chain
                    skipped (cache DMAs kept): delta = unhidden attention
  no-logits         LLMI_STREAM_NO_LOGITS=1 — tied-embedding tail
                    skipped: delta = unhidden logits cost
  no-attn+logits    both: the pure layer-weight-stream floor
  tile=<N>KB        LLMI_STREAM_TILE_KB sweep (plan permitting)

Numbers are wall ms/step over device-chained 64-step scans (one host
dispatch per chunk: wall/step = device/step + ~28ms/64 tunnel).

    python tools/stream_diag.py [--chunks 4] [--tiles 3072,8192,12288]

Counterpart of the reference's per-op timers (model.cpp's per-section
timing); here the whole step is one kernel so attribution needs these
structural bypasses instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=4,
                    help="timed 64-step chunks per config")
    ap.add_argument("--tiles", default="3072,4096,8192,12288",
                    help="comma list of LLMI_STREAM_TILE_KB values (KB)")
    ap.add_argument("--matrix", default="bypass",
                    choices=["bypass", "pipeline"],
                    help="bypass: no-attn/no-logits attribution + tile "
                         "sweep; pipeline: ldepth/defer_wb knob matrix "
                         "with bracketing baselines")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/llmi_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from capacity_demo import build
    from llm_inference_tpu.engine import Engine
    from llm_inference_tpu.models.gemma import _megakernel_stream_enabled
    import llm_inference_tpu.ops.pallas.fused_decode_stream as fds

    path = build("12b")
    t0 = time.time()
    eng = Engine(str(path), max_seq=1024, mode="serve-q4", decode_chunk=64)
    print(f"load: {time.time()-t0:.0f}s", flush=True)
    assert eng._capacity and _megakernel_stream_enabled(
        eng.hparams, eng.weights, max_seq=eng.max_seq)

    rng = np.random.default_rng(0)
    prompt = [2] + rng.integers(10, 10000, size=15).tolist()
    padded = np.zeros(32, dtype=np.int32)
    padded[: len(prompt)] = prompt
    tok0, _, cache = eng._prefill(eng.weights, eng.new_cache(),
                                  jnp.asarray(padded), jnp.int32(0),
                                  jnp.int32(len(prompt)), eng._base_key)
    pos0 = len(prompt)

    def run(label: str, env: dict, tile_kb: int | None = None):
        for k in ("LLMI_STREAM_NO_ATTN", "LLMI_STREAM_NO_LOGITS",
                  "LLMI_STREAM_LDEPTH", "LLMI_STREAM_DEFER_WB",
                  "LLMI_STREAM_EAGER"):
            os.environ.pop(k, None)
        os.environ.update(env)
        old_tile = fds._TILE_TARGET
        if tile_kb is not None:
            fds._TILE_TARGET = tile_kb * 1024
        try:
            eng._decode_chunk.clear_cache()
            # fresh cache copy per config (chunks donate their carry)
            c = jax.tree_util.tree_map(jnp.copy, cache)
            tok = jnp.asarray(int(tok0), dtype=jnp.int32)
            t0 = time.time()
            toks, c = eng._decode_chunk(eng.weights, c, tok,
                                        jnp.int32(pos0), eng._base_key)
            toks.block_until_ready()
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            for _ in range(args.chunks):
                toks, c = eng._decode_chunk(
                    eng.weights, c, jnp.asarray(int(toks[-1]), jnp.int32),
                    jnp.int32(pos0), eng._base_key)
                toks.block_until_ready()
            wall = time.perf_counter() - t0
            steps = args.chunks * eng.decode_chunk
            ms = wall / steps * 1e3
            print(json.dumps({
                "config": label, "ms_per_step": round(ms, 3),
                "tok_s": round(1e3 / ms, 2),
                "compile_s": round(compile_s, 1),
            }), flush=True)
            return ms
        except Exception as e:  # plan failure for oversized tiles
            print(json.dumps({"config": label, "error": str(e)[:200]}),
                  flush=True)
            return None
        finally:
            fds._TILE_TARGET = old_tile

    # unrecorded warm config: the FIRST measured config in a process runs
    # ~3.4 ms/step hot (persistent-cache write + first-dispatch effects —
    # both r5 matrices showed an 18.6 ms first row vs 15.1 steady)
    run("warmup-discard", {})

    if args.matrix == "bypass":
        base = run("baseline", {})
        noat = run("no-attn", {"LLMI_STREAM_NO_ATTN": "1"})
        nolg = run("no-logits", {"LLMI_STREAM_NO_LOGITS": "1"})
        both = run("no-attn+no-logits",
                   {"LLMI_STREAM_NO_ATTN": "1",
                    "LLMI_STREAM_NO_LOGITS": "1"})
        if base and noat and nolg and both:
            print(json.dumps({
                "attribution_ms": {
                    "total": round(base, 3),
                    "attention_unhidden": round(base - noat, 3),
                    "logits_tail": round(base - nolg, 3),
                    "layer_weight_stream_floor": round(both, 3),
                }}), flush=True)
        for t in args.tiles.split(","):
            t = t.strip()
            if t:
                run(f"tile={t}KB", {}, int(t))
    else:
        # pipeline-knob matrix: repeated baselines bracket the sweep so
        # run-order drift (the first bypass sweep's baseline read 3.4 ms
        # hot) is visible in the output instead of polluting the deltas
        run("baseline", {})
        run("legacy-sched", {"LLMI_STREAM_EAGER": "0"})
        run("eager+deferwb", {"LLMI_STREAM_DEFER_WB": "1"})
        run("ldepth3", {"LLMI_STREAM_LDEPTH": "3"})
        run("deferwb", {"LLMI_STREAM_DEFER_WB": "1"})
        run("ldepth3+deferwb", {"LLMI_STREAM_LDEPTH": "3",
                                "LLMI_STREAM_DEFER_WB": "1"})
        run("tile4m+deferwb", {"LLMI_STREAM_DEFER_WB": "1"}, 4096)
        run("no-logits", {"LLMI_STREAM_NO_LOGITS": "1"})
        run("baseline-rep", {})


if __name__ == "__main__":
    main()
