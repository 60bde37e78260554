#!/usr/bin/env python
"""Capacity demo: big-model geometries on one chip / the virtual mesh.

BASELINE.md's north star is Gemma-3-27B-class serving. This builds
synthetic checkpoints with the real 12B / 27B geometries and demonstrates:

  - 12B: loads in serve-q4 (lossless 0.5 B/weight packing) on ONE 16 GB
    chip, with an HBM memory report and a short greedy generation.
  - 27B: loads TP-sharded across the 8-device virtual mesh (CPU backend)
    with a per-device memory report and one forward step — the sharding
    program that a v5e-16 slice would run.

    python tools/capacity_demo.py 12b [--generate N]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools/capacity_demo.py 27b
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# real Gemma-3 geometries (model card / GGUF metadata)
GEOMS = {
    "12b": dict(n_layers=48, n_embd=3840, n_ff=15360, n_head=16, n_head_kv=8,
                head_dim=256),
    "27b": dict(n_layers=62, n_embd=5376, n_ff=21504, n_head=32, n_head_kv=16,
                head_dim=128),
}
VOCAB_SIZE = 262144


def checkpoint_path(name: str) -> Path:
    return Path(f"/tmp/llmi_capacity_{name}_q4_0.gguf")


def build(name: str) -> Path:
    from fixtures import build_gemma3_gguf

    path = checkpoint_path(name)
    if path.exists():
        return path
    vocab = [f"t{i}" for i in range(VOCAB_SIZE)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    t0 = time.time()
    buf = build_gemma3_gguf(vocab=vocab, seed=12, **GEOMS[name])
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(buf)
    tmp.rename(path)
    print(f"built {name} checkpoint ({len(buf)/1e9:.1f} GB) in "
          f"{time.time()-t0:.0f}s -> {path}", file=sys.stderr)
    return path


def hbm_report(label: str) -> None:
    import jax

    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            used = stats.get("bytes_in_use", 0) / 1e9
            limit = stats.get("bytes_limit", 0) / 1e9
            print(f"{label}: {d} {used:.2f} GB in use / {limit:.2f} GB", flush=True)


def profile_12b(eng) -> None:
    """Device-time-per-step capture on the loaded 12B engine: how much
    of the wall number is the streamed kernel vs tunnel round-trips."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(__file__))
    from roofline import HBM_GBPS, parse_trace

    rng = np.random.default_rng(0)
    prompt = [2] + rng.integers(10, 10000, size=15).tolist()
    cache = eng.new_cache()
    padded = np.zeros(32, dtype=np.int32)
    padded[: len(prompt)] = prompt
    tok, _, cache = eng._prefill(eng.weights, cache, jnp.asarray(padded),
                                 jnp.int32(0), jnp.int32(len(prompt)),
                                 eng._base_key)
    tok = jnp.asarray(int(tok), dtype=jnp.int32)
    pos = len(prompt)
    toks, cache = eng._decode_chunk(eng.weights, cache, tok, jnp.int32(pos),
                                    eng._base_key)
    toks.block_until_ready()
    pos += eng.decode_chunk
    trace_dir = "/tmp/llmi_cap12b_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(2):
        toks, cache = eng._decode_chunk(
            eng.weights, cache, jnp.asarray(int(toks[-1]), dtype=jnp.int32),
            jnp.int32(pos), eng._base_key)
        toks.block_until_ready()
        pos += eng.decode_chunk
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    steps = 2 * eng.decode_chunk
    per_op, per_op_n, per_bucket, total_us = parse_trace(trace_dir, steps)
    print(f"12B device time/step: {total_us/steps/1e3:.2f} ms; "
          f"wall {wall/steps*1e3:.2f} ms/step", flush=True)
    for b, us in per_bucket.most_common(6):
        print(f"  {b:40s} {us/steps:9.1f} us/step", flush=True)
    for name, us in per_op.most_common(6):
        print(f"  `{name[:50]}` {us/steps:9.1f} us/step x{per_op_n[name]/steps:.1f}",
              flush=True)


def run_12b(generate: int, profile: bool = False) -> None:
    import jax
    import numpy as np

    # persistent jit cache: repeat runs skip the multi-minute compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/llmi_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from llm_inference_tpu.engine import Engine, GenerationStats

    path = build("12b")
    t0 = time.time()
    eng = Engine(str(path), max_seq=1024, mode="serve-q4", decode_chunk=64)
    load_s = time.time() - t0
    print(f"12B serve-q4 load: {load_s:.0f}s", flush=True)
    # which decode path did the engine pick? (VERDICT r3: verify the
    # streamed capacity megakernel actually fires at the 12B geometry)
    from llm_inference_tpu.models.gemma import _megakernel_stream_enabled

    stream_on = eng._capacity and _megakernel_stream_enabled(
        eng.hparams, eng.weights, max_seq=eng.max_seq)
    print(f"12B decode path: capacity={eng._capacity} "
          f"streamed-megakernel={bool(stream_on)}", flush=True)
    hbm_report("after load")
    nparams = sum(
        x.size for x in jax.tree_util.tree_leaves(eng.weights)
        if hasattr(x, "size")
    )
    print(f"device leaves hold {nparams/1e9:.2f} B elements", flush=True)
    if generate:
        eng.tokenizer.eos_id = -1
        eng.tokenizer.end_of_turn_id = -1
        rng = np.random.default_rng(0)
        ids = [2] + rng.integers(10, 10000, size=15).tolist()
        warm = GenerationStats()
        eng.generate_from_ids(ids, n_predict=min(generate, 2 * eng.decode_chunk),
                              stats=warm)
        print(f"12B warmup: prefill {warm.prefill_seconds:.1f}s, decode "
              f"{warm.decode_seconds:.1f}s (both incl. compile)", flush=True)
        st = GenerationStats()
        out = eng.generate_from_ids(ids, n_predict=generate, stats=st)
        print(f"12B generated {len(out)} tokens, decode "
              f"{st.decode_tok_per_s:.1f} tok/s "
              f"(prefill {st.prefill_seconds*1e3:.0f} ms)", flush=True)
        hbm_report("after generate")
        if os.environ.get("LLMI_CAP_JSON"):
            # sweep-consumable one-liner (tools/hw_sweep.sh capacity-12b)
            import json

            print(json.dumps({
                "metric": "decode_tok_s_gemma3_12b_q4_0_capacity",
                "value": round(st.decode_tok_per_s, 2),
                "unit": "tok/s",
                "streamed_megakernel": bool(stream_on),
                "ttft_ms": round(st.prefill_seconds * 1e3, 1),
                "load_s": round(load_s, 1),
            }), flush=True)
    if profile:
        profile_12b(eng)


def run_27b(layout: str = "maskdot") -> None:
    import jax
    import jax.numpy as jnp

    from llm_inference_tpu.gguf import GGUFFile
    from llm_inference_tpu.models import forward, init_cache, load_weights
    from llm_inference_tpu.parallel import gemma_sharding_fn, kv_cache_sharding, make_mesh

    path = build("27b")
    n = len(jax.devices())
    mesh = make_mesh(model=n, data=1)
    t0 = time.time()
    if layout == "maskdot":
        # serve-q4 capacity layout TP-sharded: 0.5 B/weight nibble-packed
        # maskdot arrays row-sharded over the mesh (~1.7 GB/chip at 8) —
        # the program a v5e-16 slice serves the 27B with.
        from llm_inference_tpu.models.weights import load_maskdot_stacked

        hp, w = load_maskdot_stacked(GGUFFile(str(path)), q4=True, mesh=mesh)
        print(f"27B serve-q4 maskdot TP load over {n} devices: "
              f"{time.time()-t0:.0f}s", flush=True)
    else:
        # packed-serve: lossless planar int8 + exact group scales (pack_q4's
        # nibble pass would round-trip every sharded tensor through the host)
        hp, w = load_weights(GGUFFile(str(path)), sharding_fn=gemma_sharding_fn(mesh),
                             mode="packed-serve")
        print(f"27B packed int8 TP load over {n} devices: {time.time()-t0:.0f}s", flush=True)
    per_dev = {}
    for leaf in jax.tree_util.tree_leaves(w):
        if hasattr(leaf, "addressable_shards"):
            for s in leaf.addressable_shards:
                per_dev[s.device] = per_dev.get(s.device, 0) + s.data.nbytes
    for d, b in sorted(per_dev.items(), key=lambda kv: str(kv[0])):
        print(f"  {d}: {b/1e9:.2f} GB of weights", flush=True)
    if layout == "maskdot":
        from jax.sharding import NamedSharding, PartitionSpec as P

        kv_sh = NamedSharding(
            mesh, P(None, None, "model" if hp.n_head_kv % n == 0 else None, None))
        cache = init_cache(hp, 128, sharding=kv_sh, stacked=True,
                           dtype=jnp.bfloat16)
    else:
        cache = init_cache(hp, 128, sharding=kv_cache_sharding(mesh, hp.n_head_kv),
                           dtype=jnp.bfloat16)
    from functools import partial

    fwd = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    t0 = time.time()
    logits, cache = fwd(w, cache, jnp.asarray([2, 7, 8, 9], dtype=jnp.int32), 0)
    s = float(jnp.sum(logits))
    print(f"27B sharded forward step: {time.time()-t0:.0f}s "
          f"(logits checksum {s:.3f})", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["12b", "27b"])
    ap.add_argument("--generate", type=int, default=8)
    ap.add_argument("--profile", action="store_true",
                    help="12b: trace decode chunks, print device us/step")
    ap.add_argument("--layout", choices=["maskdot", "int8"], default="maskdot",
                    help="27b: serve-q4 maskdot TP load (default) or planar int8")
    args = ap.parse_args()
    if args.which == "27b":
        # XLA:CPU kills collectives whose slowest participant lags the
        # first arrival by >40s — a 27B-shard matmul on a virtual CPU
        # device takes minutes, so raise the rendezvous timeouts (real
        # TPU slices have no such limit; this is emulation-only).
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
            + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=1800"
            + " --xla_cpu_collective_timeout_seconds=7200"
        ).strip()
        # force the CPU backend even where a TPU PJRT plugin is registered
        # (the plugin overrides JAX_PLATFORMS) — the 27B demo is about the
        # virtual-mesh sharding program, and 17 GB would OOM one chip
        import jax

        jax.config.update("jax_platforms", "cpu")
        run_27b(args.layout)
    else:
        run_12b(args.generate, profile=args.profile)


if __name__ == "__main__":
    main()
