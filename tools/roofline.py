#!/usr/bin/env python
"""Per-kernel roofline report for one decode step (SURVEY.md §7 step 5).

Captures a jax.profiler trace of a few decode chunks on the benchmark
checkpoint, sums device-side kernel durations per op bucket, and reports
bytes-moved vs time vs HBM speed-of-light per kernel class plus the
end-to-end step accounting. Writes the table to stdout (and ROOFLINE.md
with --write).

Usage:
  python tools/roofline.py [--mode serve-q8] [--max-seq 1024] [--write]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

HBM_GBPS = float(os.environ.get("LLMI_HBM_GBPS", "819"))  # v5e: ~819 GB/s
MXU_TFLOPS = float(os.environ.get("LLMI_MXU_TFLOPS", "197"))  # v5e bf16 peak


def matmul_params(w) -> int:
    """Logical weight elements touched by matmuls per token (layer
    projections + the tied-embedding logits matmul): FLOPs/token = 2x."""
    def elems(p):
        if p is None:
            return 0
        if hasattr(p, "rows") and hasattr(p, "cols"):
            return int(p.rows) * int(p.cols)
        if hasattr(p, "w"):
            import numpy as np

            return int(np.prod(p.w.shape))
        return 0

    layers = w.layers if isinstance(w.layers, (list, tuple)) else [w.layers]
    total = 0
    for l in layers:
        for name in ("wqkv", "wq", "wk", "wv", "wo", "w_gate_up", "w_gate",
                     "w_up", "w_down", "per_layer_inp_gate", "per_layer_proj"):
            total += elems(getattr(l, name, None))
    # stacked LayerWeights carry an [L, ...] leading dim already counted
    total += elems(w.token_embd)
    return total


def prefill_roofline(eng, buckets=(32, 64, 128, 256, 512), reps=8):
    """Bucketed-prefill accounting: wall TTFT, DEVICE time (traced), MXU
    utilization of the device time (FLOPs = 2 * T * params), and the
    dispatch gap (wall - device: host + tunnel round trip — through the
    axon tunnel one dispatch costs ~31-35 ms, the single-stream TTFT
    floor). BASELINE.md names p50 TTFT a headline axis; the reference
    admits token-by-token prefill (README.md:19)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def one_prefill(prompt, T):
        # the engine's own path prefills with _prefill_w (the bf16
        # operand cache for maskdot modes) — measure THAT, not the
        # in-graph dequant path the engine no longer uses
        pw = getattr(eng, "_prefill_w", eng.weights)
        if getattr(eng, "_prefill_fresh", None) is not None:
            tok, _, cache = eng._prefill_fresh(
                pw, jnp.asarray(prompt), jnp.int32(T), eng._base_key)
        else:
            cache = eng.new_cache()
            tok, _, cache = eng._prefill(
                pw, cache, jnp.asarray(prompt), jnp.int32(0),
                jnp.int32(T), eng._base_key)
        return tok

    params = matmul_params(eng.weights)
    rows = []
    for T in buckets:
        if T > eng.max_seq:
            continue
        rng = np.random.default_rng(0)
        prompt = np.zeros(T, dtype=np.int32)
        prompt[:] = rng.integers(10, 10000, size=T)
        prompt[0] = 2
        # compile + settle
        jax.block_until_ready(one_prefill(prompt, T))
        trace_dir = f"/tmp/llmi_prefill_rl_{T}"
        os.system(f"rm -rf {trace_dir}")
        jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(one_prefill(prompt, T))
        dt = (time.perf_counter() - t0) / reps
        jax.profiler.stop_trace()
        try:
            _, _, _, total_us = parse_trace(trace_dir, reps)
            dev_ms = total_us / reps / 1e3
        except Exception:
            dev_ms = float("nan")
        flops = 2.0 * T * params
        mfu = flops / (dev_ms * 1e-3) / (MXU_TFLOPS * 1e12) if dev_ms else 0.0
        rows.append((T, dt * 1e3, dev_ms, dt * 1e3 - dev_ms, flops / 1e9,
                     100 * mfu, T / dt))
    return rows


def weight_bytes(w) -> dict[str, int]:
    """HBM bytes read per decode step, by weight class (each weight is
    streamed exactly once per step on the decode path)."""
    import jax
    import numpy as np

    def nbytes(t):
        return sum(
            x.nbytes for x in jax.tree_util.tree_leaves(t) if hasattr(x, "nbytes")
        )

    out = {"layers": sum(nbytes(l) for l in (w.layers if isinstance(w.layers, (list, tuple)) else [w.layers])),
           "logits(tied embd)": nbytes(w.token_embd),
           "norms/other": nbytes(w.output_norm)}
    return out


def is_container(name: str) -> bool:
    """XLA container spans that wrap leaf kernels (would double-count)."""
    n = name.lower()
    return n.startswith("jit_") or n.startswith("while") or n.startswith("body") or n.startswith("condition")


def canon(name: str) -> str:
    """Strip the uniquifying .NNN suffix so per-layer clones aggregate."""
    import re

    return re.sub(r"\.\d+$", "", name)


def bucket(name: str) -> str:
    """Map an XLA/Mosaic kernel name to a human op class."""
    n = name.lower()
    if n.startswith("_run_step"):
        return "decode megakernel (whole step)"
    if n.startswith("_run"):
        return "pallas fused dequant-matmul"
    if "flash_decode" in n:
        return "flash attention (pallas)"
    if "insert_rows" in n:
        return "KV row insert (pallas)"
    if "slice-start" in n or "slice-done" in n:
        return "gather/slice"
    if n.startswith("custom-call") or "mosaic" in n:
        return "pallas kernel (custom-call)"
    if "multiply_reduce" in n:
        return "logits W8A8 multiply-reduce"
    if "convert" in n:
        return "dtype convert"
    if "dot" in n or "conv" in n:
        return "XLA dot/GEMM"
    if "fusion" in n:
        return "XLA fusion (elementwise/softmax)"
    if "dynamic-update-slice" in n or "scatter" in n:
        return "cache write"
    if "dynamic-slice" in n or "gather" in n:
        return "gather/slice"
    if "reduce" in n or "argmax" in n or "sort" in n:
        return "reduce/argmax"
    if "copy" in n or "bitcast" in n or "reshape" in n or "transpose" in n:
        return "copy/layout"
    if "while" in n or "scan" in n:
        return "loop control"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "host transfer"
    return "other"


def capture(mode: str, max_seq: int, chunks: int = 2, decode_chunk: int = 64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench  # repo root bench.py (adds checkpoint builder/cache)

    if not bench.CACHE.exists():
        bench.build_checkpoint()
    from llm_inference_tpu.engine import Engine

    eng = Engine(str(bench.CACHE), max_seq=max_seq, mode=mode, decode_chunk=decode_chunk)
    eng.tokenizer.eos_id = -1
    eng.tokenizer.end_of_turn_id = -1
    rng = np.random.default_rng(0)
    prompt = [2] + rng.integers(10, 10000, size=31).tolist()

    # warmup: compile prefill + decode chunk
    eng.generate_from_ids(prompt, n_predict=decode_chunk + 8)

    # manual chunk loop so the trace contains ONLY decode chunks
    cache = eng.new_cache()
    bucket_len = 32
    padded = np.zeros(bucket_len, dtype=np.int32)
    padded[: len(prompt)] = prompt
    tok, _, cache = eng._prefill(
        eng.weights, cache, jnp.asarray(padded), jnp.int32(0),
        jnp.int32(len(prompt)), eng._base_key,
    )
    tok = jnp.asarray(int(tok), dtype=jnp.int32)
    pos = len(prompt)
    # one untraced chunk to settle
    toks, cache = eng._decode_chunk(eng.weights, cache, tok, jnp.int32(pos), eng._base_key)
    toks.block_until_ready()
    pos += decode_chunk

    trace_dir = "/tmp/llmi_roofline_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(chunks):
        toks, cache = eng._decode_chunk(
            eng.weights, cache, jnp.asarray(int(toks[-1]), dtype=jnp.int32),
            jnp.int32(pos), eng._base_key,
        )
        toks.block_until_ready()
        pos += decode_chunk
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    steps = chunks * decode_chunk
    return eng, trace_dir, steps, wall


def capture_batched(mode: str, max_seq: int, batch: int, chunks: int = 2,
                    decode_chunk: int = 64, kv_pages: int | None = None):
    """Trace `chunks` batched decode chunks mid-run on a full batch.
    Returns (server, trace_dir, steps, wall, pos_lo, pos_hi): pos_lo/hi
    bound the lanes' cache fill over the traced window (for the
    prefix-bounded cache-DMA byte accounting)."""
    import jax
    import numpy as np

    import bench

    if not bench.CACHE.exists():
        bench.build_checkpoint()
    from llm_inference_tpu.serving import BatchedServer

    server = BatchedServer(str(bench.CACHE), max_seq=max_seq, max_batch=batch,
                           mode=mode, decode_chunk=decode_chunk,
                           max_admit_per_step=batch, kv_pages=kv_pages)
    server.tokenizer.eos_id = -1
    server.tokenizer.end_of_turn_id = -1
    rng = np.random.default_rng(0)
    need = (chunks + 3) * decode_chunk + 8
    reqs = [server.submit([2] + rng.integers(10, 10000, size=31).tolist(), need)
            for _ in range(batch)]
    server.step()  # admit + compile prefill/chunk
    server.step()  # settle
    if kv_pages:
        # settle past nb_cap bucket flips: a paged chunk recompiles when
        # the deepest lane crosses a power-of-2 block bucket — a flip
        # INSIDE the traced window poisons the wall numbers with a
        # multi-second compile
        def cap(p):
            blocks = -(-(p + server.decode_chunk + 1) // server.page)
            return 1 << max(0, blocks - 1).bit_length()

        while True:
            deepest = max(r.pos for r in reqs)
            if cap(deepest) == cap(deepest + chunks * decode_chunk):
                break
            server.step()
    pos_lo = min(r.pos for r in reqs)

    trace_dir = "/tmp/llmi_roofline_trace_batch"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(chunks):
        server.step()
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    pos_hi = max(r.pos for r in reqs)
    steps = chunks * decode_chunk
    return server, trace_dir, steps, wall, pos_lo, pos_hi


def parse_trace(trace_dir: str, steps: int):
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace under {trace_dir}"
    data = json.load(gzip.open(files[-1]))
    ev = data["traceEvents"]
    device_pids = set()
    pid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
            if "TPU" in e["args"].get("name", "") or "device" in e["args"].get("name", "").lower():
                if "CPU" not in e["args"].get("name", ""):
                    device_pids.add(e["pid"])
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if is_container(name):
            continue
        dur = e.get("dur", 0)  # microseconds
        cn = canon(name)
        per_op[cn] += dur
        per_op_n[cn] += 1
        per_bucket[bucket(name)] += dur
        total += dur
    return per_op, per_op_n, per_bucket, total


def batched_main(args):
    """Batched-serving roofline: device time per batched decode step vs
    the config's own speed-of-light (weight stream shared by all lanes +
    the prefix-bounded cache DMA)."""
    import jax
    import numpy as np

    server, trace_dir, steps, wall, pos_lo, pos_hi = capture_batched(
        args.mode, args.max_seq, args.batch, args.chunks, args.decode_chunk,
        kv_pages=args.paged or None)
    per_op, per_op_n, per_bucket, total_us = parse_trace(trace_dir, steps)

    B, S = args.batch, args.max_seq
    w = getattr(server, "_w_stacked", None) or server.weights
    wb = weight_bytes(w)
    wtotal = sum(wb.values())

    kv_full = sum(
        x.nbytes for x in jax.tree_util.tree_leaves(server._caches)
        if hasattr(x, "nbytes"))
    fill = np.arange(pos_lo, pos_hi)
    if args.paged:
        # paged flash DMA: per lane the index-map clamps to the live
        # block range — ceil(len/PAGE) pages of K+V per layer
        p1 = server._caches.k[0].shape[0]
        per_tok_all_layers = kv_full / (p1 * server.page)
        rows = np.ceil((fill + 1) / server.page) * server.page
        cache_bytes = float(rows.mean()) * B * per_tok_all_layers
        frac = cache_bytes / kv_full
    else:
        # prefix-bounded cache DMA (fused_decode_batch.py): 4 chunks of
        # S/4 rows, ceil((pos+16)/chunk) copied per layer per step
        nkv = 4 if S % 64 == 0 else 1
        kvc = S // nkv
        rows = np.clip((fill + 16 + kvc - 1) // kvc, 1, nkv) * kvc
        frac = float(rows.mean()) / S if server._mega_batch else 1.0
        cache_bytes = kv_full * frac

    sol_ms = (wtotal + cache_bytes) / (HBM_GBPS * 1e9) * 1e3
    step_ms = total_us / steps / 1e3
    wall_ms = wall / steps * 1e3
    if total_us == 0:
        raise RuntimeError(
            f"trace under {trace_dir} holds no device events "
            f"(wall {wall_ms:.1f} ms/step) — profiler dropped the capture?")

    lines = []
    lines.append(f"\n# Roofline — mode={args.mode} BATCHED B={B}, "
                 f"max_seq={S}"
                 + (f", PAGED pool={args.paged}" if args.paged else "")
                 + ", 1B geometry, 1 chip\n")
    lines.append(f"Traced over lane fill [{pos_lo}, {pos_hi}] of {S} "
                 f"(cache DMA prefix-bounded: mean {100*frac:.0f}% of the "
                 f"full slab read per layer).\n")
    lines.append(f"- weight bytes/step (shared by all {B} lanes): {wtotal/1e6:.1f} MB")
    lines.append(f"- cache bytes/step at this fill: {cache_bytes/1e6:.1f} MB "
                 f"(full slab {kv_full/1e6:.1f} MB)")
    lines.append(f"- speed-of-light step: {sol_ms:.3f} ms -> "
                 f"{B*1e3/sol_ms:.0f} tok/s aggregate")
    lines.append(f"- measured device time/step: {step_ms:.3f} ms "
                 f"({100*sol_ms/step_ms:.1f}% of SoL)")
    lines.append(f"- measured wall time/step:   {wall_ms:.3f} ms -> "
                 f"{B*1e3/wall_ms:.1f} tok/s aggregate "
                 f"(device busy {100*step_ms/wall_ms:.0f}%)\n")
    lines.append("## By op class (device time per step)\n")
    lines.append("| op class | us/step | % of step |")
    lines.append("|---|---|---|")
    for b, us in per_bucket.most_common(10):
        lines.append(f"| {b} | {us/steps:.1f} | {100*us/total_us:.1f}% |")

    # name the cost: without this table the paged section's dominant
    # bucket was an anonymous "other" (round-4 VERDICT weak #2)
    lines.append("\n## Top kernels\n")
    lines.append("| kernel | us/step | calls/step | us/call |")
    lines.append("|---|---|---|---|")
    for name, us in per_op.most_common(args.top):
        n = per_op_n[name]
        lines.append(f"| `{name[:70]}` | {us/steps:.1f} | {n/steps:.1f} "
                     f"| {us/max(n,1):.1f} |")

    out = "\n".join(lines)
    print(out)
    if args.write:
        p = Path(os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.md"))
        if args.append:
            p.write_text((p.read_text() if p.exists() else "") + out + "\n")
        else:
            p.write_text(out + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default=os.environ.get("LLMI_BENCH_MODE", "serve-q8"))
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--decode-chunk", type=int, default=64)
    ap.add_argument("--write", action="store_true", help="write ROOFLINE.md")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--no-prefill", action="store_true",
                    help="skip the prefill MFU sweep")
    ap.add_argument("--batch", type=int, default=0,
                    help="batched-serving roofline at this batch size")
    ap.add_argument("--paged", type=int, default=0,
                    help="with --batch: shared KV page pool with N pages")
    ap.add_argument("--append", action="store_true",
                    help="append to ROOFLINE.md instead of overwriting")
    args = ap.parse_args()

    import numpy as np

    if args.batch:
        return batched_main(args)

    eng, trace_dir, steps, wall = capture(args.mode, args.max_seq, args.chunks, args.decode_chunk)
    per_op, per_op_n, per_bucket, total_us = parse_trace(trace_dir, steps)

    wb = weight_bytes(eng.weights)
    wtotal = sum(wb.values())
    # KV cache bytes read per step (whole preallocated cache on the XLA path)
    c = eng.new_cache()
    kv_bytes = sum(
        int(np.prod(k.shape)) * k.dtype.itemsize + int(np.prod(v.shape)) * v.dtype.itemsize
        for k, v in zip(c.k, c.v)
    ) if not eng._stacked else 0

    lines = []
    lines.append(f"# Roofline — mode={args.mode}, max_seq={args.max_seq}, 1B geometry, 1 chip\n")
    lines.append(f"HBM speed-of-light assumed {HBM_GBPS} GB/s (v5e).\n")
    sol_ms = wtotal / (HBM_GBPS * 1e9) * 1e3
    step_ms = total_us / steps / 1e3
    wall_ms = wall / steps * 1e3
    lines.append(f"- weight bytes/step: {wtotal/1e6:.1f} MB "
                 f"({', '.join(f'{k} {v/1e6:.1f}MB' for k, v in wb.items())})")
    lines.append(f"- KV cache bytes (full read, XLA attention): {kv_bytes/1e6:.1f} MB")
    lines.append(f"- speed-of-light step (weights only): {sol_ms:.3f} ms -> {1e3/sol_ms:.0f} tok/s")
    lines.append(f"- measured device time/step: {step_ms:.3f} ms ({100*sol_ms/step_ms:.1f}% of SoL)")
    lines.append(f"- measured wall time/step:   {wall_ms:.3f} ms -> {1e3/wall_ms:.1f} tok/s "
                 f"(device busy {100*step_ms/wall_ms:.0f}%)\n")

    lines.append("## By op class (device time per step)\n")
    lines.append("| op class | us/step | % of step |")
    lines.append("|---|---|---|")
    for b, us in per_bucket.most_common():
        lines.append(f"| {b} | {us/steps:.1f} | {100*us/total_us:.1f}% |")

    lines.append("\n## Top kernels\n")
    lines.append("| kernel | us/step | calls/step | us/call |")
    lines.append("|---|---|---|---|")
    for name, us in per_op.most_common(args.top):
        n = per_op_n[name]
        lines.append(f"| `{name[:70]}` | {us/steps:.1f} | {n/steps:.1f} | {us/max(n,1):.1f} |")

    if not args.no_prefill:
        lines.append("\n## Prefill (bucketed prompt lengths)\n")
        lines.append(f"bf16 MXU peak assumed {MXU_TFLOPS} TFLOP/s (v5e). "
                     "FLOPs = 2 x T x matmul params; MFU is of DEVICE time. "
                     "TTFT for a prompt of length T = the bucket's wall ms "
                     "(one dispatch: the gap column is host + tunnel round "
                     "trip, the latency floor of this setup).\n")
        lines.append("| bucket | wall ms | device ms | dispatch gap ms "
                     "| GFLOPs | MFU(dev) | prefill tok/s (wall) |")
        lines.append("|---|---|---|---|---|---|---|")
        for T, ms, dev, gap, gf, mfu, tps in prefill_roofline(eng):
            lines.append(f"| {T} | {ms:.2f} | {dev:.2f} | {gap:.2f} "
                         f"| {gf:.1f} | {mfu:.1f}% | {tps:.0f} |")

    out = "\n".join(lines)
    print(out)
    if args.write:
        p = Path(os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.md"))
        if args.append:
            p.write_text((p.read_text() + "\n" if p.exists() else "") + out + "\n")
        else:
            p.write_text(out + "\n")


if __name__ == "__main__":
    main()
