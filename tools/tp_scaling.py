#!/usr/bin/env python
"""TP scaling-efficiency accounting from the COMPILED HLO (BASELINE.md:23).

Multi-chip hardware isn't available here, so the table is built the way
the design was validated all along: GSPMD-partition the real decode step
over a virtual N-device mesh, then read what the compiler actually
scheduled — per-device weight bytes (the HBM roofline term) and every
collective's operand bytes (the ICI term) — and model the step from the
two rooflines. This is the "bytes + collective counts from the compiled
HLO" analysis, using the 27B north-star LAYER geometry (d=5376, ff=21504,
32 q / 16 kv heads — BASELINE's v5e-16 target model): collective traffic
is measured on a 2-layer and a 4-layer build, the per-layer delta is
extrapolated to the full 62 layers, and the residual (embed/logits) is
carried over exactly.

The per-op W8A8 TP path mirrors the reference's all-reduce boundaries
(reference model.cpp:839-841 attention output, 905-912 FFN down): one
[T, D] partial-sum all-reduce after each row-parallel projection pair.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/tp_scaling.py [--write]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from llm_inference_tpu.jaxenv import apply_platform_env

apply_platform_env()

HBM_GBPS = float(os.environ.get("LLMI_HBM_GBPS", "819"))    # v5e HBM
ICI_GBPS = float(os.environ.get("LLMI_ICI_GBPS", "90"))     # v5e: ~1.6Tbps
# bidirectional over links; ~90 GB/s effective per-device all-reduce BW
DISPATCH_US = float(os.environ.get("LLMI_DISPATCH_US", "25"))  # per-step host

# Gemma-3-27B geometry (tools/capacity_demo.py GEOMS), layer terms only
GEOM27 = dict(n_embd=5376, n_ff=21504, n_head=32, n_head_kv=16, head_dim=128)
FULL_LAYERS = 62
VOCAB_27B = 262144

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(sig: str) -> int:
    """Sum byte sizes of every typed shape in an HLO op result signature,
    e.g. '(f32[1,5376], f32[1,5376])' or 'bf16[2688,1]'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", sig):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo: str):
    """(count, bytes) per collective kind from compiled HLO text."""
    stats = {}
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+ = (.+?) (all-reduce|all-gather|"
                     r"reduce-scatter|collective-permute|all-to-all)", line)
        if not m:
            continue
        kind = m.group(2)
        b = _shape_bytes(m.group(1))
        c, tot = stats.get(kind, (0, 0))
        stats[kind] = (c + 1, tot + b)
    return stats


VOCAB_PROBE = 4096
_BUF_CACHE = Path("/tmp/llmi_tp_probe_27bgeom_2l.gguf")


def probe_buf() -> bytes:
    """2-layer GGUF at the 27B layer geometry (built once, /tmp-cached)."""
    if not _BUF_CACHE.exists():
        from fixtures import build_gemma3_gguf

        buf = build_gemma3_gguf(
            n_layers=2, seed=11,
            vocab=[f"t{i}" for i in range(VOCAB_PROBE)], **GEOM27)
        tmp = _BUF_CACHE.with_suffix(".tmp")
        tmp.write_bytes(buf)
        tmp.rename(_BUF_CACHE)
    return _BUF_CACHE.read_bytes()


def _shard_bytes(t):
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(t):
        if hasattr(leaf, "addressable_shards"):
            total += leaf.addressable_shards[0].data.nbytes
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total


def lower_mesh(buf: bytes, n_tp: int):
    """Load the probe ONCE on an n_tp-device mesh and lower the W8A8
    decode step twice (2-layer and a 1-layer slice of the SAME weights);
    the delta isolates the per-layer collectives and bytes exactly.
    Returns (stats_per_layer, stats_fixed, layer_dev_bytes, fixed_dev_bytes)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from llm_inference_tpu.gguf import GGUFFile
    from llm_inference_tpu.models import forward, init_cache, load_weights
    from llm_inference_tpu.parallel import (
        gemma_sharding_fn,
        kv_cache_sharding,
        make_mesh,
    )

    g = GGUFFile(buf)
    mesh = make_mesh(model=n_tp, data=1, devices=jax.devices()[:n_tp])
    hp, w = load_weights(g, mode="rowq8",
                         sharding_fn=gemma_sharding_fn(mesh))
    tok = jnp.asarray([5], dtype=jnp.int32)

    def lower(hp_l, w_l):
        cache = init_cache(hp_l, 1024,
                           sharding=kv_cache_sharding(mesh, hp_l.n_head_kv))

        def step(w_, cache_, tok_):
            logits, cache_ = forward(hp_l, w_, cache_, tok_, 100, exact=False)
            return jnp.argmax(logits).astype(jnp.int32), cache_

        return jax.jit(step).lower(w_l, cache, tok).compile().as_text()

    hlo2 = lower(hp, w)
    hp1 = dataclasses.replace(hp, block_count=1)
    w1 = dataclasses.replace(w, layers=w.layers[:1])
    hlo1 = lower(hp1, w1)
    s2, s1 = collective_stats(hlo2), collective_stats(hlo1)
    per_layer = {k: (s2.get(k, (0, 0))[0] - s1.get(k, (0, 0))[0],
                     s2.get(k, (0, 0))[1] - s1.get(k, (0, 0))[1])
                 for k in set(s2) | set(s1)}
    fixed = {k: (s1.get(k, (0, 0))[0] - per_layer[k][0],
                 s1.get(k, (0, 0))[1] - per_layer[k][1]) for k in per_layer}
    layer_dev_bytes = _shard_bytes(w.layers[1])
    fixed_dev_bytes = _shard_bytes(w) - 2 * layer_dev_bytes
    return per_layer, fixed, layer_dev_bytes, fixed_dev_bytes


_ROWS_CACHE = Path("/tmp/llmi_tp_scaling_rows.json")


def main() -> int:
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write TP_SCALING.md")
    ap.add_argument("--mesh-sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--fresh", action="store_true",
                    help="ignore the /tmp row cache")
    args = ap.parse_args()

    # rows are cached per mesh size so the sweep can run as several
    # shorter invocations (each load+lower pair is minutes on 1 CPU)
    cache = {}
    if _ROWS_CACHE.exists() and not args.fresh:
        cache = {int(k): v for k, v in
                 json.loads(_ROWS_CACHE.read_text()).items()}

    import jax

    assert len(jax.devices()) >= max(args.mesh_sizes), (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")

    D = GEOM27["n_embd"]
    lines = [
        "# TP scaling accounting — 27B layer geometry, compiled-HLO "
        "collectives (BASELINE.md:23)",
        "",
        "GSPMD-partitioned W8A8 decode step (T=1) on the virtual CPU mesh; "
        "the partitioning and collectives are EXACTLY what the TPU build "
        "compiles — only the roofline constants below are assumed:",
        f"HBM {HBM_GBPS} GB/s, effective all-reduce ICI {ICI_GBPS} GB/s "
        f"per device, {DISPATCH_US} us/step dispatch overhead (v5e).",
        "",
        "| TP | weights/dev | collectives/layer | coll. bytes/step (62L) | "
        "t_hbm | t_ici | modeled step | modeled tok/s | scaling eff. |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    base_tok_s = None
    rows_out = []
    buf = None
    for n in args.mesh_sizes:
        if GEOM27["n_head_kv"] % n:
            continue
        if n in cache:
            per_layer, fixed, layer_dev_bytes, fixed_dev_bytes = cache[n]
            per_layer = {k: tuple(v) for k, v in per_layer.items()}
            fixed = {k: tuple(v) for k, v in fixed.items()}
        else:
            if buf is None:
                buf = probe_buf()
            per_layer, fixed, layer_dev_bytes, fixed_dev_bytes = lower_mesh(buf, n)
            cache[n] = [per_layer, fixed, layer_dev_bytes, fixed_dev_bytes]
            _ROWS_CACHE.write_text(json.dumps(
                {str(k): v for k, v in cache.items()}))
        # embed/logits at the real 262k vocab instead of the probe's 4096
        fixed_dev_bytes *= VOCAB_27B / VOCAB_PROBE
        dev_bytes = FULL_LAYERS * layer_dev_bytes + fixed_dev_bytes
        coll_bytes = sum(FULL_LAYERS * b + fb for (_, b), (_, fb)
                         in zip(per_layer.values(), fixed.values()))
        coll_count_layer = sum(c for c, _ in per_layer.values())
        t_hbm = dev_bytes / (HBM_GBPS * 1e9)
        t_ici = coll_bytes / (ICI_GBPS * 1e9)
        # weights stream while collectives fly: the step is the max of the
        # rooflines plus the per-step dispatch cost
        t_step = max(t_hbm, t_ici) + DISPATCH_US * 1e-6
        tok_s = 1.0 / t_step
        if base_tok_s is None:
            base_tok_s = tok_s / n  # per-chip rate of the smallest mesh
            base_n = n
        # scaling efficiency: speedup achieved / ideal linear speedup
        eff = tok_s / (base_tok_s * n)
        detail = ", ".join(
            f"{k} x{per_layer[k][0]:.0f} ({per_layer[k][1]/1e3:.0f} KB)"
            for k in sorted(per_layer) if per_layer[k][0] > 0) or "none"
        lines.append(
            f"| {n} | {dev_bytes/1e9:.2f} GB | {detail} | "
            f"{coll_bytes/1e6:.1f} MB | {t_hbm*1e3:.2f} ms | "
            f"{t_ici*1e3:.3f} ms | {t_step*1e3:.2f} ms | {tok_s:.1f} | "
            f"{100*eff:.1f}% |")
        rows_out.append((n, dev_bytes, coll_bytes, tok_s, eff,
                         coll_count_layer))
        print(f"TP={n}: {dev_bytes/1e9:.2f} GB/dev, "
              f"{coll_count_layer:.0f} collectives/layer, "
              f"{coll_bytes/1e6:.1f} MB/step, modeled {tok_s:.1f} tok/s "
              f"({100*eff:.1f}% eff)", file=sys.stderr)

    lines += [
        "",
        "Reading the table: decode is weight-bound — the per-layer "
        "all-reduces move ~2 x [1, D] f32 = "
        f"{2 * D * 4 / 1e3:.0f} KB/layer (the reference's two partial-sum "
        "boundaries, model.cpp:839-841 and 905-912), which is orders of "
        "magnitude below the weight stream. TP efficiency is therefore set "
        "by HBM splitting, and the modeled single-stream speedup is near-"
        "linear until the per-step dispatch floor dominates.",
        "",
        "Caveat: modeled from compiled-HLO bytes, not measured on hardware "
        "(single-chip tunnel only; BENCH files carry the measured "
        "single-chip numbers).",
        "",
        "Two TP decode paths exist: (1) this per-op GSPMD W8A8 program — "
        "robust, any geometry; (2) the TP whole-step megakernel "
        "(ops/pallas/fused_decode_tp.py, Engine(tp_mesh=...)) — one Pallas "
        "call per chip per step with the two boundary all-reduces INSIDE "
        "the kernel as broadcast-gathers over inter-chip DMA, so the "
        "per-op launch gaps the single-chip megakernel eliminates stay "
        "eliminated under TP. Validated against the single-chip megakernel "
        "on the virtual mesh via the Pallas TPU interpreter's multi-device "
        "DMA simulation (tests/test_fused_decode_tp.py); hardware "
        "measurement requires a multi-chip slice.",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    if args.write:
        Path(os.path.join(os.path.dirname(__file__), "..",
                          "TP_SCALING.md")).write_text(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
