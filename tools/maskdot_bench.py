#!/usr/bin/env python
"""Isolate the capacity layer-stream's compute cost: DMA-only vs
DMA + masked-dot compute, with operand-type variants.

The 12B streamed kernel's layer floor (no-attn+no-logits) runs ~12 ms
against an ~8.2 ms weight-bytes SoL while DMA alone measures 751 GB/s
(tools/dma_bench.py) and the cost is insensitive to tile size, dot
count, and reduce structure (stream_diag r5). Remaining suspect: the
mixed bf16 x int8 half-dots — if Mosaic converts the int8 weight tile
to bf16 on the VPU before the MXU, that's ~1 element/lane/cycle over
EVERY weight byte. Variants:

  dma        pure tile streaming (no compute)
  maskdot    the exact _tile_dot packed math (bf16 A x int8 B)
  prefconv   same but a single explicit .astype(bf16) of the tile, then
             bf16 x bf16 dots (does one big convert beat many implicit?)
  int8a      int8 A-operand x int8 B (native MXU int8 path; the W4A8
             candidate's inner loop)

    python tools/maskdot_bench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# gate_up-like part of the 12B in the serve-q4 packed layout:
# C=3840 (contraction), R rows streamed in TR tiles; bg=12 -> bc=384,
# half-block h=192, Mp=16, nblk=10; c_store = C/2 (nibble pairs)
C, TR, L = 3840, 3072, 8
GS, BG = 32, 12
BC, H2, MP = BG * GS, BG * GS // 2, 16
NBLK = C // BC
C_STORE = C // 2
GP = NBLK * MP
REPS = 8


def _kernel(salt_ref, src_ref, s_src_ref, o_ref, buf, sbuf, acc, sem, ssem,
            *, mode):
    def copy(l, slot):
        return (pltpu.make_async_copy(src_ref.at[l], buf.at[slot],
                                      sem.at[slot]),
                pltpu.make_async_copy(
                    s_src_ref.at[l] if s_src_ref.shape[2] == TR
                    else s_src_ref.at[l, :, pl.ds(3 * TR, TR)],
                    sbuf.at[slot], ssem.at[slot]))

    acc[...] = jnp.full_like(acc, salt_ref[0])

    # the real kernel's mask construction (int ops only) times a
    # synthetic activation row — f32 remainder ops crash Mosaic here
    sub = jax.lax.broadcasted_iota(jnp.int32, (MP, C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (MP, C), 1)
    mask = jnp.maximum(0, 1 - jnp.abs((lane % BC) // GS - sub))
    xrow = (lane % 7 - 3)
    if mode == "int8a":
        xm_full = (mask * xrow).astype(jnp.int8)
    else:
        xm_full = (mask * xrow).astype(jnp.bfloat16) * jnp.bfloat16(0.125)

    def rep(r_, carry):
        for cp in copy(0, 0):
            cp.start()
        for cp in copy(1, 1):
            cp.start()

        def body(i, carry2):
            slot = jax.lax.rem(i, 2)
            for cp in copy(i, slot):
                cp.wait()

            if mode == "dma":
                acc[:, :TR] = acc[:, :TR] + buf[slot, :1, :].astype(jnp.float32)
            else:
                tile = buf[slot]
                if mode == "prefconv":
                    tile = tile.astype(jnp.bfloat16)
                a = None
                for b in range(NBLK):
                    xm = xm_full[:, b * BC : (b + 1) * BC]
                    sblk = sbuf[slot, b * MP : (b + 1) * MP, :]
                    blk = tile[b * H2 : (b + 1) * H2, :]
                    if mode == "prefconv":
                        lo, hi = blk, blk
                    else:
                        lo = blk & jnp.int8(0x0F)
                        hi = blk & jnp.int8(~0x0F)
                    pb = jax.lax.dot_general(
                        xm[:, :H2], lo,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    pb = pb + jax.lax.dot_general(
                        xm[:, H2:], hi,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    contrib = sblk * pb
                    a = contrib if a is None else a + contrib
                acc[...] += jnp.sum(a, axis=0, keepdims=True)

            nxt = i + 2

            @pl.when(nxt < L)
            def _():
                for cp in copy(nxt, jax.lax.rem(nxt, 2)):
                    cp.start()

            return carry2

        jax.lax.fori_loop(0, L, body, 0)
        return carry

    jax.lax.fori_loop(0, REPS, rep, 0)
    o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("mode",))
def run(salt, src, s_src, *, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, TR), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C_STORE, TR), jnp.int8),
            pltpu.VMEM((2, GP, TR), jnp.float32),
            pltpu.VMEM((1, TR), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(salt, src, s_src)


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from roofline import parse_trace

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="dma,maskdot,prefconv,int8a")
    ap.add_argument("--strided-scales", action="store_true")
    nsargs = ap.parse_args()
    modes = nsargs.modes.split(",")
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(-127, 127, size=(L, C_STORE, TR),
                                   dtype=np.int8))
    if nsargs.strided_scales:
        # real layout: sT[L, gp, R] sliced [*, off:off+TR] per tile —
        # model a 10-tile row length so the slice is strided like the 12B
        s_src = jnp.asarray(
            rng.standard_normal((L, GP, 10 * TR)).astype(np.float32))
    else:
        s_src = jnp.asarray(
            rng.standard_normal((L, GP, TR)).astype(np.float32))
    nbytes = (src.nbytes + src.nbytes // 3) * REPS  # quants + one TR scale slice per tile
    print("backend:", jax.default_backend(),
          f"| {nbytes/1e6:.0f} MB per dispatch "
          f"({src.nbytes // (1024*1024)}+{s_src.nbytes // (1024*1024)} MiB "
          f"quants+scales x{REPS})", flush=True)
    for mode in modes:
        out = run(jnp.asarray([0.0], jnp.float32), src, s_src, mode=mode)
        out.block_until_ready()
        tdir = f"/tmp/llmi_maskdot_trace_{mode}"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        for i in range(2):
            out = run(jnp.asarray([float(i + 1)], jnp.float32), src, s_src,
                      mode=mode)
            out.block_until_ready()
        jax.profiler.stop_trace()
        _, _, _, total_us = parse_trace(tdir, 2)
        dt = total_us / 2 / 1e6
        print(f"{mode:9s}: {dt*1e3:7.2f} ms (device) -> "
              f"{nbytes/dt/1e9:5.0f} GB/s-equivalent "
              f"(chk {float(out[0, 0]):.3e})", flush=True)


if __name__ == "__main__":
    main()
