#!/usr/bin/env python
"""Microbenchmark: strided last-dim tile DMA vs contiguous pre-tiled DMA.

The streamed capacity megakernel (fused_decode_stream.py) DMAs weight
tiles as qT[l, :, off:off+TR] out of [L, c_store, R] — c_store separate
TR-byte runs with stride R through HBM. The 1B whole-layer kernels copy
whole contiguous arrays and reach 88-89% of HBM speed-of-light; the 12B
layer stream floors at ~60-65%. This isolates the DMA pattern: stream
the same bytes (a) strided, (b) from a [L, nt, c_store, TR] tile-major
copy of the same data, with the kernel's exact double-buffer pattern.

    python tools/dma_bench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# gate_up-like part at the 12B geometry (q4-packed rows)
L, C_STORE, R, TR = 8, 1920, 30720, 3072
NT = R // TR
REPS = 16  # in-kernel repeats: one dispatch streams L*REPS layer-parts


def _kernel(salt_ref, src_ref, o_ref, buf, acc, sem, *, tiled):
    def copy(l, t, slot):
        if tiled:
            return pltpu.make_async_copy(src_ref.at[l, t], buf.at[slot],
                                         sem.at[slot])
        return pltpu.make_async_copy(
            src_ref.at[l, :, pl.ds(t * TR, TR)], buf.at[slot], sem.at[slot])

    acc[...] = jnp.full_like(acc, salt_ref[0])

    def rep(r_, carry):
        copy(0, 0, 0).start()
        copy(0, 1, 1).start()

        def body(i, carry2):
            l = i // NT
            t = jax.lax.rem(i, NT)
            slot = jax.lax.rem(i, 2)
            copy(l, t, slot).wait()
            # cheap consume: the DMA is an explicit side effect and
            # cannot be elided; a full-buffer reduce would be VPU-bound
            acc[...] += jnp.sum(buf[slot, :1, :].astype(jnp.float32))
            nxt = i + 2

            @pl.when(nxt < L * NT)
            def _():
                copy(nxt // NT, jax.lax.rem(nxt, NT),
                     jax.lax.rem(nxt, 2)).start()

            return carry2

        jax.lax.fori_loop(0, L * NT, body, 0)
        return carry

    jax.lax.fori_loop(0, REPS, rep, 0)
    o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("tiled",))
def run(salt, src, *, tiled):
    return pl.pallas_call(
        functools.partial(_kernel, tiled=tiled),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C_STORE, TR), jnp.int8),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(salt, src)


def main():
    rng = np.random.default_rng(0)
    flat = rng.integers(-127, 127, size=(L, C_STORE, R), dtype=np.int8)
    strided = jnp.asarray(flat)
    tiledv = jnp.asarray(
        np.ascontiguousarray(
            flat.reshape(L, C_STORE, NT, TR).transpose(0, 2, 1, 3)))
    nbytes = flat.nbytes
    print("backend:", jax.default_backend(), jax.devices())
    for name, src, tiled in (("strided", strided, False),
                             ("tiled", tiledv, True)):
        import os, sys
        sys.path.insert(0, os.path.dirname(__file__))
        from roofline import parse_trace
        out = run(jnp.asarray([0.0], jnp.float32), src, tiled=tiled)
        out.block_until_ready()  # compile
        tdir = f"/tmp/llmi_dma_trace_{name}"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        for i in range(2):
            out = run(jnp.asarray([float(i + 1)], jnp.float32), src,
                      tiled=tiled)
            out.block_until_ready()
        jax.profiler.stop_trace()
        _, _, _, total_us = parse_trace(tdir, 2)
        dt = total_us / 2 / 1e6  # device seconds per dispatch
        total = nbytes * REPS
        print(f"{name}: {total/1e6:.0f} MB in {dt*1e3:.2f} ms (device) "
              f"-> {total/dt/1e9:.0f} GB/s (checksum {float(out[0,0]):.3e})",
              flush=True)


if __name__ == "__main__":
    main()
