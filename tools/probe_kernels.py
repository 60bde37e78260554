#!/usr/bin/env python
"""Microbenchmark probes for megakernel design decisions (dev tool).

The axon-tunnel device does NOT block on block_until_ready, and a bare
Python dispatch loop measures tunnel latency (~35 ms/dispatch), so every
probe here runs N dependent iterations inside ONE jitted lax.scan and
times the HOST FETCH, reporting the delta between two lengths
(per-iteration device time with the constant tunnel overhead cancelled).

Probes:
  1. logits GEMV: XLA W8A8 dot vs Pallas int8xint8 tiled GEMV
  2. group-scale expansion strategies inside a Pallas dequant-matmul
     (strided pltpu.repeat vs logical jnp.repeat vs 3-D broadcast)
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 262144, 1152  # tied-embedding logits geometry (Gemma-3 1B)


def measure(fn, *args, ns=(10, 40)):
    """Per-iteration seconds via delta between two chain lengths."""
    ts = []
    for n in ns:
        np.asarray(fn(*args, n=n))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(*args, n=n))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (ns[1] - ns[0])


def chain(step):
    """Wrap a [1,C]->[1,R] step into a dependent scan returning checksums."""

    @functools.partial(jax.jit, static_argnums=(0,))
    def run(n, *args):
        x = args[-1]
        wargs = args[:-1]

        def body(x, _):
            y = step(*wargs, x)
            return jnp.tanh(y[:, : x.shape[1]]), y[0, 0]

        _, ys = jax.lax.scan(body, x, None, length=n)
        return ys

    def runner(*args, n):
        return run(n, *args)

    return runner


# --- 1. logits GEMV ---------------------------------------------------------

def xla_w8a8(q, scale, x):
    x2 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    d = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x2 / d), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * d * scale[:, 0][None, :]


def _gemv_kernel(x_ref, q_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:, 0][None, :]


def pallas_w8a8(tile):
    def step(q, scale, x):
        T = x.shape[0]
        x2 = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
        d = jnp.where(amax > 0, amax / 127.0, 1.0)
        xq = jnp.clip(jnp.round(x2 / d), -127, 127).astype(jnp.int8)
        y = pl.pallas_call(
            _gemv_kernel,
            grid=(R // tile,),
            in_specs=[
                pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
            cost_estimate=pl.CostEstimate(flops=2 * T * R * C, bytes_accessed=R * C,
                                          transcendentals=0),
        )(xq, q, scale)
        return y * d
    return step


# --- 2. scale expansion inside a grouped dequant-matmul ---------------------

GS = 32
RG, CG = 6912, 1152  # gate/up-like weight


def _k_strided(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)
    w = w * pltpu.repeat(s_ref[:], GS, axis=1).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(x_ref[:].astype(jnp.bfloat16), w,
                                   dimension_numbers=(((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


def _k_logical_repeat(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)
    w = w * jnp.repeat(s_ref[:], GS, axis=1).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(x_ref[:].astype(jnp.bfloat16), w,
                                   dimension_numbers=(((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


def _k_3d(x_ref, q_ref, s_ref, o_ref):
    tile = q_ref.shape[0]
    w = q_ref[:].reshape(tile, CG // GS, GS).astype(jnp.bfloat16)
    w = w * s_ref[:][..., None].astype(jnp.bfloat16)
    w = w.reshape(tile, CG)
    o_ref[:] = jax.lax.dot_general(x_ref[:].astype(jnp.bfloat16), w,
                                   dimension_numbers=(((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


def grouped_mm(kernel, tile=1152):
    G = CG // GS
    kfn = {"strided": _k_strided, "logical": _k_logical_repeat, "3d": _k_3d}[kernel]

    def step(q, s, x):
        T = x.shape[0]
        return pl.pallas_call(
            kfn,
            grid=(RG // tile,),
            in_specs=[
                pl.BlockSpec((T, CG), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, CG), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, RG), jnp.float32),
        )(x, q, s)
    return step


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())

    q = jnp.asarray(rng.integers(-127, 128, size=(R, C), dtype=np.int8))
    scale = jnp.asarray(rng.random((R, 1), dtype=np.float32) * 0.01)
    x = jnp.asarray(rng.standard_normal((1, C)).astype(np.float32))
    t = measure(chain(xla_w8a8), q, scale, x)
    print(f"logits XLA W8A8:            {t*1e6:8.1f} us  ({R*C/t/1e9:.0f} GB/s)")
    for tile in (2048, 4096, 8192):
        try:
            t = measure(chain(pallas_w8a8(tile)), q, scale, x)
            print(f"logits Pallas int8 t={tile:5d}: {t*1e6:8.1f} us  ({R*C/t/1e9:.0f} GB/s)")
        except Exception as e:
            print(f"logits Pallas int8 t={tile:5d}: FAILED: {str(e).splitlines()[0][:100]}")

    qg = jnp.asarray(rng.integers(-8, 8, size=(RG, CG), dtype=np.int8))
    sg = jnp.asarray(rng.random((RG, CG // GS), dtype=np.float32) * 0.01)
    xg = jnp.asarray(rng.standard_normal((1, CG)).astype(np.float32))
    for k in ("strided", "logical", "3d"):
        try:
            t = measure(chain(grouped_mm(k)), qg, sg, xg)
            print(f"grouped mm [{k:8s}]:      {t*1e6:8.1f} us  ({RG*CG/t/1e9:.0f} GB/s)")
        except Exception as e:
            print(f"grouped mm [{k:8s}]:      FAILED: {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
