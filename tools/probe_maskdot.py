#!/usr/bin/env python
"""Probe (dev tool): the group-masked-dot lossless GEMV formulation.

y[r] = sum_g s[r,g] * (x_g . w_{r,g}) with weights stored TRANSPOSED
[C, R] int8 and scales transposed+block-padded [Gp, R] f32:

  per contraction block b of BG groups (M = BG <= 16 sublanes):
    Xb [M, BC] = broadcast(x[:, blk]) * (iota mask)      # VPU, tiny
    Pb [M, R]  = dot(Xb bf16, q[blk, :] int8)            # MXU, M rides free
    y += sum_sublanes(scaleT[b] * Pb)                    # VPU f32, ~3% els

Checks (1) Mosaic compiles it, (2) numerics vs exact, (3) effective
weight-byte throughput vs the plain [1,C]x[C,R] mixed GEMV.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GS = 32


def make_maskdot_kernel(C, R, BG, BC, nblk, Mp):
    def kernel(x_ref, q_ref, s_ref, o_ref):
        acc = None
        for b in range(nblk):
            xb = x_ref[:, b * BC : (b + 1) * BC]  # [1, BC] bf16
            sub = jax.lax.broadcasted_iota(jnp.int32, (Mp, BC), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Mp, BC), 1)
            # arithmetic 0/1 mask (no i1 vectors: Mosaic relayout limits);
            # rows >= BG come out all-zero
            m = jnp.maximum(0, 1 - jnp.abs(lane // GS - sub)).astype(jnp.bfloat16)
            xm = xb * m  # [1, BC] broadcast up to [Mp, BC]
            pb = jax.lax.dot_general(
                xm, q_ref[b * BC : (b + 1) * BC, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Mp, R]
            contrib = s_ref[b * Mp : (b + 1) * Mp, :] * pb
            part = jnp.sum(contrib, axis=0, keepdims=True)
            acc = part if acc is None else acc + part
        o_ref[:] = acc

    return kernel


def gemv_kernel(x_ref, q_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def build(C, R):
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(R, C)).astype(np.int8)
    s = (rng.random((R, C // GS)) * 0.05 + 0.01).astype(np.float32)
    x = (rng.random((1, C)) - 0.5).astype(np.float32)
    w = (q.astype(np.float32).reshape(R, C // GS, GS) * s[..., None]).reshape(R, C)
    ref = x @ w.T

    # block geometry: M in {16, 12, 8} with M*GS | C
    for M in (16, 12, 8):
        if C % (M * GS) == 0:
            BG = M
            break
    else:
        raise ValueError(C)
    BC = BG * GS
    nblk = C // BC
    Mp = 16  # padded sublane rows per block
    sT = np.zeros((nblk * Mp, R), np.float32)
    for b in range(nblk):
        sT[b * Mp : b * Mp + BG, :] = s[:, b * BG : (b + 1) * BG].T
    return x, q, s, sT, ref, BG, BC, nblk, Mp


def run_maskdot(C, R):
    x, q, s, sT, ref, BG, BC, nblk, Mp = build(C, R)
    qT = np.ascontiguousarray(q.T)  # [C, R]

    f = pl.pallas_call(
        make_maskdot_kernel(C, R, BG, BC, nblk, Mp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
    )
    out = np.asarray(f(jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(qT),
                       jnp.asarray(sT)))
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
    print(f"maskdot C={C} R={R} BG={BG}: max rel err {rel.max():.2e}")
    return f


def timeit(tag, step_fn, args, iters=(20, 80)):
    """Dependent-chain timing inside one jit (tunnel-latency cancelled)."""

    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n, x, *rest):
        def body(xx, _):
            y = step_fn(xx, *rest)
            # feed a bf16 [1, C]-shaped value back in
            return (xx * 0 + y[0, : xx.shape[1]].astype(xx.dtype)[None, :] * 1e-6 + xx), y[0, 0]

        _, ys = jax.lax.scan(body, x, None, length=n)
        return ys

    ts = []
    for n in iters:
        np.asarray(chain(n, *args))
        t0 = time.perf_counter()
        np.asarray(chain(n, *args))
        ts.append(time.perf_counter() - t0)
    per = (ts[1] - ts[0]) / (iters[1] - iters[0])
    print(f"{tag}: {per*1e6:.1f} us/iter")
    return per


def main():
    # correctness first, small
    run_maskdot(1152, 1536)
    run_maskdot(1024, 1152)
    run_maskdot(6912, 1152)

    # throughput: gate_up-like big weight [C=1152, R=13824]
    C, R = 1152, 13824
    x, q, s, sT, ref, BG, BC, nblk, Mp = build(C, R)
    qT = jnp.asarray(np.ascontiguousarray(q.T))
    sTj = jnp.asarray(sT)
    xb = jnp.asarray(x).astype(jnp.bfloat16)

    mask_f = pl.pallas_call(
        make_maskdot_kernel(C, R, BG, BC, nblk, Mp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
    )
    gemv_f = pl.pallas_call(
        gemv_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
    )
    nbytes = C * R
    t1 = timeit("plain mixed GEMV", lambda xx, qq: gemv_f(xx, qq), (xb, qT))
    print(f"  -> {nbytes/t1/1e9:.0f} GB/s weight stream")
    t2 = timeit("masked-dot lossless", lambda xx, qq, ss: mask_f(xx, qq, ss),
                (xb, qT, sTj))
    print(f"  -> {nbytes/t2/1e9:.0f} GB/s weight stream ({t2/t1:.2f}x the GEMV)")


if __name__ == "__main__":
    main()
