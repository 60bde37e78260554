#!/usr/bin/env python
"""Probe (dev tool): lossless-megakernel building blocks on the real chip.

1. manual async_copy of a [R, G] bf16 scale slice out of a stacked
   [L, R, G] HBM array (G=36 — sub-128 minor dim) into VMEM
2. pltpu.repeat lane-tiling expansion of that scale buffer to [R, C]
   and a chunked cast-dequant dot (the serve-q megakernel weight stage)
3. the attn permutation matmul [1, A] x [A, A] one-hot bf16
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, R, G, GS = 4, 256, 36, 32
C = G * GS  # 1152


def kernel(x_ref, q_ref, s_ref, o_ref, qb, sb, sem):
    l = 1  # fixed layer slice
    cq = pltpu.make_async_copy(q_ref.at[l], qb, sem.at[0])
    cs = pltpu.make_async_copy(s_ref.at[l], sb, sem.at[1])
    cq.start()
    cs.start()
    cq.wait()
    cs.wait()
    sexp = pltpu.repeat(sb[:], GS, axis=1)  # [R, C] strided expansion
    tile = 128
    for r0 in range(0, R, tile):
        w = qb[r0 : r0 + tile, :].astype(jnp.bfloat16) * sexp[
            r0 : r0 + tile, :
        ].astype(jnp.bfloat16)
        o_ref[:, r0 : r0 + tile] = jax.lax.dot_general(
            x_ref[:], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def main():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(L, R, C)).astype(np.int8)
    s = (rng.random((L, R, G)) * 0.1 + 0.01).astype(np.float32)
    sb16 = jnp.asarray(s).astype(jnp.bfloat16)
    x = (rng.random((1, C)) - 0.5).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, C), jnp.int8),
            pltpu.VMEM((R, G), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xb, jnp.asarray(q), sb16)
    out = np.asarray(out)

    # expected: strided layout means device col j=s*G+g uses scale[:, g]
    sexp = np.repeat(s[1][:, None, :], GS, axis=1).reshape(R, C)  # tile pattern
    # tiling repeat: [R, G] -> [R, GS*G] concatenating copies => col j -> j % G
    sexp = np.tile(s[1], (1, GS))
    wf = q[1].astype(np.float32) * sexp
    ref = (
        x.astype(np.float32) @ (q[1].astype(np.float32) * sexp).T
    )
    # bf16-ify to match kernel numerics roughly
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    print("probe1+2 scale-DMA+repeat+chunked dot: max rel err", rel.max())

    # 3. permutation matmul
    A = 1024
    perm = rng.permutation(A)
    P = np.zeros((A, A), np.float32)
    P[perm, np.arange(A)] = 1.0

    def pkern(a_ref, p_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], p_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a = (rng.random((1, A)) - 0.5).astype(np.float32)
    po = pl.pallas_call(
        pkern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, A), jnp.float32),
    )(jnp.asarray(a).astype(jnp.bfloat16), jnp.asarray(P).astype(jnp.bfloat16))
    ok = np.allclose(np.asarray(po)[0], a[0][perm], atol=2e-2)
    print("probe3 perm matmul:", "OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
