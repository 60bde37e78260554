"""In-place KV row insertion for the batched/paged serving caches.

The batched per-op and paged decode paths append each lane's new K/V row
with an XLA scatter (``pool.at[idx].set(row, mode="drop")``). On TPU that
scatter does NOT lower in place: XLA materializes a full copy of the
operand per scatter — measured 52 ``copy bf16[96,256,1,256]`` kernels per
step at batch 32 x 4k paged (one per K and V pool per layer), ~9.1 ms of
a 13.2 ms step for writes totalling 32 KB of actual payload.

This kernel is the scatter's in-place replacement: the destination is
aliased input->output (``input_output_aliases``), and each lane's row is
one tiny VMEM->HBM DMA at a dynamic row offset. Out-of-range row ids
drop the write (parked lanes / unassigned pages), mirroring the
scatter's ``mode="drop"``.

Reference contrast: the C++ engine appends to a growing per-layer
``std::vector`` cache (model.cpp:461-474) — single request, host memory,
no aliasing problem to solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def layout_supported(H: int, C: int, dtype=jnp.bfloat16) -> bool:
    """True when a [rows, H, C] destination Mosaic-lowers on TPU.

    Probed on hardware (tools/probe_kv_insert_tpu.py): the kernel
    compiles and is bit-exact when the trailing two dims are
    [m >= 2, multiple of 128] — i.e. no lane padding and no
    single-sublane DMA destination. A degenerate [1, 256] head layout
    (Gemma-1B: n_head_kv=1, head_dim=256) is NOT directly lowerable but
    its row payload reshapes freely to [2, 128], which is; insert_rows
    applies that view automatically. Unsupported geometries (row
    payload not a multiple of 256 lanes' bytes) keep the XLA scatter.
    """
    del dtype
    if H >= 2 and C % 128 == 0:
        return True
    total = H * C
    return total % 128 == 0 and total // 128 >= 2


@functools.partial(jax.jit, static_argnames=("interpret",))
def insert_rows(dst, rows, rowidx, *, interpret=False):
    """Write ``rows[b]`` into ``dst[rowidx[b]]`` in place.

    dst: [R, H, d] (any dtype; the caller casts rows to match).
    rows: [B, H, d], same dtype as dst.
    rowidx: [B] int32; entries < 0 or >= R are dropped.
    Returns the updated dst (same buffer: aliased).

    Shapes are rank-3 on purpose: TPU tiling applies to the trailing two
    dims, so indexing the leading dim hits no tile-alignment constraint
    (Mosaic rejects 1-row slices of a tiled 2-D buffer). Callers reshape
    [B, S, H, d] caches / [P, PAGE, H, d] pools to [rows, H, d] — a free
    view, since the leading dims are untiled row-major.

    Degenerate trailing layouts that Mosaic rejects (H=1, or lane dim
    not a multiple of 128) are re-viewed row-major as [R, H*d/128, 128]
    when that is lowerable — a free reshape of the same row payload.
    """
    R, H, C = dst.shape
    if not interpret and not (H >= 2 and C % 128 == 0):
        total = H * C
        if total % 128 == 0 and total // 128 >= 2:
            m = total // 128
            out = insert_rows(dst.reshape(R, m, 128),
                              rows.reshape(rows.shape[0], m, 128),
                              rowidx, interpret=interpret)
            return out.reshape(R, H, C)
        raise ValueError(
            f"insert_rows: trailing layout [{H}, {C}] does not Mosaic-lower "
            "and has no [m>=2, 128] row-major view; use the XLA scatter "
            "(gate with layout_supported())")
    B = rows.shape[0]
    if rows.dtype != dst.dtype:
        raise ValueError(f"rows dtype {rows.dtype} != dst dtype {dst.dtype}")

    def kernel(idx_r, rows_r, dst_r, out_r, sem):
        del dst_r  # aliased with out_r; all access goes through out_r
        # Direct HBM->HBM row DMAs, ALL B in flight at once. Both the
        # source slice rows_r.at[b] and the destination slice
        # out_r.at[idx] index only the untiled leading dim of an
        # ANY-space buffer, which Mosaic accepts (tiling constraints
        # apply to the trailing two dims). No VMEM staging: the earlier
        # staged variant (2-deep scratch pipeline) serialized B tiny
        # transfers and measured SLOWER than the XLA scatter it replaces
        # at batch 32 (~5 ms/step of DMA latency across 52 pools);
        # concurrent HBM->HBM copies pay one latency for all B.
        # Duplicate in-range row ids would race — callers guarantee
        # distinct rows (each serving lane owns its slot/page).
        copies = []
        for b in range(B):
            cp = pltpu.make_async_copy(
                rows_r.at[b], out_r.at[rowidx_clamped(idx_r[b])], sem.at[b])
            copies.append(cp)

            @pl.when(in_range(idx_r[b]))
            def _(cp=cp):
                cp.start()
        for b in range(B):
            @pl.when(in_range(idx_r[b]))
            def _(cp=copies[b]):
                cp.wait()

    def in_range(i):
        return (i >= 0) & (i < R)

    def rowidx_clamped(i):
        # .at index must be in bounds even when the guarded DMA never
        # runs (interpret mode evaluates both sides of pl.when eagerly
        # enough to index); clamp to a valid row
        return jnp.clip(i, 0, R - 1)

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R, H, C), dst.dtype),
        input_output_aliases={2: 0},
        scratch_shapes=[pltpu.SemaphoreType.DMA((B,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray(rowidx, jnp.int32), rows, dst)
