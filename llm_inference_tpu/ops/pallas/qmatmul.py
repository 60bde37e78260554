"""Fused dequant + matmul kernel over packed quantized weights.

y[T, R] = x[T, C] @ dequant(q, scale, offset)[R, C]^T

Weights stay packed in HBM as GROUP-STRIDED int8 [R, C] with per-group f32
scales (quant/device.py QuantTensor): device column s*G+g holds logical
element g*S+s, so expanding scale [R, G] across all C columns is a single
lane-tiling ``pltpu.repeat`` — the only [R, G] -> [R, C] broadcast Mosaic
lowers without an (unsupported) shape cast. Activations are permuted into
the same column order outside the kernel (a free XLA transpose on a tiny
tensor), so the contraction matches element-for-element.

Each grid step DMAs one row-tile into VMEM, dequantizes in registers
(VPU), and contracts on the MXU. Against the XLA dequant-then-matmul
fallback (which materializes the dequantized matrix in HBM every call)
this moves ~1 byte per weight instead of ~5 on the bandwidth-bound decode
path — the TPU analogue of the reference's fused SIMD GEMVs (reference
ops.cpp:188-456).

Scope: activations [T, C] must fit VMEM alongside one weight tile, so this
is the decode/small-batch path (T <= ~64). Prefill GEMMs use the XLA bf16
path where the MXU, not HBM, is the roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.device import QuantTensor

_LANE = 128


def _row_tile(rows: int, cols: int) -> int:
    """Largest row tile whose int8 + dequantized-bf16 copies fit the VMEM
    budget — fewer grid steps amortize per-step overhead on GEMV shapes."""
    budget = 8 * 1024 * 1024
    best = rows
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            best = cand
            if cand * cols * 3 <= budget:
                return cand
    return best


def supports_pallas(qt: QuantTensor, t: int) -> bool:
    """Can quant_matmul handle this weight/batch on the TPU backend?"""
    if t > 64:
        return False
    if qt.cols % _LANE:
        return False
    tile = _row_tile(qt.rows, qt.cols)
    # one dequantized f32 tile + double-buffered int8 tiles must fit VMEM
    vmem = tile * qt.cols * (4 + 2 * 1) + t * qt.cols * 4
    return vmem < 12 * 1024 * 1024


def _make_kernel(group_size: int, has_offset: bool, rowwise: bool):
    def kernel(x_ref, q_ref, s_ref, *rest):
        if has_offset:
            off_ref, o_ref = rest
        else:
            (o_ref,) = rest
        # Dequantize in bf16: int8 quants (|q| <= 127) and the bf16-rounded
        # group scales are serve-mode precision; halves VPU work and runs
        # the MXU at full bf16 rate with f32 accumulation.
        w = q_ref[:].astype(jnp.bfloat16)  # [TILE_R, C] group-strided
        if rowwise:
            # one group per row (requantize_rowwise): scale the small
            # [T, TILE_R] OUTPUT instead of expanding across C columns
            y = jax.lax.dot_general(
                x_ref[:].astype(jnp.bfloat16), w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[:] = y * s_ref[:, 0][None, :]
            return
        w = w * pltpu.repeat(s_ref[:], group_size, axis=1).astype(jnp.bfloat16)
        if has_offset:
            w = w - pltpu.repeat(off_ref[:], group_size, axis=1).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def _run(x, q, scale, offset, *, group_size, interpret=False):
    T, C = x.shape
    R, G = scale.shape
    tile = _row_tile(R, C)
    grid = (R // tile,)

    in_specs = [
        pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),  # x: whole
        pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, q, scale]
    if offset is not None:
        in_specs.append(pl.BlockSpec((tile, G), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(offset)

    return pl.pallas_call(
        _make_kernel(group_size, offset is not None, rowwise=(G == 1)),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * R * C,
            bytes_accessed=R * C + R * G * 4 + T * C * 4 + T * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def quant_matmul(qt: QuantTensor, x: Array, *, interpret: bool = False) -> Array:
    """Fused y = x @ W^T over a packed QuantTensor. x: [T, C] -> [T, R] f32."""
    if x.ndim != 2 or x.shape[-1] != qt.cols:
        raise ValueError(f"quant_matmul: x {x.shape} vs weight cols {qt.cols}")
    xs = qt.stride_activations(x.astype(jnp.float32))
    return _run(
        xs, qt.q, qt.scale, qt.offset, group_size=qt.group_size, interpret=interpret
    )


# ---------------------------------------------------------------------------
# true 4-bit packed variant (quant/device.py Q4Tensor): 0.5 bytes/weight


def _make_kernel_q4(group_size: int, has_offset: bool, centered: bool):
    def kernel(x_ref, p_ref, s_ref, *rest):
        if has_offset:
            off_ref, o_ref = rest
        else:
            (o_ref,) = rest
        # packed int8 (Mosaic lacks uint8->bf16 casts and int8 shifts);
        # widen to int32 for the nibble extraction. low nibble: device col c,
        # high nibble: col c + C/2.
        p = p_ref[:].astype(jnp.int32)  # [TILE_R, C/2]
        lo = (p & 0xF).astype(jnp.bfloat16)
        hi = ((p >> 4) & 0xF).astype(jnp.bfloat16)
        w = jnp.concatenate([lo, hi], axis=1)  # [TILE_R, C] device-strided
        if centered:
            w = w - jnp.bfloat16(8.0)
        w = w * pltpu.repeat(s_ref[:], group_size, axis=1).astype(jnp.bfloat16)
        if has_offset:
            w = w - pltpu.repeat(off_ref[:], group_size, axis=1).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("group_size", "centered", "interpret"))
def _run_q4(x, packed, scale, offset, *, group_size, centered, interpret=False):
    T, C = x.shape
    R, G = scale.shape
    tile = _row_tile(R, C)
    grid = (R // tile,)

    in_specs = [
        pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, C // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, packed, scale]
    if offset is not None:
        in_specs.append(pl.BlockSpec((tile, G), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(offset)

    return pl.pallas_call(
        _make_kernel_q4(group_size, offset is not None, centered),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * R * C,
            bytes_accessed=R * C // 2 + R * G * 4 + T * C * 4 + T * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def q4_matmul(qt, x: Array, *, interpret: bool = False) -> Array:
    """Fused y = x @ W^T over a nibble-packed Q4Tensor: [T, C] -> [T, R]."""
    if x.ndim != 2 or x.shape[-1] != qt.cols:
        raise ValueError(f"q4_matmul: x {x.shape} vs weight cols {qt.cols}")
    xs = qt.stride_activations(x.astype(jnp.float32))
    return _run_q4(
        xs, qt.packed, qt.scale, qt.offset,
        group_size=qt.group_size, centered=qt.centered, interpret=interpret,
    )
