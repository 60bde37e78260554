"""Activation quantizers: the q8_0 / q8_K numerical contract.

The reference quantizes the f32 activation vector on the fly before every
integer GEMV (reference ops.cpp:116-178); matching its rounding exactly is
what makes quantized matmul outputs line up with llama.cpp. Two encodings:

  q8_0 (32-block, used for Q4_0/Q8_0 weights, reference ops.cpp:116-139):
      d   = amax/127, stored rounded to f16
      q   = nearest_int(x / d)            (from the UNROUNDED inverse)
      x'  = q * f32(f16(d))

  q8_K (256-block, used for Q4_K/Q6_K weights, reference ops.cpp:142-178):
      iscale = -127/max  (max = signed value of the largest |x|)
      q      = clamp(nearest_int(iscale*x), -128, 127)
      d      = 1/iscale, stored as f32
      bsums  = per-16 sums of q (consumed by the Q4_K min-correction)

``roundtrip_*`` return the dequantized activations x' — a quantized matmul
of W' (dequantized weights) with x' is mathematically identical to the
reference's integer-dot formulation including its bsums min-correction
(reference ops.cpp:614-706), so the framework can run the contract on the
MXU as a plain matmul or as an int8 dot without changing results.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .numerics import f16_round, nearest_int


def _to_blocks(x: Array, block: int) -> Array:
    if x.shape[-1] % block:
        raise ValueError(f"activation length {x.shape[-1]} not a multiple of {block}")
    return x.reshape(x.shape[:-1] + (x.shape[-1] // block, block))


def quantize_q8_0(x: Array) -> tuple[Array, Array]:
    """Quantize [..., N] f32 activations to (d [..., N/32] f32-of-f16,
    q [..., N/32, 32] int32). Mirrors reference ops.cpp:116-139."""
    xb = _to_blocks(x.astype(jnp.float32), 32)
    amax = jnp.max(jnp.abs(xb), axis=-1)
    d = amax / 127.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = nearest_int(xb * inv[..., None])
    return f16_round(d), q


def roundtrip_q8_0(x: Array) -> Array:
    """Quantize-dequantize activations through the q8_0 contract."""
    d, q = quantize_q8_0(x)
    xb = q.astype(jnp.float32) * d[..., None]
    return xb.reshape(x.shape)


def quantize_q8_k(x: Array) -> tuple[Array, Array, Array]:
    """Quantize [..., N] activations to (d [..., N/256] f32,
    q [..., N/256, 256] int32, bsums [..., N/256, 16] int32).
    Mirrors reference ops.cpp:142-178."""
    xb = _to_blocks(x.astype(jnp.float32), 256)
    absx = jnp.abs(xb)
    amax_idx = jnp.argmax(absx, axis=-1)
    amax = jnp.take_along_axis(absx, amax_idx[..., None], axis=-1)[..., 0]
    smax = jnp.take_along_axis(xb, amax_idx[..., None], axis=-1)[..., 0]
    nonzero = amax > 0
    iscale = jnp.where(nonzero, -127.0 / jnp.where(nonzero, smax, 1.0), 0.0)
    q = jnp.clip(nearest_int(iscale[..., None] * xb), -128, 127)
    q = jnp.where(nonzero[..., None], q, 0)
    d = jnp.where(nonzero, 1.0 / jnp.where(nonzero, iscale, 1.0), 0.0)
    bsums = jnp.sum(q.reshape(q.shape[:-1] + (16, 16)), axis=-1)
    return d, q, bsums


def roundtrip_q8_k(x: Array) -> Array:
    """Quantize-dequantize activations through the q8_K contract."""
    d, q, _ = quantize_q8_k(x)
    xb = q.astype(jnp.float32) * d[..., None]
    return xb.reshape(x.shape)
