"""Core numerics: RMS norm, RoPE, GELU, softcaps, f16 rounding points.

These mirror the numerical contract of the reference engine's scalar ops
(reference ops.cpp:28-105, model.cpp:504-541) — the places where it rounds
through IEEE float16 are load-bearing for cross-engine parity, so they are
modeled explicitly with ``f16_round`` and applied only at the exact points
the reference rounds (and nowhere else, to keep XLA free to fuse).

Everything here is shape-polymorphic jnp code operating on the trailing
axis, usable both inside jit-compiled model code and in Pallas kernels.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array


def f16_round(x: Array) -> Array:
    """Round f32 values through IEEE binary16 and back (round-to-nearest-even).

    Models the reference's ``f32_to_f16``/``f16_to_f32`` round-trips
    (reference gguf.cpp:40-97) at parity-critical points: KV-cache stores,
    the Q downcast before the QK dot (reference model.cpp:504-509), and
    activation-quant scale storage.
    """
    return x.astype(jnp.float16).astype(x.dtype)


def nearest_int(x: Array) -> Array:
    """Round-to-nearest-even to int32.

    The reference's magic-number ``nearest_int`` (reference ops.cpp:107-113)
    adds 2^23+2^22 in f32, which rounds at integer granularity under the
    default round-to-nearest-even mode — identical to ``rint``.
    """
    return jnp.rint(x).astype(jnp.int32)


def rms_norm(x: Array, eps: float) -> Array:
    """RMS normalization over the trailing axis (reference ops.cpp:28-43).

    scale = 1/sqrt(mean(x^2) + eps); the weight multiply is done by the
    caller (reference run_norm, model.cpp:361-386) because some call sites
    (gemma4 V-norm, per-layer proj norm) normalize without a weight.
    """
    x = x.astype(jnp.float32)
    mean_sq = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x / jnp.sqrt(mean_sq + eps)


def rope(x: Array, *, n_rot: int, freq_base: float, freq_scale: float, pos: Array) -> Array:
    """NeoX-style split-half rotary embedding (reference ops.cpp:67-95).

    ``x`` is [..., T, H, D] with D >= n_rot; pair (i, i + n_rot/2) rotates by
    angle pos * base^(-2i/n_rot) / freq_scale. ``pos`` is the absolute
    position of each of the T tokens, shape [T] (or scalar start offset).
    """
    half = n_rot // 2
    i = jnp.arange(half, dtype=jnp.float32)
    freq = 1.0 / jnp.power(jnp.float32(freq_base), 2.0 * i / n_rot)  # [half]
    pos = jnp.asarray(pos, dtype=jnp.float32)
    if pos.ndim == 0:
        pos = pos[None]
    val = pos[:, None] * freq[None, :] / jnp.float32(freq_scale)  # [T, half]
    cos = jnp.cos(val)[:, None, :]  # [T, 1, half]
    sin = jnp.sin(val)[:, None, :]

    x = x.astype(jnp.float32)
    x0 = x[..., :half]
    x1 = x[..., half : 2 * half]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    if x.shape[-1] > 2 * half:
        return jnp.concatenate([r0, r1, x[..., 2 * half :]], axis=-1)
    return jnp.concatenate([r0, r1], axis=-1)


def gelu_tanh(x: Array) -> Array:
    """Tanh-approximated GELU (reference model.cpp:884-889)."""
    x = x.astype(jnp.float32)
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def softcap(x: Array, cap: float) -> Array:
    """Logit soft-capping: cap * tanh(x / cap) (reference model.cpp:511-513,
    1036-1041). ``cap`` <= 0 disables (returns x unchanged)."""
    if cap is None or cap <= 0.0:
        return x
    return cap * jnp.tanh(x / cap)
