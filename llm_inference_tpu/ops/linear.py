"""Quantized linear layers: y = x @ W^T with the reference's numeric contract.

The reference dispatches a per-format fused dequant+GEMV on every matmul
(reference ops.cpp:933-956). Here the same numerical contract is expressed
as XLA-friendly batched matmuls:

  1. the activation is rounded through the format's activation-quant
     contract (q8_0 / q8_K / f16-downcast / none) — ops/actquant.py;
  2. the weight is dequantized to its exact reference f32 values;
  3. a plain f32 matmul contracts them.

Because dequantization is exact and the integer dot distributes over the
per-block scales, this is mathematically identical to the reference's
integer formulation (including Q4_K's bsums min-correction) while mapping
onto the MXU as one large GEMM. The Pallas kernels in ops/pallas fuse
steps 2-3 so packed blocks never materialize in HBM; this module is the
reference-correct fallback and the single-dispatch point.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..quant.device import (
    DenseTensor,
    Q4Tensor,
    QuantTensor,
    TQ4Tensor,
    TQuantTensor,
    WeightTensor,
)
from .actquant import roundtrip_q8_0, roundtrip_q8_k
from .numerics import f16_round


def contract_activations(x: Array, act_quant: str) -> Array:
    """Round activations through a weight format's quantization contract."""
    if act_quant == "q8_0":
        return roundtrip_q8_0(x)
    if act_quant == "q8_k":
        return roundtrip_q8_k(x)
    if act_quant == "f16":
        return f16_round(x.astype(jnp.float32))
    return x.astype(jnp.float32)


def matmul(
    w: WeightTensor, x: Array, *, exact: bool = True, mm_impl: str = "auto"
) -> Array:
    """y[..., r] = sum_c W[r, c] * x'[..., c], f32 accumulation.

    ``x`` is [..., cols]; returns [..., rows] f32.

    exact (parity mode): the activation passes through the reference's
    per-format quantization round-trip (ops/actquant.py) and the weight
    dequantizes to its exact f32 values — the reference's numeric contract
    as one MXU GEMM.

    serve mode (exact=False): the native-dtype weight (bf16 after load-time
    dequant, models/weights.py) multiplies the activation cast to the same
    dtype — full MXU rate, one weight-byte stream, no contract round-trip.

    ``mm_impl``:
      - "auto": single-stream decode heuristics — fused Pallas kernels for
        packed weights, one XLA W8A8 dot for huge-R rowq8 (tied logits).
      - "xla": never launch a Pallas grid. The batched-serving path: under
        vmap a Pallas grid lowers to a per-lane loop (measured 3.8x slower
        than one batched XLA GEMM), so rowq8 runs as a single W8A8 integer
        dot and grouped/packed weights dequantize into the GEMM operand.
    """
    if x.shape[-1] != w.cols:
        raise ValueError(f"matmul: x has {x.shape[-1]} features, weight expects {w.cols}")
    if mm_impl not in ("auto", "xla"):
        raise ValueError(f"unknown mm_impl {mm_impl!r}")
    if exact:
        xr = contract_activations(x, w.act_quant)
        wd = w.dequant(jnp.float32)
        # HIGHEST: true-f32 MXU passes. The TPU default silently computes
        # f32 matmuls at bf16 precision, which breaks the exact contract.
        return jnp.matmul(xr, wd.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    if isinstance(w, (TQuantTensor, TQ4Tensor)):
        # masked-dot megakernel layout (quant/device.py): T=1 decode runs
        # the whole-step kernel before reaching here (models/gemma.py);
        # this is the prefill/fallback path — dequantize into the GEMM
        # operand (MXU-bound for prefill buckets, exact f32 scales).
        wd = w.dequant(jnp.bfloat16)
        return jnp.matmul(x.astype(wd.dtype), wd.T, preferred_element_type=jnp.float32)
    if isinstance(w, (QuantTensor, Q4Tensor)):
        from .pallas import q4_matmul, quant_matmul, supports_pallas

        t = 1 if x.ndim == 1 else int(np.prod(x.shape[:-1]))
        if (
            isinstance(w, QuantTensor)
            and w.groups == 1
            and (
                w.rows >= 16384
                or mm_impl == "xla"
                or os.environ.get("LLMI_Q8_XLA", "0") == "1"
            )
            and jax.default_backend() == "tpu"
        ):
            # W8A8 as ONE XLA int8 dot. Always right for huge-R matmuls
            # (the tied-logits GEMM: a 100+-step Pallas grid loses) and for
            # batched serving (vmap turns it into one batched integer
            # GEMM — 1189 tok/s at batch 8 vs 312 for vmapped Pallas).
            # Single-stream layer matmuls keep the fused Pallas kernel
            # (429 vs 408 tok/s measured).
            y = int8_rowwise_matmul(w, x.reshape(t, w.cols))
            return y.reshape(x.shape[:-1] + (w.rows,))
        if mm_impl == "auto" and jax.default_backend() == "tpu" and supports_pallas(w, t):
            x2 = x.reshape(t, w.cols)
            y = q4_matmul(w, x2) if isinstance(w, Q4Tensor) else quant_matmul(w, x2)
            return y.reshape(x.shape[:-1] + (w.rows,))
        wd = w.dequant(jnp.bfloat16)
    else:
        wd = w.w
    xr = x.astype(wd.dtype)
    return jnp.matmul(xr, wd.T, preferred_element_type=jnp.float32)


def int8_rowwise_matmul(w: QuantTensor, x: Array) -> Array:
    """W8A8: per-row-int8 weight x per-row-int8 activation as one integer
    MXU contraction, output rescaled by both scales. x: [T, C] -> [T, R]."""
    x2 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    d = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x2 / d), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w.q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * d * w.scale[:, 0][None, :]


def embed_rows(w: WeightTensor, token_ids: Array) -> Array:
    """Gather + dequantize embedding rows (reference embed_tokens,
    model.cpp:240-334). Gathers the *packed* representation first so only
    the touched rows dequantize."""
    if isinstance(w, DenseTensor):
        return w.w[token_ids].astype(jnp.float32)
    assert isinstance(w, QuantTensor)
    strided = w.q[token_ids]  # [T, C] group-strided
    S, G = w.group_size, w.groups
    q = jnp.swapaxes(strided.reshape(token_ids.shape + (S, G)), -1, -2).astype(jnp.float32)
    s = w.scale[token_ids][..., None]
    rows = q * s
    if w.offset is not None:
        rows = rows - w.offset[token_ids][..., None]
    return rows.reshape(token_ids.shape + (w.cols,))
