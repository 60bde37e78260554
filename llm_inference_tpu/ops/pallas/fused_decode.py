"""Fused decode megakernel: one Pallas call per transformer layer.

The round-1 decode step launched ~4 Pallas matmuls plus ~14 XLA ops per
layer; profiler-measured leaf time was bandwidth-honest but the step lost
~45% to per-kernel fixed costs, rope/split/mask glue, and the VPU
int8->bf16 dequant cast (tools/probe_kernels.py: casts cap any kernel at
~520 GB/s while mixed bf16-activation x int8-weight ``dot_general`` runs
the MXU at ~755 GB/s with EXACT int8 semantics — int8 is exactly
representable in bf16).

One call covers the ENTIRE layer given the previous call's fused-QKV
output:

    qkv -> split -> q/k norms -> RoPE -> attention over the KV cache
      (masked online softmax + explicit self term for the new token)
      -> Wo -> [post_attn_norm] -> +x -> ffn_norm
      -> gate/up matmuls -> gelu_tanh * up -> down matmul
      -> [post_ffw_norm] -> +x2 -> next_norm -> W_next matmul

``W_next`` is the NEXT layer's fused QKV projection — or, for the last
layer, the tied-embedding logits matrix (final norm + logits GEMV ride
the same grid). The FFN is tiled along the hidden-ffn axis (gate rows /
up rows / down COLUMNS share a tile index, so no [1, n_ff] intermediate
ever exists); the next-matmul is tiled along its rows. Weights stream
HBM->VMEM double-buffered across the grid. The only XLA left per layer
is the two KV-cache row writes (the kernel emits the roped K / V, the
caller scatters them — reference contrast: model.cpp:461-474 grows
vectors; here the new row also feeds an explicit self-attention term so
the kernel never needs the updated cache).

Weight format: per-row int8 (QuantTensor with group_size == cols,
quant/device.py requantize_rowwise) — scales applied to the [1, tile]
outputs, never expanded. Reference counterpart of the chain:
model.cpp:751-841 (QKV/rope/attention), :843-854, :857-924 (FFN),
:983-1034 (final norm + tied logits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.device import QuantTensor

LANE = 128


def _pick_tile(total: int, width: int, budget: int, lane: int = LANE) -> int:
    """Largest row tile t dividing ``total`` with t % lane == 0 and
    t * width bytes <= budget (int8)."""
    best = 0
    t = lane
    while t <= total:
        if total % t == 0 and t * width <= budget:
            best = t
        t += lane
    if best == 0:
        raise ValueError(f"no lane-aligned tile for total={total} width={width}")
    return best


def _rms(v: Array, eps: float) -> Array:
    mean_sq = jnp.mean(jnp.square(v), axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(mean_sq + eps)


def _mixed_dot(x_bf16: Array, w_int8: Array) -> Array:
    """[m, C] bf16 x [R, C] int8 -> [m, R] f32 on the MXU (exact)."""
    return jax.lax.dot_general(
        x_bf16, w_int8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rope_rows(x: Array, cos: Array, sin: Array) -> Array:
    """NeoX split-half rotary on [rows, dk] with [1, dk//2] cos/sin."""
    half = cos.shape[1]
    x0 = x[:, :half]
    x1 = x[:, half : 2 * half]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    if x.shape[1] > 2 * half:
        return jnp.concatenate([r0, r1, x[:, 2 * half :]], axis=1)
    return jnp.concatenate([r0, r1], axis=1)


def _make_layer_kernel(
    *, nf: int, eps: float, attn_scale: float, softcap: float,
    H: int, Hkv: int, dk: int, dv: int,
    has_post_attn: bool, has_post_ffw: bool,
):
    """Kernel for grid j in [0, nf + nn): step 0 additionally runs
    attention + output projection; j < nf runs FFN tile j; step nf
    finalizes the FFN residual; j >= nf runs next-matmul tile j - nf."""
    group = H // Hkv

    def kernel(pos_ref, x_ref, qkv_ref, kc_ref, vc_ref, cos_ref, sin_ref,
               qn_w, kn_w, wo_q, wo_s, ffn_w, *rest):
        idx = 0
        pa_w = pf_w = None
        if has_post_attn:
            pa_w = rest[idx]; idx += 1
        if has_post_ffw:
            pf_w = rest[idx]; idx += 1
        (wg_q, wg_s, wu_q, wu_s, wd_q, wd_s, nn_w, wn_q, wn_s,
         x3_out, y_out, kn_out, vn_out, x2_s, h2_s, y3_s, h3_s) = rest[idx:]

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            pos = pos_ref[0]
            S = kc_ref.shape[0]
            qkv = qkv_ref[:]  # [1, Rq] f32
            q = qkv[:, : H * dk].reshape(H, dk)
            k = qkv[:, H * dk : H * dk + Hkv * dk].reshape(Hkv, dk)
            v = qkv[:, H * dk + Hkv * dk :].reshape(Hkv, dv)
            q = _rms(q, eps) * qn_w[:]
            k = _rms(k, eps) * kn_w[:]
            cos, sin = cos_ref[:], sin_ref[:]
            q = _rope_rows(q, cos, sin) * jnp.float32(attn_scale)
            k = _rope_rows(k, cos, sin)
            kb = k.astype(jnp.bfloat16)
            vb = v.astype(jnp.bfloat16)
            kn_out[:] = kb
            vn_out[:] = vb
            qb = q.astype(jnp.bfloat16)

            ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
            valid = ids < pos  # strictly-older rows; the new token is the
            # explicit self term below (cache row `pos` is written by the
            # caller after this kernel)

            outs = []
            for i in range(Hkv):
                qi = qb[i * group : (i + 1) * group, :]  # [G, dk] bf16
                ki = kc_ref[:, i, :]  # [S, dk] bf16
                s = jax.lax.dot_general(
                    qi, ki, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, S]
                s_self = jnp.sum(
                    qi.astype(jnp.float32) * kb[i : i + 1].astype(jnp.float32),
                    axis=1, keepdims=True,
                )  # [G, 1]
                if softcap > 0.0:
                    s = softcap * jnp.tanh(s / softcap)
                    s_self = softcap * jnp.tanh(s_self / softcap)
                s = jnp.where(valid, s, -jnp.inf)
                m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_self)
                p = jnp.where(valid, jnp.exp(s - m), 0.0)  # [G, S]
                p_self = jnp.exp(s_self - m)  # [G, 1]
                denom = jnp.sum(p, axis=1, keepdims=True) + p_self
                vi = vc_ref[:, i, :]  # [S, dv] bf16
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, dv]
                pv = pv + p_self * vb[i : i + 1].astype(jnp.float32)
                outs.append(pv / denom)
            attn = outs[0] if Hkv == 1 else jnp.concatenate(outs, axis=0)
            attn_flat = attn.reshape(1, H * dv).astype(jnp.bfloat16)

            y = _mixed_dot(attn_flat, wo_q[:]) * wo_s[:, 0][None, :]  # [1, D]
            if has_post_attn:
                y = _rms(y, eps) * pa_w[:]
            x2 = x_ref[:] + y
            x2_s[:] = x2
            h2_s[:] = (_rms(x2, eps) * ffn_w[:]).astype(jnp.bfloat16)
            y3_s[:] = jnp.zeros_like(x2)

        @pl.when(j < nf)
        def _():
            h2 = h2_s[:]
            g = _mixed_dot(h2, wg_q[:]) * wg_s[:, 0][None, :]  # [1, tf]
            u = _mixed_dot(h2, wu_q[:]) * wu_s[:, 0][None, :]
            # gelu_tanh (reference model.cpp:884-889)
            c = jnp.float32(0.7978845608028654)
            a = 0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))) * u
            y3_s[:] += jax.lax.dot_general(
                a.astype(jnp.bfloat16), wd_q[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(j == nf)
        def _():
            y3 = y3_s[:] * wd_s[:, 0][None, :]
            if has_post_ffw:
                y3 = _rms(y3, eps) * pf_w[:]
            x3 = x2_s[:] + y3
            x3_out[:] = x3
            h3_s[:] = (_rms(x3, eps) * nn_w[:]).astype(jnp.bfloat16)

        @pl.when(j >= nf)
        def _():
            y_out[:] = _mixed_dot(h3_s[:], wn_q[:]) * wn_s[:, 0][None, :]

    return kernel


def _make_head_kernel(eps: float):
    """Degenerate block (no layer part): next_norm + next-matmul only —
    the step-0 prologue (embedding -> attn_norm -> QKV)."""

    def kernel(x_ref, nn_w, wn_q, wn_s, y_out, h3_s):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            h3_s[:] = (_rms(x_ref[:], eps) * nn_w[:]).astype(jnp.bfloat16)

        y_out[:] = _mixed_dot(h3_s[:], wn_q[:]) * wn_s[:, 0][None, :]

    return kernel


def _rowq8(w) -> bool:
    return isinstance(w, QuantTensor) and w.groups == 1


def block_supported(lw, wn) -> bool:
    """Layer + next-weight eligible for the fused layer kernel?"""
    parts = [lw.wo, lw.w_gate_up, lw.w_down, wn]
    if not all(p is not None and _rowq8(p) for p in parts):
        return False
    if lw.per_layer_inp_gate is not None or lw.out_scale is not None:
        return False  # gemma4 epilogue not fused
    D = lw.w_down.rows
    F = lw.w_down.cols
    if lw.w_gate_up.rows != 2 * F or lw.wo.rows != D:
        return False
    if D % LANE or F % LANE or wn.cols != D or wn.rows % LANE:
        return False
    try:
        _pick_tile(F, D, _TILE_BUDGET)
        _pick_tile(wn.rows, D, _NEXT_BUDGET)
    except ValueError:
        return False
    return True


# VMEM budget for one streamed weight tile (int8 bytes). Mosaic
# double-buffers EVERY input block (const-mapped ones included), and the
# gate/up/down tiles are live together. v5e has 128 MiB of VMEM — the
# compiler's default 16 MiB scoped limit is raised via CompilerParams so
# the tiles can be megabytes (few grid steps -> per-step fixed cost
# amortized; measured 470 GB/s with 0.44 MB tiles vs ~755 GB/s ceiling).
_TILE_BUDGET = int(2.75 * 1024 * 1024)
_NEXT_BUDGET = 6 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "attn_scale", "softcap", "H", "Hkv", "dk", "dv",
        "has_post_attn", "has_post_ffw", "interpret",
    ),
)
def _run_layer(
    pos, x, qkv, kc, vc, cos, sin, qn_w, kn_w,
    wo_q, wo_s, gu_q, gu_s, wd_q, wd_s, nn_w, wn_q, wn_s,
    ffn_w, pa_w, pf_w,
    *, eps, attn_scale, softcap, H, Hkv, dk, dv,
    has_post_attn, has_post_ffw, interpret=False,
):
    D = x.shape[1]
    F = wd_q.shape[1]
    Rn = wn_q.shape[0]
    S = kc.shape[0]
    Adim = H * dv
    tf = _pick_tile(F, D, _TILE_BUDGET)
    tn = _pick_tile(Rn, D, _NEXT_BUDGET)
    nf = F // tf
    nn = Rn // tn
    grid = (nf + nn,)

    def const2(j):
        return (0, 0)

    def const3(j):
        return (0, 0, 0)

    def ffn_map(j):
        return (jnp.minimum(j, nf - 1), 0)

    def up_map(j):
        return (nf + jnp.minimum(j, nf - 1), 0)  # up rows follow gate rows

    def down_map(j):
        return (0, jnp.minimum(j, nf - 1))

    def next_map(j):
        return (jnp.maximum(j - nf, 0), 0)

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # pos [1]
        vspec((1, D), const2),                          # x
        vspec((1, qkv.shape[1]), const2),               # qkv
        vspec((S, Hkv, dk), const3),                    # k cache
        vspec((S, Hkv, dv), const3),                    # v cache
        vspec((1, dk // 2), const2),                    # cos
        vspec((1, dk // 2), const2),                    # sin
        vspec((1, dk), const2),                         # q_norm w
        vspec((1, dk), const2),                         # k_norm w
        vspec((D, Adim), const2),                       # wo_q
        vspec((D, 1), const2),                          # wo_s
        vspec((1, D), const2),                          # ffn_w
    ]
    args = [pos, x, qkv, kc, vc, cos, sin, qn_w, kn_w, wo_q, wo_s, ffn_w]
    if has_post_attn:
        in_specs.append(vspec((1, D), const2))
        args.append(pa_w)
    if has_post_ffw:
        in_specs.append(vspec((1, D), const2))
        args.append(pf_w)
    in_specs += [
        vspec((tf, D), ffn_map),                        # wg_q
        vspec((tf, 1), ffn_map),                        # wg_s
        vspec((tf, D), up_map),                         # wu_q
        vspec((tf, 1), up_map),                         # wu_s
        vspec((D, tf), down_map),                       # wd_q
        vspec((D, 1), const2),                          # wd_s
        vspec((1, D), const2),                          # nn_w
        vspec((tn, D), next_map),                       # wn_q
        vspec((tn, 1), next_map),                       # wn_s
    ]
    args += [gu_q, gu_s, gu_q, gu_s, wd_q, wd_s, nn_w, wn_q, wn_s]

    kernel = _make_layer_kernel(
        nf=nf, eps=eps, attn_scale=attn_scale, softcap=softcap,
        H=H, Hkv=Hkv, dk=dk, dv=dv,
        has_post_attn=has_post_attn, has_post_ffw=has_post_ffw,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            vspec((1, D), const2),
            pl.BlockSpec((1, tn), lambda j: (0, jnp.maximum(j - nf, 0)),
                         memory_space=pltpu.VMEM),
            vspec((Hkv, dk), const2),
            vspec((Hkv, dv), const2),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, Rn), jnp.float32),
            jax.ShapeDtypeStruct((Hkv, dk), jnp.bfloat16),
            jax.ShapeDtypeStruct((Hkv, dv), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),   # x2
            pltpu.VMEM((1, D), jnp.bfloat16),  # h2
            pltpu.VMEM((1, D), jnp.float32),   # y3
            pltpu.VMEM((1, D), jnp.bfloat16),  # h3
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (D * Adim + 3 * D * F + D * Rn + H * dk * S + H * dv * S),
            bytes_accessed=D * Adim + 3 * D * F + D * Rn + 2 * S * Hkv * dk,
            transcendentals=F + H * S,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _run_head(x, nn_w, wn_q, wn_s, *, eps, interpret=False):
    D = x.shape[1]
    Rn = wn_q.shape[0]
    tn = _pick_tile(Rn, D, _NEXT_BUDGET)
    nn = Rn // tn

    return pl.pallas_call(
        _make_head_kernel(eps),
        grid=(nn,),
        in_specs=[
            pl.BlockSpec((1, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, D), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * D * Rn, bytes_accessed=D * Rn, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, nn_w, wn_q, wn_s)


def fused_layer(
    pos: Array,        # scalar int32 absolute position of the new token
    x: Array,          # [1, D] f32 residual stream
    qkv: Array,        # [1, H*dk + Hkv*(dk+dv)] f32 fused-QKV output
    k_cache: Array,    # [S, Hkv, dk] bf16
    v_cache: Array,    # [S, Hkv, dv] bf16
    cos: Array,        # [1, dk//2] f32 rope table for this layer's base
    sin: Array,
    lw,                # LayerWeights with rowq8 wo / w_gate_up / w_down
    next_norm: Array,  # [D] next attn_norm or output_norm
    wn: QuantTensor,   # rowq8 next QKV or tied-embedding logits weight
    *,
    hp,
    interpret: bool = False,
) -> tuple[Array, Array, Array, Array]:
    """One fused layer; returns (x_next [1, D], y_next [1, Rn],
    k_new [Hkv, dk] bf16, v_new [Hkv, dv] bf16). The caller scatters
    k_new/v_new into the cache at row ``pos``."""
    pa = lw.post_attn_norm
    pf = lw.post_ffw_norm
    zeros = jnp.zeros((1, x.shape[1]), jnp.float32)
    ones_dk = jnp.ones((1, k_cache.shape[2]), jnp.float32)
    return _run_layer(
        jnp.asarray(pos, dtype=jnp.int32)[None], x, qkv, k_cache, v_cache,
        cos, sin,
        lw.q_norm.astype(jnp.float32)[None, :] if lw.q_norm is not None else ones_dk,
        lw.k_norm.astype(jnp.float32)[None, :] if lw.k_norm is not None else ones_dk,
        lw.wo.q, lw.wo.scale, lw.w_gate_up.q, lw.w_gate_up.scale,
        lw.w_down.q, lw.w_down.scale,
        next_norm.astype(jnp.float32)[None, :], wn.q, wn.scale,
        lw.ffn_norm.astype(jnp.float32)[None, :],
        pa.astype(jnp.float32)[None, :] if pa is not None else zeros,
        pf.astype(jnp.float32)[None, :] if pf is not None else zeros,
        eps=hp.rms_eps,
        attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        H=hp.n_head, Hkv=hp.n_head_kv,
        dk=k_cache.shape[2], dv=v_cache.shape[2],
        has_post_attn=pa is not None,
        has_post_ffw=pf is not None,
        interpret=interpret,
    )


def fused_head(x: Array, norm: Array, wn: QuantTensor, *, eps: float,
               interpret: bool = False) -> Array:
    """norm + matmul prologue: [1, D] -> [1, Rn]."""
    return _run_head(
        x, norm.astype(jnp.float32)[None, :], wn.q, wn.scale,
        eps=eps, interpret=interpret,
    )
