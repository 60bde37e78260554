"""Whole-step decode megakernel: the ENTIRE forward pass in one Pallas call.

Why one call: profiling round-1 showed the decode step bandwidth-bound in
its matmul kernels (~755 GB/s) but losing ~40% of the step to serial
small-op latency — rope/mask/softmax glue and per-kernel fixed costs —
during which the HBM pipe idles. Pallas' BlockSpec pipeline only
prefetches one block ahead, so no per-layer call structure can hide a
~17 us attention bubble behind a ~30 us weight stream. This kernel
hand-rolls the pipeline instead (guide: double-buffering pattern): all of
layer l+1's weights and KV cache DMA into one of two VMEM buffer sets
while layer l computes, so the serial attention chain rides under the
weight stream. v5e has 128 MiB of VMEM — a whole 1B-class layer
(~27 MB x 2 buffers) fits with room for the tied-logits tiles.

One decode step = one call:

  token -> embedding row (DMA at token id) -> per layer l in a fori_loop:
    attn_norm -> fused QKV matmul -> split/q-k-norms/RoPE ->
    KV row write (VMEM + async row writeback to the HBM cache, aliased
    in/out) -> masked-softmax attention over the layer's cache (VMEM) ->
    Wo -> [post_attn_norm] -> residual -> ffn_norm -> gate/up -> geglu ->
    down -> [post_ffw_norm] -> residual
  -> final norm -> tied-embedding logits, tiled + double-buffered, each
  [1, TN] tile DMA'd straight to the HBM logits output.

All matmuls are mixed bf16-activation x int8-weight MXU dots — EXACT for
int8 weights (int8 fits bf16's 8-bit mantissa) and ~755 GB/s vs ~520 GB/s
for any kernel that casts int8 weights on the VPU (tools/probe_kernels.py).
Weights are per-row int8 (rowq8; quant/device.py requantize_rowwise) in
the scan-stacked [L, ...] layout (models/weights.py stack_layers), shared
with the scan-over-layers prefill — no duplicate weight copy in HBM.

Reference counterpart of the chain: model.cpp:706-1049 (forward),
:461-474 (cache append -> here an in-place row DMA), :983-1034 (final
norm + tied logits).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.device import QuantTensor

LANE = 128
_VMEM_LIMIT = 127 * 1024 * 1024
# VMEM budget for the double-buffered whole-layer weight set + logits tiles
_BUFFER_BUDGET = 100 * 1024 * 1024
_LOGITS_TILE = 4096


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
    """NeoX split-half rotary on [rows, dk] with [1, dk//2] cos/sin
    (reference ops.cpp:67-95)."""
    half = cos.shape[1]
    x0 = x[:, :half]
    x1 = x[:, half : 2 * half]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    if x.shape[1] > 2 * half:
        return jnp.concatenate([r0, r1, x[:, 2 * half :]], axis=1)
    return jnp.concatenate([r0, r1], axis=1)


def _rowq8(w) -> bool:
    return isinstance(w, QuantTensor) and w.groups == 1


def _rope_tables(hp, L, pos):
    """Shared rope precompute for the megakernel wrappers: one cos/sin
    row per distinct rope base (reference ops.cpp:67-95).

    ``pos`` scalar -> (base_idx [L], cos/sin [n_bases, dk//2]);
    ``pos`` [B]    -> (base_idx [L], cos/sin [B*n_bases, dk//2]), rows
    flattened lane-major so a kernel indexes row b*n_bases + base_idx[l].
    """
    dk = hp.n_embd_head_k
    half = dk // 2
    bases = sorted({hp.rope_base_for_layer(i) for i in range(L)})
    base_idx = jnp.asarray(
        [bases.index(hp.rope_base_for_layer(i)) for i in range(L)],
        dtype=jnp.int32,
    )
    pos_f = jnp.asarray(pos, dtype=jnp.float32)
    batched = pos_f.ndim == 1
    if batched:
        pos_f = pos_f[:, None]
    i_ = jnp.arange(half, dtype=jnp.float32)
    rows = []
    for b in bases:
        freq = 1.0 / jnp.power(jnp.float32(b), 2.0 * i_ / dk)
        rows.append(pos_f * freq / jnp.float32(hp.rope_freq_scale))
    if batched:
        val = jnp.stack(rows, axis=1).reshape(pos_f.shape[0] * len(bases), half)
    else:
        val = jnp.stack(rows)
    return base_idx, jnp.cos(val), jnp.sin(val)


def _sizes(hp, lw, token_embd):
    D = hp.embedding_length
    F = lw.w_down.cols
    Rq = lw.wqkv.rows
    Adim = lw.wo.cols
    V = token_embd.rows
    return D, F, Rq, Adim, V


def megakernel_supported(hp, w) -> bool:
    """Whole-step megakernel eligibility: scan-stacked homogeneous layers
    with rowq8 weights everywhere, gemma3-style attention (own KV per
    layer, q/k norms, no ALiBi, uniform head dims), and a double-buffered
    whole-layer weight set that fits VMEM."""
    lw = w.layers
    from ...models.weights import LayerWeights

    if not isinstance(lw, LayerWeights):  # needs the stacked layout
        return False
    if w.token_embd_per_layer is not None or hp.architecture == "gemma4":
        return False
    if hp.f_max_alibi_bias > 0.0:
        return False
    parts = [lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down, w.token_embd]
    if any(p is None or not _rowq8(p) for p in parts):
        return False
    if lw.q_norm is None or lw.k_norm is None:
        return False
    if hp.n_embd_head_k != hp.n_embd_head_k_swa or hp.n_embd_head_v != hp.n_embd_head_v_swa:
        return False
    D, F, Rq, Adim, V = _sizes(hp, lw, w.token_embd)
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    if D % LANE or F % LANE or Adim % LANE or dk % LANE or dv % LANE:
        return False
    if V <= _LOGITS_TILE:
        if V % LANE:
            return False
    elif V % _LOGITS_TILE:
        return False
    if Rq != hp.n_head * dk + hp.n_head_kv * (dk + dv):
        return False
    # double-buffered whole-layer weights + caches + logits tiles in VMEM
    S = None  # cache length checked at call time (any S works)
    layer_bytes = Rq * D + D * Adim + 2 * F * D + D * F
    need = 2 * layer_bytes + 2 * _LOGITS_TILE * D
    return need <= _BUFFER_BUDGET


def _make_kernel(*, L, H, Hkv, dk, dv, D, F, Rq, Adim, V, S, TN,
                 eps, attn_scale, softcap, has_pa, has_pf):
    group = H // Hkv
    nt = V // TN
    n_wdma = 10  # weight copies + the layer's K/V cache copies

    def kernel(*refs):
        idx = 0

        def nxt():
            nonlocal idx
            r = refs[idx]
            idx += 1
            return r

        token_r, pos_r, base_idx_r = nxt(), nxt(), nxt()
        cos_r, sin_r = nxt(), nxt()
        an_r, fn_r, qn_r, kn_r, on_r = nxt(), nxt(), nxt(), nxt(), nxt()
        pan_r = nxt() if has_pa else None
        pfn_r = nxt() if has_pf else None
        (wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s,
         emb_q, emb_s, kc, vc) = [nxt() for _ in range(12)]
        logits_out, kc_out, vc_out = nxt(), nxt(), nxt()
        (wqkv_b, wqkv_sb, wo_b, wo_sb, gu_b, gu_sb, wd_b, wd_sb,
         kb, vb, emb_b, emb_sb, lw_b, lw_sb, lo_b, x_s, h_s) = [nxt() for _ in range(17)]
        wsem, wbsem, lsem, osem, esem = [nxt() for _ in range(5)]

        tok = token_r[0]
        p = pos_r[0]

        def layer_copies(l, b):
            cs = [
                pltpu.make_async_copy(wqkv_q.at[l], wqkv_b.at[b], wsem.at[b, 0]),
                pltpu.make_async_copy(wqkv_s.at[l], wqkv_sb.at[b], wsem.at[b, 1]),
                pltpu.make_async_copy(wo_q.at[l], wo_b.at[b], wsem.at[b, 2]),
                pltpu.make_async_copy(wo_s.at[l], wo_sb.at[b], wsem.at[b, 3]),
                pltpu.make_async_copy(gu_q.at[l], gu_b.at[b], wsem.at[b, 4]),
                pltpu.make_async_copy(gu_s.at[l], gu_sb.at[b], wsem.at[b, 5]),
                pltpu.make_async_copy(wd_q.at[l], wd_b.at[b], wsem.at[b, 6]),
                pltpu.make_async_copy(wd_s.at[l], wd_sb.at[b], wsem.at[b, 7]),
            ]
            cs.append(pltpu.make_async_copy(kc.at[l], kb.at[b], wsem.at[b, 8]))
            cs.append(pltpu.make_async_copy(vc.at[l], vb.at[b], wsem.at[b, 9]))
            return cs

        # embedding row at the token id: int8 HBM is (32, 128)-tiled, so
        # DMA the aligned 32-row window around the token and mask-select;
        # the scale row is [1, V] lane-major -> aligned 128-wide window
        tok0 = pl.multiple_of((tok // 32) * 32, 32)
        tokl = pl.multiple_of((tok // 128) * 128, 128)
        e0 = pltpu.make_async_copy(emb_q.at[pl.ds(tok0, 32)], emb_b, esem.at[0])
        e1 = pltpu.make_async_copy(emb_s.at[:, pl.ds(tokl, 128)], emb_sb, esem.at[1])
        e0.start()
        e1.start()
        for c in layer_copies(0, 0):
            c.start()
        e0.wait()
        e1.wait()
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) == tok - tok0)
        row = jnp.sum(jnp.where(rowsel, emb_b[:].astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)
        lanesel = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == tok - tokl)
        scale = jnp.sum(jnp.where(lanesel, emb_sb[:], 0.0))
        x_s[:] = row * scale * jnp.float32(math.sqrt(D))

        def body(l, carry):
            b = jax.lax.rem(l, 2)

            @pl.when(l + 1 < L)
            def _():
                for c in layer_copies(l + 1, 1 - b):
                    c.start()

            for c in layer_copies(l, b):
                c.wait()

            x = x_s[:]
            h = (_rms(x, eps) * an_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            qkv = _mixed_dot(h, wqkv_b[b]) * wqkv_sb[b]  # [1, Rq]

            q = qkv[:, : H * dk].reshape(H, dk)
            k = qkv[:, H * dk : H * dk + Hkv * dk].reshape(Hkv, dk)
            v = qkv[:, H * dk + Hkv * dk :].reshape(Hkv, dv)
            q = _rms(q, eps) * qn_r[pl.ds(l, 1), :]
            k = _rms(k, eps) * kn_r[pl.ds(l, 1), :]
            bi = base_idx_r[l]
            cos = cos_r[pl.ds(bi, 1), :]
            sin = sin_r[pl.ds(bi, 1), :]
            q = _rope_rows(q, cos, sin) * jnp.float32(attn_scale)
            k = _rope_rows(k, cos, sin)
            kbv = k.astype(jnp.bfloat16)
            vbv = v.astype(jnp.bfloat16)
            qb = q.astype(jnp.bfloat16)

            # the new token's K/V row: bf16 VMEM is (16, 128)-tiled, so
            # read-modify-write the aligned 16-row window of the VMEM cache
            # copy (attention then sees the new row at slot p) and DMA the
            # same window back to the HBM cache (aliased in/out).
            p0 = pl.multiple_of((p // 16) * 16, 16)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == p - p0
            kwin = kb[b, pl.ds(p0, 16), :]  # [16, Hkv*dk]
            vwin = vb[b, pl.ds(p0, 16), :]
            kb[b, pl.ds(p0, 16), :] = jnp.where(
                rsel, kbv.reshape(1, Hkv * dk), kwin)
            vb[b, pl.ds(p0, 16), :] = jnp.where(
                rsel, vbv.reshape(1, Hkv * dv), vwin)
            wk = pltpu.make_async_copy(
                kb.at[b, pl.ds(p0, 16), :], kc_out.at[l, pl.ds(p0, 16), :],
                wbsem.at[0])
            wv = pltpu.make_async_copy(
                vb.at[b, pl.ds(p0, 16), :], vc_out.at[l, pl.ds(p0, 16), :],
                wbsem.at[1])
            wk.start()
            wv.start()
            wk.wait()
            wv.wait()

            ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
            valid = ids <= p  # the new token's row is in the window above
            outs = []
            for i in range(Hkv):
                qi = qb[i * group : (i + 1) * group, :]  # [G, dk]
                ki = kb[b][:, i * dk : (i + 1) * dk]  # [S, dk]
                s = jax.lax.dot_general(
                    qi, ki,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, S]
                if softcap > 0.0:
                    s = softcap * jnp.tanh(s / softcap)
                s = jnp.where(valid, s, -jnp.inf)
                m = jnp.max(s, axis=1, keepdims=True)
                pr = jnp.where(valid, jnp.exp(s - m), 0.0)
                denom = jnp.sum(pr, axis=1, keepdims=True)
                vi = vb[b][:, i * dv : (i + 1) * dv]  # [S, dv]
                pv = jax.lax.dot_general(
                    pr.astype(jnp.bfloat16), vi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, dv]
                outs.append(pv / denom)
            attn = outs[0] if Hkv == 1 else jnp.concatenate(outs, axis=0)
            attn_flat = attn.reshape(1, H * dv).astype(jnp.bfloat16)

            y = _mixed_dot(attn_flat, wo_b[b]) * wo_sb[b]
            if has_pa:
                y = _rms(y, eps) * pan_r[pl.ds(l, 1), :]
            x2 = x + y
            h2 = (_rms(x2, eps) * fn_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            gu = _mixed_dot(h2, gu_b[b]) * gu_sb[b]  # [1, 2F]
            g = gu[:, :F]
            u = gu[:, F:]
            c = jnp.float32(0.7978845608028654)
            a = 0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))) * u
            y3 = jax.lax.dot_general(
                a.astype(jnp.bfloat16), wd_b[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * wd_sb[b]
            if has_pf:
                y3 = _rms(y3, eps) * pfn_r[pl.ds(l, 1), :]
            x_s[:] = x2 + y3
            return carry

        jax.lax.fori_loop(0, L, body, 0)

        h_s[:] = (_rms(x_s[:], eps) * on_r[:]).astype(jnp.bfloat16)

        # tied-embedding logits, tiled + double-buffered, DMA'd straight out
        def lcopies(t, s_):
            off = pl.multiple_of(t * TN, 128)
            return [
                pltpu.make_async_copy(emb_q.at[pl.ds(off, TN)], lw_b.at[s_],
                                      lsem.at[s_, 0]),
                pltpu.make_async_copy(emb_s.at[:, pl.ds(off, TN)], lw_sb.at[s_],
                                      lsem.at[s_, 1]),
            ]

        def ocopy(t, s_):
            off = pl.multiple_of(t * TN, 128)
            return pltpu.make_async_copy(
                lo_b.at[s_], logits_out.at[:, pl.ds(off, TN)], osem.at[s_])

        for c in lcopies(0, 0):
            c.start()

        def lbody(t, carry):
            s_ = jax.lax.rem(t, 2)

            @pl.when(t + 1 < nt)
            def _():
                for c in lcopies(t + 1, 1 - s_):
                    c.start()

            for c in lcopies(t, s_):
                c.wait()

            @pl.when(t >= 2)
            def _():
                ocopy(t - 2, s_).wait()

            lo_b[s_] = _mixed_dot(h_s[:], lw_b[s_]) * lw_sb[s_]
            ocopy(t, s_).start()
            return carry

        jax.lax.fori_loop(0, nt, lbody, 0)
        for t in range(max(0, nt - 2), nt):
            ocopy(t, t % 2).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("eps", "attn_scale", "softcap", "H", "Hkv", "dk", "dv",
                     "has_pa", "has_pf", "interpret"),
)
def _run_step(
    token, pos, base_idx, cos, sin, an, fn_, qn, kn, on, pan, pfn,
    wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s, emb_q, emb_s, kc, vc,
    *, eps, attn_scale, softcap, H, Hkv, dk, dv, has_pa, has_pf,
    interpret=False,
):
    L, Rq, D = wqkv_q.shape
    F = wd_q.shape[2]
    Adim = wo_q.shape[2]
    V = emb_q.shape[0]
    S = kc.shape[1]  # kc is the flat [L, S, Hkv*dk] view
    TN = V if V <= _LOGITS_TILE else _LOGITS_TILE
    if S % 16:
        raise ValueError(f"megakernel needs max_seq % 16 == 0, got {S}")
    if V % 32 or TN % LANE:
        raise ValueError(f"megakernel needs vocab % 32 == 0, got {V}")

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [smem, smem, smem, vmem, vmem, vmem, vmem, vmem, vmem, vmem]
    args = [token, pos, base_idx, cos, sin, an, fn_, qn, kn, on]
    if has_pa:
        in_specs.append(vmem)
        args.append(pan)
    if has_pf:
        in_specs.append(vmem)
        args.append(pfn)
    in_specs += [anym] * 12
    args += [wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s,
             emb_q, emb_s, kc, vc]
    kc_idx = len(args) - 2  # input positions of the aliased caches
    vc_idx = len(args) - 1

    kernel = _make_kernel(
        L=L, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, F=F, Rq=Rq, Adim=Adim, V=V,
        S=S, TN=TN, eps=eps, attn_scale=attn_scale, softcap=softcap,
        has_pa=has_pa, has_pf=has_pf,
    )
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(anym, anym, anym),
        out_shape=(
            jax.ShapeDtypeStruct((1, V), jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ),
        input_output_aliases={kc_idx: 1, vc_idx: 2},
        scratch_shapes=[
            pltpu.VMEM((2, Rq, D), jnp.int8),
            pltpu.VMEM((2, 1, Rq), jnp.float32),
            pltpu.VMEM((2, D, Adim), jnp.int8),
            pltpu.VMEM((2, 1, D), jnp.float32),
            pltpu.VMEM((2, 2 * F, D), jnp.int8),
            pltpu.VMEM((2, 1, 2 * F), jnp.float32),
            pltpu.VMEM((2, D, F), jnp.int8),
            pltpu.VMEM((2, 1, D), jnp.float32),
            pltpu.VMEM((2, S, Hkv * dk), kc.dtype),
            pltpu.VMEM((2, S, Hkv * dv), vc.dtype),
            pltpu.VMEM((32, D), jnp.int8),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((2, TN, D), jnp.int8),
            pltpu.VMEM((2, 1, TN), jnp.float32),
            pltpu.VMEM((2, 1, TN), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 10)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * (Rq * D + D * Adim + 3 * D * F) + 2 * V * D,
            bytes_accessed=L * (Rq * D + D * Adim + 3 * D * F) + V * D
            + 2 * L * S * Hkv * dk,
            transcendentals=L * (F + H * S),
        ),
        interpret=interpret,
    )(*args)


def decode_step_megakernel(hp, w, cache, token, pos, *, interpret=False):
    """One single-token decode step as one Pallas call. ``w.layers`` must
    be the stacked LayerWeights; ``cache`` the stacked KV cache. Returns
    (logits [vocab] f32 — softcap applied by the caller, new cache arrays)."""
    lw = w.layers
    L = lw.wqkv.q.shape[0]
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    base_idx, cos, sin = _rope_tables(hp, L, pos)

    f32 = jnp.float32
    has_pa = lw.post_attn_norm is not None
    has_pf = lw.post_ffw_norm is not None
    logits, kc, vc = _run_step(
        jnp.asarray(token, dtype=jnp.int32).reshape(1),
        jnp.asarray(pos, dtype=jnp.int32).reshape(1),
        base_idx, cos, sin,
        lw.attn_norm.astype(f32), lw.ffn_norm.astype(f32),
        lw.q_norm.astype(f32), lw.k_norm.astype(f32),
        w.output_norm.astype(f32)[None, :],
        lw.post_attn_norm.astype(f32) if has_pa else None,
        lw.post_ffw_norm.astype(f32) if has_pf else None,
        # scales as [L, 1, R] / [1, V] lane-major views: sub-128 minor
        # dims can't be DMA-sliced on TPU, and the lane-major layout also
        # multiplies outputs directly (free XLA reshapes of [L, R, 1])
        lw.wqkv.q, lw.wqkv.scale.reshape(L, 1, -1),
        lw.wo.q, lw.wo.scale.reshape(L, 1, -1),
        lw.w_gate_up.q, lw.w_gate_up.scale.reshape(L, 1, -1),
        lw.w_down.q, lw.w_down.scale.reshape(L, 1, -1),
        w.token_embd.q, w.token_embd.scale.reshape(1, -1),
        # flat [L, S, Hkv*dk] view: no size-1 tiled-dim slices in-kernel
        cache.k.reshape(L, cache.k.shape[1], -1),
        cache.v.reshape(L, cache.v.shape[1], -1),
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        H=hp.n_head, Hkv=hp.n_head_kv, dk=dk, dv=dv,
        has_pa=has_pa, has_pf=has_pf, interpret=interpret,
    )
    return logits[0], kc.reshape(cache.k.shape), vc.reshape(cache.v.shape)
