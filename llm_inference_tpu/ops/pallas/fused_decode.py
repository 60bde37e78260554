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
    with rowq8 weights everywhere, q/k norms, no ALiBi, uniform head
    dims, and a double-buffered whole-layer weight set that fits VMEM.

    gemma4 (reference model.cpp:568-704, 774-835, 927-977) is supported
    as a set of static kernel features: the per-layer-input epilogue
    (token_embd_per_layer gather + per_layer_model_proj in the prologue,
    two extra mixed dots + norm per layer), shared-KV layer indexing
    (zero-padded K/V rows, models/weights.py stack_layers_gemma4), the
    unweighted V norm, and the per-layer out_scale."""
    lw = w.layers
    from ...models.weights import LayerWeights

    if not isinstance(lw, LayerWeights):  # needs the stacked layout
        return False
    has_pl = w.token_embd_per_layer is not None
    if has_pl and hp.architecture != "gemma4":
        return False  # per-layer tensors on an unknown arch
    if hp.f_max_alibi_bias > 0.0:
        return False
    parts = [lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down, w.token_embd]
    if has_pl:
        if (lw.per_layer_inp_gate is None or lw.per_layer_proj is None
                or lw.per_layer_post_norm is None
                or w.per_layer_model_proj is None
                or w.per_layer_proj_norm is None):
            return False
        parts += [lw.per_layer_inp_gate, lw.per_layer_proj,
                  w.token_embd_per_layer, w.per_layer_model_proj]
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
    pl_bytes = 0
    if has_pl:
        P = hp.embedding_length_per_layer
        Lp = hp.block_count * P
        if P % LANE or w.per_layer_model_proj.rows != Lp:
            return False
        if w.token_embd_per_layer.cols != Lp or lw.per_layer_inp_gate.rows != P:
            return False
        layer_bytes += 2 * P * D  # per_layer_inp_gate + per_layer_proj
        # whole per_layer_model_proj + gather window + f32 row scratch
        pl_bytes = Lp * D + 32 * Lp + 2 * Lp * 4
    need = 2 * layer_bytes + 2 * _LOGITS_TILE * D + pl_bytes
    return need <= _BUFFER_BUDGET


def _make_kernel(*, L, H, Hkv, dk, dv, D, F, Rq, Adim, V, S, TN,
                 eps, attn_scale, softcap, has_pa, has_pf,
                 n_kv, src_a, src_b, v_norm, has_os, has_pl, P):
    group = H // Hkv
    nt = V // TN
    shared = n_kv < L  # gemma4 shared-KV layers present
    n_wdma = (14 if has_pl else 10)  # weight copies + K/V cache copies

    def kernel(*refs):
        idx = 0

        def nxt():
            nonlocal idx
            r = refs[idx]
            idx += 1
            return r

        token_r, pos_r, base_idx_r, win_r = nxt(), nxt(), nxt(), nxt()
        kvsrc_r = nxt() if shared else None
        os_r = nxt() if has_os else None
        cos_r, sin_r = nxt(), nxt()
        an_r, fn_r, qn_r, kn_r, on_r = nxt(), nxt(), nxt(), nxt(), nxt()
        pan_r = nxt() if has_pa else None
        pfn_r = nxt() if has_pf else None
        pln_r = nxt() if has_pl else None  # per_layer_proj_norm [1, P]
        plpn_r = nxt() if has_pl else None  # per_layer_post_norm [L, D]
        (wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s) = [
            nxt() for _ in range(8)]
        if has_pl:
            plg_q, plg_s, plj_q, plj_s = nxt(), nxt(), nxt(), nxt()
        emb_q, emb_s = nxt(), nxt()
        if has_pl:
            plemb_q, plemb_s, plproj_q, plproj_s = nxt(), nxt(), nxt(), nxt()
        kc, vc = nxt(), nxt()
        logits_out, kc_out, vc_out = nxt(), nxt(), nxt()
        (wqkv_b, wqkv_sb, wo_b, wo_sb, gu_b, gu_sb, wd_b, wd_sb) = [
            nxt() for _ in range(8)]
        if has_pl:
            plg_b, plg_sb, plj_b, plj_sb = nxt(), nxt(), nxt(), nxt()
        kb, vb, emb_b, emb_sb = nxt(), nxt(), nxt(), nxt()
        if has_pl:
            plemb_b, plemb_sb, plproj_b, plproj_sb = (
                nxt(), nxt(), nxt(), nxt())
            plemb_row_s, plproj_out_s = nxt(), nxt()
        if shared:
            freshk_s, freshv_s = nxt(), nxt()
        lw_b, lw_sb, lo_b, x_s, h_s = nxt(), nxt(), nxt(), nxt(), nxt()
        wsem, wbsem, lsem, osem, esem = [nxt() for _ in range(5)]
        plsem = nxt() if has_pl else None

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
            base = 8
            if has_pl:
                cs += [
                    pltpu.make_async_copy(plg_q.at[l], plg_b.at[b], wsem.at[b, 8]),
                    pltpu.make_async_copy(plg_s.at[l], plg_sb.at[b], wsem.at[b, 9]),
                    pltpu.make_async_copy(plj_q.at[l], plj_b.at[b], wsem.at[b, 10]),
                    pltpu.make_async_copy(plj_s.at[l], plj_sb.at[b], wsem.at[b, 11]),
                ]
                base = 12
            # shared-KV layers read the source layer's cache
            # (reference model.cpp:774-835)
            src = kvsrc_r[l] if shared else l
            cs.append(pltpu.make_async_copy(kc.at[src], kb.at[b], wsem.at[b, base]))
            cs.append(pltpu.make_async_copy(vc.at[src], vb.at[b], wsem.at[b, base + 1]))
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
        if has_pl:
            # gemma4 prologue DMAs: per-layer embedding row window + the
            # whole per_layer_model_proj (used once per step)
            pe0 = pltpu.make_async_copy(
                plemb_q.at[pl.ds(tok0, 32)], plemb_b, plsem.at[0])
            pe1 = pltpu.make_async_copy(
                plemb_s.at[:, pl.ds(tokl, 128)], plemb_sb, plsem.at[1])
            pw0 = pltpu.make_async_copy(plproj_q, plproj_b, plsem.at[2])
            pw1 = pltpu.make_async_copy(plproj_s, plproj_sb, plsem.at[3])
            pe0.start()
            pe1.start()
            pw0.start()
            pw1.start()
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

        if has_pl:
            # gemma4 per-layer inputs (reference model.cpp:568-704):
            # inp = emb_row * sqrt(P); proj = (x @ W_plp^T) / sqrt(D).
            # The per-layer rms/norm/combine runs inside the loop on
            # [1, P] lane slices.
            pe0.wait()
            pe1.wait()
            prow = jnp.sum(
                jnp.where(rowsel, plemb_b[:].astype(jnp.float32), 0.0),
                axis=0, keepdims=True)
            pscale = jnp.sum(jnp.where(lanesel, plemb_sb[:], 0.0))
            plemb_row_s[:] = prow * pscale * jnp.float32(math.sqrt(P))
            pw0.wait()
            pw1.wait()
            plproj_out_s[:] = (
                _mixed_dot(x_s[:].astype(jnp.bfloat16), plproj_b[:])
                * plproj_sb[:]
            ) * jnp.float32(1.0 / math.sqrt(D))

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
            if v_norm:
                v = _rms(v, eps)  # gemma4 unweighted V norm (model.cpp:812-827)
            kbv = k.astype(jnp.bfloat16)
            vbv = v.astype(jnp.bfloat16)
            qb = q.astype(jnp.bfloat16)

            # the new token's K/V row: bf16 VMEM is (16, 128)-tiled, so
            # read-modify-write the aligned 16-row window of the VMEM cache
            # copy (attention then sees the new row at slot p) and DMA the
            # same window back to the HBM cache (aliased in/out).
            p0 = pl.multiple_of((p // 16) * 16, 16)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == p - p0
            knew = kbv.reshape(1, Hkv * dk)
            vnew = vbv.reshape(1, Hkv * dv)
            if shared:
                # a shared-KV layer's cache DMA (prefetched a layer early)
                # may predate its source layer's fresh-row write: stash the
                # two possible source layers' new rows (static slots — no
                # dynamic sublane slicing) and patch the VMEM copy; owner
                # layers use their own just-computed row.
                @pl.when(l == src_a)
                def _():
                    freshk_s[0:1, :] = knew
                    freshv_s[0:1, :] = vnew

                @pl.when(l == src_b)
                def _():
                    freshk_s[1:2, :] = knew
                    freshv_s[1:2, :] = vnew

                sel_a = kvsrc_r[l] == src_a
                own = l < n_kv
                kfresh = jnp.where(sel_a, freshk_s[0:1, :], freshk_s[1:2, :])
                vfresh = jnp.where(sel_a, freshv_s[0:1, :], freshv_s[1:2, :])
                knew = jnp.where(own, knew, kfresh)
                vnew = jnp.where(own, vnew, vfresh)
            kwin = kb[b, pl.ds(p0, 16), :]  # [16, Hkv*dk]
            vwin = vb[b, pl.ds(p0, 16), :]
            kb[b, pl.ds(p0, 16), :] = jnp.where(rsel, knew, kwin)
            vb[b, pl.ds(p0, 16), :] = jnp.where(rsel, vnew, vwin)

            def _writeback():
                wk = pltpu.make_async_copy(
                    kb.at[b, pl.ds(p0, 16), :],
                    kc_out.at[l, pl.ds(p0, 16), :], wbsem.at[0])
                wv = pltpu.make_async_copy(
                    vb.at[b, pl.ds(p0, 16), :],
                    vc_out.at[l, pl.ds(p0, 16), :], wbsem.at[1])
                wk.start()
                wv.start()
                wk.wait()
                wv.wait()

            if shared:  # only KV-owning layers write the HBM cache
                pl.when(l < n_kv)(_writeback)
            else:
                _writeback()

            ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
            # causal over written slots; win_r[l] > 0 additionally applies
            # the layer's sliding window (real SWA, LLMI_SWA_MASK=1 —
            # models/gemma.py _masked_scores is the semantics source).
            # The new token's row (slot p) is always inside the window.
            wl = win_r[l]
            valid = (ids <= p) & ((wl <= 0) | (ids > p - wl))
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
            x3 = x2 + y3
            if has_pl:
                # gemma4 per-layer-input epilogue (model.cpp:927-966):
                # gate dot -> GELU -> * inp_per_layer[l] -> proj dot ->
                # rms * post_norm -> residual add
                off = pl.multiple_of(l * P, P)
                proj_l = plproj_out_s[:, pl.ds(off, P)]
                inp_l = (_rms(proj_l, eps) * pln_r[:]
                         + plemb_row_s[:, pl.ds(off, P)]
                         ) * jnp.float32(1.0 / math.sqrt(2.0))
                gpl = _mixed_dot(x3.astype(jnp.bfloat16), plg_b[b]) * plg_sb[b]
                gg = 0.5 * gpl * (1.0 + jnp.tanh(
                    c * (gpl + 0.044715 * gpl * gpl * gpl))) * inp_l
                pout = _mixed_dot(gg.astype(jnp.bfloat16), plj_b[b]) * plj_sb[b]
                pout = _rms(pout, eps) * plpn_r[pl.ds(l, 1), :]
                x3 = x3 + pout
            if has_os:
                x3 = x3 * os_r[l]  # reference model.cpp:969-977
            x_s[:] = x3
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
                     "has_pa", "has_pf", "n_kv", "src_a", "src_b", "v_norm",
                     "has_os", "has_pl", "interpret"),
)
def _run_step(
    token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on, pan, pfn,
    wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s, emb_q, emb_s, kc, vc,
    *, eps, attn_scale, softcap, H, Hkv, dk, dv, has_pa, has_pf,
    n_kv=None, src_a=0, src_b=0, v_norm=False, has_os=False, has_pl=False,
    kvsrc=None, os_=None, pln=None, plpn=None, plg_q=None, plg_s=None,
    plj_q=None, plj_s=None, plemb_q=None, plemb_s=None, plproj_q=None,
    plproj_s=None, interpret=False,
):
    L, Rq, D = wqkv_q.shape
    F = wd_q.shape[2]
    Adim = wo_q.shape[2]
    V = emb_q.shape[0]
    S = kc.shape[1]  # kc is the flat [n_kv, S, Hkv*dk] view
    n_kv = L if n_kv is None else n_kv
    shared = n_kv < L
    P = plg_q.shape[1] if has_pl else 0
    Lp = plproj_q.shape[0] if has_pl else 0
    TN = V if V <= _LOGITS_TILE else _LOGITS_TILE
    if S % 16:
        raise ValueError(f"megakernel needs max_seq % 16 == 0, got {S}")
    if V % 32 or TN % LANE:
        raise ValueError(f"megakernel needs vocab % 32 == 0, got {V}")

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [smem, smem, smem, smem]
    args = [token, pos, base_idx, windows]
    if shared:
        in_specs.append(smem)
        args.append(kvsrc)
    if has_os:
        in_specs.append(smem)
        args.append(os_)
    in_specs += [vmem] * 7
    args += [cos, sin, an, fn_, qn, kn, on]
    if has_pa:
        in_specs.append(vmem)
        args.append(pan)
    if has_pf:
        in_specs.append(vmem)
        args.append(pfn)
    if has_pl:
        in_specs += [vmem, vmem]
        args += [pln, plpn]
    wargs = [wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s]
    if has_pl:
        wargs += [plg_q, plg_s, plj_q, plj_s]
    wargs += [emb_q, emb_s]
    if has_pl:
        wargs += [plemb_q, plemb_s, plproj_q, plproj_s]
    wargs += [kc, vc]
    in_specs += [anym] * len(wargs)
    args += wargs
    kc_idx = len(args) - 2  # input positions of the aliased caches
    vc_idx = len(args) - 1

    kernel = _make_kernel(
        L=L, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, F=F, Rq=Rq, Adim=Adim, V=V,
        S=S, TN=TN, eps=eps, attn_scale=attn_scale, softcap=softcap,
        has_pa=has_pa, has_pf=has_pf, n_kv=n_kv, src_a=src_a, src_b=src_b,
        v_norm=v_norm, has_os=has_os, has_pl=has_pl, P=P,
    )
    scratch = [
        pltpu.VMEM((2, Rq, D), jnp.int8),
        pltpu.VMEM((2, 1, Rq), jnp.float32),
        pltpu.VMEM((2, D, Adim), jnp.int8),
        pltpu.VMEM((2, 1, D), jnp.float32),
        pltpu.VMEM((2, 2 * F, D), jnp.int8),
        pltpu.VMEM((2, 1, 2 * F), jnp.float32),
        pltpu.VMEM((2, D, F), jnp.int8),
        pltpu.VMEM((2, 1, D), jnp.float32),
    ]
    if has_pl:
        scratch += [
            pltpu.VMEM((2, P, D), jnp.int8),
            pltpu.VMEM((2, 1, P), jnp.float32),
            pltpu.VMEM((2, D, P), jnp.int8),
            pltpu.VMEM((2, 1, D), jnp.float32),
        ]
    scratch += [
        pltpu.VMEM((2, S, Hkv * dk), kc.dtype),
        pltpu.VMEM((2, S, Hkv * dv), vc.dtype),
        pltpu.VMEM((32, D), jnp.int8),
        pltpu.VMEM((1, 128), jnp.float32),
    ]
    if has_pl:
        scratch += [
            pltpu.VMEM((32, Lp), jnp.int8),      # plemb row window
            pltpu.VMEM((1, 128), jnp.float32),   # plemb scale window
            pltpu.VMEM((Lp, D), jnp.int8),       # whole per_layer_model_proj
            pltpu.VMEM((1, Lp), jnp.float32),    # its row scales
            pltpu.VMEM((1, Lp), jnp.float32),    # emb row * sqrt(P)
            pltpu.VMEM((1, Lp), jnp.float32),    # proj(x) / sqrt(D)
        ]
    if shared:
        scratch += [
            pltpu.VMEM((2, Hkv * dk), kc.dtype),  # fresh source K rows
            pltpu.VMEM((2, Hkv * dv), vc.dtype),  # fresh source V rows
        ]
    scratch += [
        pltpu.VMEM((2, TN, D), jnp.int8),
        pltpu.VMEM((2, 1, TN), jnp.float32),
        pltpu.VMEM((2, 1, TN), jnp.float32),
        pltpu.VMEM((1, D), jnp.float32),
        pltpu.VMEM((1, D), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2, 14 if has_pl else 10)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_pl:
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * (Rq * D + D * Adim + 3 * D * F + 2 * P * D)
            + 2 * V * D + 2 * Lp * D,
            bytes_accessed=L * (Rq * D + D * Adim + 3 * D * F + 2 * P * D)
            + V * D + Lp * D + 2 * L * S * Hkv * dk,
            transcendentals=L * (F + H * S + P),
        ),
        interpret=interpret,
    )(*args)


def decode_step_megakernel(hp, w, cache, token, pos, *, windows=None,
                           interpret=False):
    """One single-token decode step as one Pallas call. ``w.layers`` must
    be the stacked LayerWeights; ``cache`` the stacked KV cache.
    ``windows``: per-layer sliding-window sizes [L] int32 (0 = no window;
    the caller decides policy — models/gemma.py passes hp.swa_window when
    LLMI_SWA_MASK=1, zeros otherwise). Returns (logits [vocab] f32 —
    softcap applied by the caller, new cache arrays)."""
    lw = w.layers
    L = lw.wqkv.q.shape[0]
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    base_idx, cos, sin = _rope_tables(hp, L, pos)
    windows = (jnp.zeros((L,), dtype=jnp.int32) if windows is None
               else jnp.asarray(windows, dtype=jnp.int32))

    f32 = jnp.float32
    has_pa = lw.post_attn_norm is not None
    has_pf = lw.post_ffw_norm is not None
    # gemma4 static features (reference model.cpp:568-704, 774-835, 927-977)
    has_pl = w.token_embd_per_layer is not None
    v_norm = hp.architecture == "gemma4"
    has_os = lw.out_scale is not None
    n_kv = hp.n_kv_layers
    shared = n_kv < L
    kvsrc = (jnp.asarray([hp.kv_source_layer(i) for i in range(L)],
                         dtype=jnp.int32) if shared else None)
    src_a = hp.n_layer_kv_from_start - 1 if shared else 0
    src_b = max(hp.n_layer_kv_from_start - 2, 0) if shared else 0
    pl_kw = {}
    if has_pl:
        P = hp.embedding_length_per_layer
        plg, plj = lw.per_layer_inp_gate, lw.per_layer_proj
        pl_kw = dict(
            pln=w.per_layer_proj_norm.astype(f32).reshape(1, P),
            plpn=lw.per_layer_post_norm.astype(f32),
            plg_q=plg.q, plg_s=plg.scale.reshape(L, 1, -1),
            plj_q=plj.q, plj_s=plj.scale.reshape(L, 1, -1),
            plemb_q=w.token_embd_per_layer.q,
            plemb_s=w.token_embd_per_layer.scale.reshape(1, -1),
            plproj_q=w.per_layer_model_proj.q,
            plproj_s=w.per_layer_model_proj.scale.reshape(1, -1),
        )
    logits, kc, vc = _run_step(
        jnp.asarray(token, dtype=jnp.int32).reshape(1),
        jnp.asarray(pos, dtype=jnp.int32).reshape(1),
        base_idx, windows, cos, sin,
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
        # flat [n_kv, S, Hkv*dk] view: no size-1 tiled-dim slices in-kernel
        cache.k.reshape(n_kv, cache.k.shape[1], -1),
        cache.v.reshape(n_kv, cache.v.shape[1], -1),
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        H=hp.n_head, Hkv=hp.n_head_kv, dk=dk, dv=dv,
        has_pa=has_pa, has_pf=has_pf,
        n_kv=n_kv, src_a=src_a, src_b=src_b, v_norm=v_norm,
        has_os=has_os, has_pl=has_pl,
        kvsrc=kvsrc,
        os_=(lw.out_scale.astype(f32).reshape(L) if has_os else None),
        **pl_kw, interpret=interpret,
    )
    return logits[0], kc.reshape(cache.k.shape), vc.reshape(cache.v.shape)
