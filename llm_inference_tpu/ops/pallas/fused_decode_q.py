"""Whole-step LOSSLESS decode megakernel: group-scaled quantized weights
at the same HBM stream rate as the per-row-int8 kernel.

The per-row (rowq8) megakernel (fused_decode.py) applies one scale per
output row AFTER the mixed bf16xint8 MXU dot — but rowq8 is a lossy
requantization. GGUF formats carry per-32 (or per-16) group scales along
the CONTRACTION dim, and expanding them across columns costs a VPU cast
that caps the stream at ~2/3 of the mixed-dot rate (tools/probe_kernels).

This kernel keeps the integer quants EXACT and still feeds the MXU int8:

  - weights are stored transposed [C, R] int8 in logical column order
    (quant/device.py TQuantTensor), scales transposed + block-padded
    [Gp, R] f32;
  - the C columns split into blocks of BG groups (BG*gs columns). For
    each block, the activation row expands to a [Mp<=16, BC] masked
    matrix X[m, c] = x[c] * (c//gs == m) — a free sublane broadcast
    against an iota mask;
  - P = X @ W_block is ONE MXU dot whose A-operand M-slot carries all
    BG group-partials at no extra pass cost (M <= 16 rides the same
    [128, x] A-tile a GEMV wastes — verified zero overhead vs the plain
    mixed GEMV, tools/probe_maskdot.py);
  - y += sum_sublanes(scale_block * P) applies the EXACT f32 scales to
    f32 partials (strictly tighter numerics than the per-matmul fused
    kernel, which rounds scales to bf16), plus Q4_K's min-offset term
    from the blocks' masked row sums.

Pipeline structure (double-buffered whole-layer DMA, attention in VMEM,
tiled tied-logits) is identical to fused_decode.py; reference counterpart
of the computation chain: model.cpp:706-1049.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.device import (
    DenseTensor,
    Q4Tensor,
    QuantTensor,
    TQ4Tensor,
    TQuantTensor,
    maskdot_block_geom,
)
from .fused_decode import (
    _LOGITS_TILE,
    _VMEM_LIMIT,
    _rms,
    _rope_rows,
    _rope_tables,
)

LANE = 128
_BUFFER_BUDGET = 110 * 1024 * 1024


def whole_layer_fits(layer_bytes: int, D: int, V: int) -> bool:
    """Single source of truth for the whole-layer VMEM budget: a
    double-buffered layer set plus the double-buffered bf16 logits tiles
    and the 16-row embedding gather window. Used by
    ``megakernel_q_supported`` and by the engine's capacity-path gap-band
    precheck (engine.py) so the two can never diverge."""
    TN = V if V <= _LOGITS_TILE else _LOGITS_TILE
    need = 2 * layer_bytes + 2 * TN * D * 2 + 16 * D * 2
    return need <= _BUFFER_BUDGET


def _convertible(p) -> bool:
    """A layer projection the masked-dot kernel can consume — already in
    the transposed layout, or a group-scaled planar tensor a load-time
    repack (models/weights.py maskdot_layers) can transpose."""
    if isinstance(p, (TQuantTensor, TQ4Tensor)):
        return True
    return isinstance(p, (QuantTensor, Q4Tensor)) and p.groups > 1


def _scale_rows(p) -> int:
    if isinstance(p, (TQuantTensor, TQ4Tensor)):
        return p.sT.shape[-2]
    bg, bc, nblk, mp = maskdot_block_geom(p.cols, p.group_size)
    return nblk * mp


def _weight_bytes(p) -> int:
    half = isinstance(p, (TQ4Tensor, Q4Tensor))
    return p.cols * p.rows // (2 if half else 1)


def _has_off(p) -> bool:
    if isinstance(p, (TQuantTensor, TQ4Tensor)):
        return p.offT is not None
    return p.offset is not None


def megakernel_q_supported(hp, w) -> bool:
    """Eligibility of the lossless whole-step kernel: stacked homogeneous
    layers of group-scaled quant weights (TQuantTensor, or QuantTensor
    convertible to it), a dense bf16 tied embedding, gemma3 attention (own
    KV per layer, q/k norms, no ALiBi, uniform head dims), and the
    double-buffered layer set + logits tiles fitting VMEM."""
    from ...models.weights import LayerWeights

    lw = w.layers
    if not isinstance(lw, LayerWeights):
        return False
    if w.token_embd_per_layer is not None or hp.architecture == "gemma4":
        return False
    if hp.f_max_alibi_bias > 0.0:
        return False
    parts = [lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down]
    if any(p is None or not _convertible(p) for p in parts):
        return False
    emb = w.token_embd
    if not (isinstance(emb, DenseTensor) and emb.w.dtype == jnp.bfloat16):
        return False
    if lw.q_norm is None or lw.k_norm is None:
        return False
    if hp.n_embd_head_k != hp.n_embd_head_k_swa or hp.n_embd_head_v != hp.n_embd_head_v_swa:
        return False
    D = hp.embedding_length
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    F = lw.w_down.cols
    Adim = lw.wo.cols
    V = emb.rows
    Rq = lw.wqkv.rows
    if D % LANE or F % LANE or Adim % LANE or dk % LANE or dv % LANE:
        return False
    if V % 16:
        return False  # bf16 gather window
    if V <= _LOGITS_TILE:
        if V % LANE:
            return False
    elif V % _LOGITS_TILE:
        return False
    if Rq != hp.n_head * dk + hp.n_head_kv * (dk + dv):
        return False
    for p in parts:
        if maskdot_block_geom(p.cols, p.group_size) is None:
            return False
    layer_bytes = 0
    for p in parts:
        layer_bytes += _weight_bytes(p)  # int8 / packed nibbles
        nsc = 2 if _has_off(p) else 1
        layer_bytes += nsc * _scale_rows(p) * p.rows * 4
    return whole_layer_fits(layer_bytes, D, V)


def _qdot(qref, sref, offref, bsel, x_bf, *, gs, geom, packed=False,
          centered=False):
    """[1, C] bf16 x transposed quant block buffers -> [1, R] f32 with
    exact f32 group scales (see module docstring). ``packed``: qref holds
    block-paired SIGN-HI nibbles (TQ4Tensor): lo = B & 0x0F is the raw
    low quant, hi = B & 0xF0 is exactly 16*(n_hi - 8) as int8 — the only
    unpack ops are two int8 ANDs feeding mixed bf16xint8 half-dots
    (Mosaic legalizes no sub-32-bit vector shifts; the /16 and +8 rebias
    live in the folded scales/offsets, quant/device.py). 1.65x the
    int32-widening unpack on the gate_up geometry (tools/probe_q4_unpack)."""
    BG, BC, nblk, Mp = geom
    C = x_bf.shape[1]
    # The group-local mask pattern is periodic in BC, so ONE offset-0
    # broadcast-multiply builds every block's masked A-operand (Mosaic
    # can't broadcast lane-offset slices); blocks then slice the product.
    sub = jax.lax.broadcasted_iota(jnp.int32, (Mp, C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Mp, C), 1)
    # arithmetic 0/1 mask (i1 vectors hit Mosaic relayout limits);
    # padding rows m >= BG come out all-zero
    m = jnp.maximum(0, 1 - jnp.abs((lane % BC) // gs - sub)).astype(jnp.bfloat16)
    xm_full = x_bf * m  # [Mp, C]
    if packed and centered:
        # Q4_0's implicit off = 8*s applies to the LOW-nibble groups
        # (block rows m < BG/2); the high groups' rebias cancelled into
        # the folded scales. 0/1 sublane mask, arithmetic form.
        sub1 = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
        lom8 = 8.0 * jnp.maximum(
            0, jnp.minimum(1, BG // 2 - sub1)).astype(jnp.float32)
    acc = None
    for b in range(nblk):
        xm = xm_full[:, b * BC : (b + 1) * BC]
        sblk = sref[bsel, b * Mp : (b + 1) * Mp, :]
        if packed:
            h = BC // 2
            blk = qref[bsel, b * h : (b + 1) * h, :]
            lo = blk & jnp.int8(0x0F)
            hi = blk & jnp.int8(~0x0F)
            pb = jax.lax.dot_general(
                xm[:, :h], lo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pb = pb + jax.lax.dot_general(
                xm[:, h:], hi,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Mp, R]
        else:
            wb = qref[bsel, b * BC : (b + 1) * BC, :]
            pb = jax.lax.dot_general(
                xm, wb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Mp, R]
        # accumulate [Mp, R] ELEMENTWISE; the single cross-sublane reduce
        # happens once after the block loop (sum linearity) — the
        # per-block axis-0 sum this replaces is the VPU's slow shuffle
        # path, repeated nblk times per part
        contrib = sblk * pb  # [Mp, R]
        if offref is not None:
            # offset term: y[r] -= sum_g off[g, r] * sum_{c in g} x[c]
            # (Q4_K mins; sign-hi folding already adjusted the hi rows)
            xg = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)  # [Mp, 1]
            contrib = contrib - offref[bsel, b * Mp : (b + 1) * Mp, :] * xg
        elif packed and centered:
            xg = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)
            contrib = contrib - lom8 * sblk * xg
        acc = contrib if acc is None else acc + contrib
    return jnp.sum(acc, axis=0, keepdims=True)


def _make_kernel(*, L, H, Hkv, dk, dv, D, F, Rq, Adim, V, S, TN,
                 eps, attn_scale, softcap, has_pa, has_pf,
                 geoms, gss, has_off, packed, centered):
    group = H // Hkv
    nt = V // TN
    n_w = 8 + sum(has_off)  # weight+scale(+offset) copies per layer
    n_wdma = n_w + 2  # + the layer's K/V cache copies

    def kernel(*refs):
        idx = 0

        def nxt():
            nonlocal idx
            r = refs[idx]
            idx += 1
            return r

        token_r, pos_r, base_idx_r, win_r = nxt(), nxt(), nxt(), nxt()
        cos_r, sin_r = nxt(), nxt()
        an_r, fn_r, qn_r, kn_r, on_r = nxt(), nxt(), nxt(), nxt(), nxt()
        pan_r = nxt() if has_pa else None
        pfn_r = nxt() if has_pf else None
        win = []  # (qT, sT, offT?) per weight in qkv/wo/gu/wd order
        for i in range(4):
            q_ = nxt()
            s_ = nxt()
            o_ = nxt() if has_off[i] else None
            win.append((q_, s_, o_))
        emb_r = nxt()
        kc, vc = nxt(), nxt()
        logits_out, kc_out, vc_out = nxt(), nxt(), nxt()
        wbufs = []
        for i in range(4):
            qb_ = nxt()
            sb_ = nxt()
            ob_ = nxt() if has_off[i] else None
            wbufs.append((qb_, sb_, ob_))
        kb, vb = nxt(), nxt()
        emb_b = nxt()
        lw_b, lo_b = nxt(), nxt()
        x_s, h_s = nxt(), nxt()
        wsem, wbsem, lsem, osem, esem = [nxt() for _ in range(5)]

        tok = token_r[0]
        p = pos_r[0]

        def layer_copies(l, b):
            cs = []
            si = 0
            for (qh, sh, oh), (qb_, sb_, ob_) in zip(win, wbufs):
                cs.append(pltpu.make_async_copy(qh.at[l], qb_.at[b], wsem.at[b, si]))
                si += 1
                cs.append(pltpu.make_async_copy(sh.at[l], sb_.at[b], wsem.at[b, si]))
                si += 1
                if oh is not None:
                    cs.append(pltpu.make_async_copy(oh.at[l], ob_.at[b], wsem.at[b, si]))
                    si += 1
            cs.append(pltpu.make_async_copy(kc.at[l], kb.at[b], wsem.at[b, si]))
            cs.append(pltpu.make_async_copy(vc.at[l], vb.at[b], wsem.at[b, si + 1]))
            return cs

        # embedding row: bf16 HBM is (16, 128)-tiled -> DMA the aligned
        # 16-row window around the token id and mask-select
        tok0 = pl.multiple_of((tok // 16) * 16, 16)
        e0 = pltpu.make_async_copy(emb_r.at[pl.ds(tok0, 16)], emb_b, esem.at[0])
        e0.start()
        for c in layer_copies(0, 0):
            c.start()
        e0.wait()
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == tok - tok0)
        row = jnp.sum(jnp.where(rowsel, emb_b[:].astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)
        x_s[:] = row * jnp.float32(math.sqrt(D))

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
            qkv = _qdot(wbufs[0][0], wbufs[0][1], wbufs[0][2], b, h,
                        gs=gss[0], geom=geoms[0], packed=packed[0],
                        centered=centered[0])  # [1, Rq]

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

            # new token's K/V row into the VMEM cache copy + writeback
            p0 = pl.multiple_of((p // 16) * 16, 16)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == p - p0
            kwin = kb[b, pl.ds(p0, 16), :]
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
            # causal + optional per-layer sliding window (real SWA; see
            # fused_decode.py / models/gemma.py _masked_scores)
            wl = win_r[l]
            valid = (ids <= p) & ((wl <= 0) | (ids > p - wl))
            outs = []
            for i in range(Hkv):
                qi = qb[i * group : (i + 1) * group, :]
                ki = kb[b][:, i * dk : (i + 1) * dk]
                s = jax.lax.dot_general(
                    qi, ki,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if softcap > 0.0:
                    s = softcap * jnp.tanh(s / softcap)
                s = jnp.where(valid, s, -jnp.inf)
                m = jnp.max(s, axis=1, keepdims=True)
                pr = jnp.where(valid, jnp.exp(s - m), 0.0)
                denom = jnp.sum(pr, axis=1, keepdims=True)
                vi = vb[b][:, i * dv : (i + 1) * dv]
                pv = jax.lax.dot_general(
                    pr.astype(jnp.bfloat16), vi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(pv / denom)
            attn = outs[0] if Hkv == 1 else jnp.concatenate(outs, axis=0)
            attn_flat = attn.reshape(1, H * dv).astype(jnp.bfloat16)

            y = _qdot(wbufs[1][0], wbufs[1][1], wbufs[1][2], b, attn_flat,
                      gs=gss[1], geom=geoms[1], packed=packed[1],
                      centered=centered[1])
            if has_pa:
                y = _rms(y, eps) * pan_r[pl.ds(l, 1), :]
            x2 = x + y
            h2 = (_rms(x2, eps) * fn_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            gu = _qdot(wbufs[2][0], wbufs[2][1], wbufs[2][2], b, h2,
                       gs=gss[2], geom=geoms[2], packed=packed[2],
                       centered=centered[2])  # [1, 2F]
            g = gu[:, :F]
            u = gu[:, F:]
            c = jnp.float32(0.7978845608028654)
            a = 0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))) * u
            y3 = _qdot(wbufs[3][0], wbufs[3][1], wbufs[3][2], b,
                       a.astype(jnp.bfloat16), gs=gss[3], geom=geoms[3],
                       packed=packed[3], centered=centered[3])
            if has_pf:
                y3 = _rms(y3, eps) * pfn_r[pl.ds(l, 1), :]
            x_s[:] = x2 + y3
            return carry

        jax.lax.fori_loop(0, L, body, 0)

        h_s[:] = (_rms(x_s[:], eps) * on_r[:]).astype(jnp.bfloat16)

        # tied-embedding logits: bf16 [TN, D] tiles, double-buffered
        def lcopies(t, s_):
            off = pl.multiple_of(t * TN, 16)
            return [
                pltpu.make_async_copy(emb_r.at[pl.ds(off, TN)], lw_b.at[s_],
                                      lsem.at[s_]),
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

            lo_b[s_] = jax.lax.dot_general(
                h_s[:], lw_b[s_],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ocopy(t, s_).start()
            return carry

        jax.lax.fori_loop(0, nt, lbody, 0)
        for t in range(max(0, nt - 2), nt):
            ocopy(t, t % 2).wait()

    return kernel, n_wdma


@functools.partial(
    jax.jit,
    static_argnames=("eps", "attn_scale", "softcap", "H", "Hkv", "dk", "dv",
                     "has_pa", "has_pf", "geoms", "gss", "has_off", "packed",
                     "centered", "interpret"),
)
def _run_step(
    token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on, pan, pfn,
    wparts, emb, kc, vc,
    *, eps, attn_scale, softcap, H, Hkv, dk, dv, has_pa, has_pf,
    geoms, gss, has_off, packed, centered, interpret=False,
):
    L = wparts[0][0].shape[0]
    # packed parts store cols//2 nibble rows
    D = wparts[0][0].shape[1] * (2 if packed[0] else 1)
    Rq = wparts[0][0].shape[2]
    Adim = wparts[1][0].shape[1] * (2 if packed[1] else 1)
    F = wparts[3][0].shape[1] * (2 if packed[3] else 1)
    V = emb.shape[0]
    S = kc.shape[1]  # [L, S, Hkv*dk]
    TN = V if V <= _LOGITS_TILE else _LOGITS_TILE
    if S % 16:
        raise ValueError(f"megakernel needs max_seq % 16 == 0, got {S}")
    if V % 16 or TN % LANE:
        raise ValueError(f"megakernel needs vocab % 16 == 0, got {V}")

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [smem, smem, smem, smem, vmem, vmem, vmem, vmem, vmem, vmem, vmem]
    args = [token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on]
    if has_pa:
        in_specs.append(vmem)
        args.append(pan)
    if has_pf:
        in_specs.append(vmem)
        args.append(pfn)
    scratch = []
    for i, parts in enumerate(wparts):
        for x in parts:
            in_specs.append(anym)
            args.append(x)
        qa, sa = parts[0], parts[1]
        scratch.append(pltpu.VMEM((2,) + qa.shape[1:], jnp.int8))
        scratch.append(pltpu.VMEM((2,) + sa.shape[1:], jnp.float32))
        if has_off[i]:
            scratch.append(pltpu.VMEM((2,) + parts[2].shape[1:], jnp.float32))
    in_specs += [anym, anym, anym]
    args += [emb, kc, vc]
    kc_idx = len(args) - 2
    vc_idx = len(args) - 1

    kernel, n_wdma = _make_kernel(
        L=L, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, F=F, Rq=Rq, Adim=Adim, V=V,
        S=S, TN=TN, eps=eps, attn_scale=attn_scale, softcap=softcap,
        has_pa=has_pa, has_pf=has_pf, geoms=geoms, gss=gss, has_off=has_off,
        packed=packed, centered=centered,
    )
    scratch += [
        pltpu.VMEM((2, S, Hkv * dk), kc.dtype),
        pltpu.VMEM((2, S, Hkv * dv), vc.dtype),
        pltpu.VMEM((16, D), jnp.bfloat16),
        pltpu.VMEM((2, TN, D), jnp.bfloat16),
        pltpu.VMEM((2, 1, TN), jnp.float32),
        pltpu.VMEM((1, D), jnp.float32),
        pltpu.VMEM((1, D), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2, n_wdma)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    wbytes = sum(p[0].shape[1] * p[0].shape[2] for p in wparts)
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
            flops=2 * 16 * L * wbytes + 2 * V * D,
            bytes_accessed=L * wbytes + V * D * 2 + 2 * L * S * Hkv * dk,
            transcendentals=L * (F + H * S),
        ),
        interpret=interpret,
    )(*args)


def decode_step_megakernel_q(hp, w, cache, token, pos, *, windows=None,
                             interpret=False):
    """One lossless single-token decode step as one Pallas call over
    transposed group-scaled weights (TQuantTensor). ``windows``: per-layer
    sliding-window sizes [L] int32 (0 = none; see fused_decode.py).
    Returns (logits [vocab] f32 — softcap applied by the caller, new
    cache arrays)."""
    lw = w.layers
    L = lw.wqkv.sT.shape[0]
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    half = dk // 2

    base_idx, cos, sin = _rope_tables(hp, L, pos)
    windows = (jnp.zeros((L,), dtype=jnp.int32) if windows is None
               else jnp.asarray(windows, dtype=jnp.int32))

    f32 = jnp.float32
    has_pa = lw.post_attn_norm is not None
    has_pf = lw.post_ffw_norm is not None
    weights = [lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down]
    packed = tuple(isinstance(wt, TQ4Tensor) for wt in weights)
    wparts = tuple(
        ((wt.packedT if pk else wt.qT), wt.sT)
        + ((wt.offT,) if wt.offT is not None else ())
        for wt, pk in zip(weights, packed)
    )
    # the tensor's OWN block geometry — a shard-aware repack
    # (maskdot_layers shard=n) may have picked a smaller bg than
    # maskdot_block_geom's cols-only default, and the sign-hi scale
    # folding is baked to it
    geoms = tuple(
        (wt.bg, wt.bg * wt.group_size, wt.n_blocks, wt.mp) for wt in weights)
    gss = tuple(wt.group_size for wt in weights)
    has_off = tuple(wt.offT is not None for wt in weights)
    centered = tuple(getattr(wt, "centered", False) for wt in weights)

    logits, kc, vc = _run_step(
        jnp.asarray(token, dtype=jnp.int32).reshape(1),
        jnp.asarray(pos, dtype=jnp.int32).reshape(1),
        base_idx, windows, cos, sin,
        lw.attn_norm.astype(f32), lw.ffn_norm.astype(f32),
        lw.q_norm.astype(f32), lw.k_norm.astype(f32),
        w.output_norm.astype(f32)[None, :],
        lw.post_attn_norm.astype(f32) if has_pa else None,
        lw.post_ffw_norm.astype(f32) if has_pf else None,
        wparts,
        w.token_embd.w,
        cache.k.reshape(L, cache.k.shape[1], -1),
        cache.v.reshape(L, cache.v.shape[1], -1),
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        H=hp.n_head, Hkv=hp.n_head_kv, dk=dk, dv=dv,
        has_pa=has_pa, has_pf=has_pf,
        geoms=geoms, gss=gss, has_off=has_off, packed=packed,
        centered=centered, interpret=interpret,
    )
    return logits[0], kc.reshape(cache.k.shape), vc.reshape(cache.v.shape)
