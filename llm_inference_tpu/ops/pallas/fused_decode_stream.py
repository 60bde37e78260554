"""Streamed whole-step decode megakernel for CAPACITY-class models.

The whole-layer megakernels (fused_decode.py, fused_decode_q.py) double-
buffer an entire layer's weights in VMEM — perfect for 1B-class layers
(~27 MB) but structurally impossible for 12B-class ones (a 48-layer
Gemma-3-12B moves ~140 MB of packed weights+scales per layer; v5e VMEM is
128 MiB total). Round-2 measurements put the per-matmul fallback at ~33%
of the 12B stream's speed-of-light: per-kernel launch gaps and the
unfused attention/glue leave the HBM pipe idle between GEMVs.

This kernel streams each projection in ROW-TILES instead: the transposed
masked-dot layout (quant/device.py TQuantTensor / TQ4Tensor) stores
weights contraction-major [C, R], so a tile is a [C, TR] lane-slice —
every group of every column is complete inside one tile, the tile's
masked-dot output is a final [1, TR] slice of the projection (no
cross-tile reduction), and exact f32 group scales ride per-tile.

Pipeline (per layer, parts in dataflow order qkv -> wo -> gate_up -> down):

  - each part owns TWO tile slots; tiles t0/t1 are prefetched by the
    PREDECESSOR part (the previous part's last tile issue, or the layer
    prologue), tile t+2 is issued as soon as compute on tile t frees its
    slot — the HBM queue always holds >= 1 outstanding tile, so the
    weight stream never stalls on the serial attention/glue chain;
  - the layer's K/V cache copies double-buffer by layer parity and are
    issued one layer ahead (during the previous layer's down stream);
  - the tile loops are unrolled at trace time (static lane offsets — the
    masked-dot output writes need static slices), with an eligibility cap
    on the total MXU-dot count to bound Mosaic compile time;
  - embedding row gather, attention (whole-layer cache in VMEM), K/V row
    writeback, and the tiled tied-logits tail are identical in structure
    to fused_decode_q.py.

Same numerics as fused_decode_q.py: mixed bf16xint8 MXU dots (exact),
masked group-partials contracted with exact f32 scales on the A-operand
M-slot, Q4_K min-offsets via masked row sums. Reference counterpart of
the computation chain: model.cpp:706-1049.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.device import DenseTensor, TQ4Tensor, TQuantTensor
from .fused_decode import (
    LANE,
    _LOGITS_TILE,
    _VMEM_LIMIT,
    _rms,
    _rope_rows,
    _rope_tables,
)

_BUFFER_BUDGET = 110 * 1024 * 1024
# per-slot bytes (quants + scales + offsets); LLMI_STREAM_TILE_KB sweeps
# the tile size on hardware (tools/hw profiling of the capacity kernel)
_TILE_TARGET = int(os.environ.get("LLMI_STREAM_TILE_KB",
                                  str(6 * 1024))) * 1024
_MAX_DOTS = 640  # unrolled MXU dot cap (trace/compile-time guard)


def _part_meta(p):
    """(packed, Cstore, C, R, gs, bg, bc, nblk, mp, has_off, centered,
    raw16)."""
    packed = isinstance(p, TQ4Tensor)
    qa = p.packedT if packed else p.qT
    return dict(
        packed=packed,
        c_store=qa.shape[-2],
        C=p.cols,
        R=p.rows,
        gs=p.group_size,
        bg=p.bg,
        bc=p.bg * p.group_size,
        nblk=p.n_blocks,
        mp=p.mp,
        gp=p.n_blocks * p.mp,
        has_off=p.offT is not None,
        centered=bool(getattr(p, "centered", False)),
        # RAW-f16 scales (TQ4Tensor docstring): unfolded per-group d at
        # 2 B/scale; the kernel applies the sign-hi /16 itself
        raw16=bool(p.sT.dtype == jnp.float16),
    )


def _slot_bytes(m, tr):
    b = m["c_store"] * tr  # int8 quants (packed nibbles count as stored rows)
    b += m["gp"] * tr * (2 if m.get("raw16") else 4)  # scales
    if m["has_off"]:
        b += m["gp"] * tr * 4
    return b


def _pick_tr(m):
    """Largest TR (multiple of 128 dividing R) whose slot fits the tile
    target; None when even TR=128 doesn't fit (can't happen for real C)."""
    R = m["R"]
    best = None
    for k in range(1, R // LANE + 1):
        if R % k:
            continue
        tr = R // k
        if tr % LANE:
            continue
        if _slot_bytes(m, tr) <= _TILE_TARGET:
            best = tr
            break
    return best


def _plan(parts):
    """Per-part tile plans [{..meta, TR, nt}] or None (cap/shape fail)."""
    plans = []
    dots = 0
    for p in parts:
        m = _part_meta(p)
        tr = _pick_tr(m)
        if tr is None:
            return None
        m["TR"] = tr
        m["nt"] = m["R"] // tr
        dots += m["nt"] * m["nblk"]
        plans.append(m)
    if dots > _MAX_DOTS:
        return None
    return plans


def _base_need(plans, D, Hkv, dk, dv, max_seq):
    """VMEM bytes for everything except the logits tiles: double-buffered
    weight slots, per-part masks, and the parity-double-buffered K/V."""
    need = sum(2 * _slot_bytes(m, m["TR"]) for m in plans)
    need += sum(m["mp"] * m["C"] * 2 for m in plans)  # bf16 masks
    if max_seq is not None:
        need += 4 * max_seq * Hkv * (dk + dv)  # 2 x bf16 K+V slots
    return need


def _pick_tn(V, D, base_need, ldepth=2):
    """Largest logits tile TN (<=_LOGITS_TILE, dividing V, lane-aligned)
    whose ``ldepth`` bf16 [TN, D] buffers fit the remaining VMEM budget.
    The 1B geometry keeps TN=4096; capacity models (D 3840+) shrink it so
    the fixed tile no longer blows the budget. None when even TN=256
    fails. ``ldepth`` is the logits stream pipeline depth
    (LLMI_STREAM_LDEPTH): deeper keeps more embedding-tile DMAs in
    flight at the cost of a smaller tile."""
    if V <= _LOGITS_TILE:
        tn = V
        if V % LANE:
            return None
        return tn if base_need + ldepth * tn * D * 2 <= _BUFFER_BUDGET else None
    tn = _LOGITS_TILE
    while tn >= 256:
        if V % tn == 0 and base_need + ldepth * tn * D * 2 <= _BUFFER_BUDGET:
            return tn
        tn //= 2
    return None


def stream_supported_from_directory(gguf, hp, *, q4, max_seq) -> bool:
    """Structural eligibility from the GGUF tensor DIRECTORY alone — every
    input to the tile planner (formats, rows/cols, group geometry, dot
    cap, logits-tile fit) is derivable without reading tensor data, so
    the engine can reject the capacity path before paying the multi-GB
    host repack + upload (measured 2586 s for the 27B) only to throw it
    away. Conservative: a True here can still be refined by the
    post-load megakernel_stream_supported; a False is final."""
    from ...gguf.constants import GGMLType
    from ...quant.device import _PLANAR, maskdot_block_geom

    if hp.architecture == "gemma4" or hp.embedding_length_per_layer:
        return False
    if hp.f_max_alibi_bias > 0.0:
        return False
    if (hp.n_embd_head_k != hp.n_embd_head_k_swa
            or hp.n_embd_head_v != hp.n_embd_head_v_swa):
        return False
    infos = {i.name: i for i in gguf.tensor_infos}
    for req in ("token_embd.weight", "output_norm.weight",
                "blk.0.attn_q_norm.weight", "blk.0.attn_k_norm.weight"):
        if req not in infos:
            return False
    names = ("attn_q.weight", "attn_k.weight", "attn_v.weight",
             "attn_output.weight", "ffn_gate.weight", "ffn_up.weight",
             "ffn_down.weight")
    fmt = None
    for l in range(hp.block_count):
        for n in names:
            info = infos.get(f"blk.{l}.{n}")
            if info is None:
                return False
            f = GGMLType(info.tensor_type)
            if f not in _PLANAR:
                return False
            if fmt is None:
                fmt = f
            elif f != fmt:  # load_maskdot_stacked rejects mixed layers
                return False
    gs = 16 if fmt == GGMLType.Q6_K else 32
    packed = q4 and fmt in (GGMLType.Q4_0, GGMLType.Q4_K)
    has_off = fmt == GGMLType.Q4_K
    D = hp.embedding_length
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    Rq = sum(infos[f"blk.0.{n}"].n_rows
             for n in ("attn_q.weight", "attn_k.weight", "attn_v.weight"))
    Adim = infos["blk.0.attn_output.weight"].n_cols
    F = infos["blk.0.ffn_down.weight"].n_cols
    n_ff = infos["blk.0.ffn_gate.weight"].n_rows
    V = infos["token_embd.weight"].n_rows
    if Rq != hp.n_head * dk + hp.n_head_kv * (dk + dv):
        return False
    if D % LANE or F % LANE or Adim % LANE or dk % LANE or dv % LANE:
        return False
    if V % 16 or (max_seq is not None and max_seq % 16):
        return False

    def meta(rows, cols):
        geom = maskdot_block_geom(cols, gs)
        if geom is None:
            return None
        bg, bc, nblk, mp = geom
        p_ = packed and bc % 2 == 0
        return dict(packed=p_, c_store=cols // 2 if p_ else cols, C=cols,
                    R=rows, gs=gs, bg=bg, bc=bc, nblk=nblk, mp=mp,
                    gp=nblk * mp, has_off=has_off, centered=False)

    metas, dots = [], 0
    for rows, cols in ((Rq, D), (D, Adim), (2 * n_ff, D), (D, F)):
        m = meta(rows, cols)
        if m is None:
            return False
        tr = _pick_tr(m)
        if tr is None:
            return False
        m["TR"], m["nt"] = tr, rows // tr
        dots += m["nt"] * m["nblk"]
        metas.append(m)
    if dots > _MAX_DOTS:
        return False
    base = _base_need(metas, D, hp.n_head_kv, dk, dv, max_seq)
    return _pick_tn(V, D, base) is not None


def megakernel_stream_supported(hp, w, *, max_seq=None) -> bool:
    """Eligibility of the streamed capacity megakernel: the same structural
    contract as fused_decode_q.megakernel_q_supported (stacked transposed
    group-scaled projections, dense bf16 tied embedding, gemma3 attention)
    WITHOUT the whole-layer VMEM bound — instead each projection must tile
    into <=6 MB lane-slices and the unrolled dot count must stay bounded."""
    from ...models.weights import LayerWeights

    lw = w.layers
    if not isinstance(lw, LayerWeights):
        return False
    if w.token_embd_per_layer is not None or hp.architecture == "gemma4":
        return False
    if hp.f_max_alibi_bias > 0.0:
        return False
    parts = [lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down]
    if any(not isinstance(p, (TQuantTensor, TQ4Tensor)) for p in parts):
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
        return False  # bf16 embedding gather window
    if Rq != hp.n_head * dk + hp.n_head_kv * (dk + dv):
        return False
    plans = _plan(parts)
    if plans is None:
        return False
    base = _base_need(plans, D, hp.n_head_kv, dk, dv, max_seq)
    return _pick_tn(V, D, base) is not None


def _tile_dot(qb, sb, ob, slot, xm_full, m, t):
    """One [1, TR] output slice: masked group-partial dots over the tile's
    contraction blocks with exact f32 scales (fused_decode_q._qdot, tiled).
    ``xm_full`` is the pre-broadcast masked A-operand [Mp, C] — built ONCE
    per part at lane offset 0 (Mosaic can't broadcast lane-offset slices;
    a per-block [1, BC] * [Mp, BC] broadcast at b > 0 fails real Mosaic
    compilation with 'Invalid input layout', caught on hardware Aug 18)."""
    BC, nblk, Mp = m["bc"], m["nblk"], m["mp"]
    if m["packed"] and m["centered"]:
        # Q4_0's implicit off = 8*s on the LOW-nibble groups (sign-hi
        # encoding, fused_decode_q._qdot)
        sub1 = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
        lom8 = 8.0 * jnp.maximum(
            0, jnp.minimum(1, m["bg"] // 2 - sub1)).astype(jnp.float32)
    if m.get("raw16"):
        # RAW-f16 scales: the sign-hi /16 fold is applied HERE, in f32
        # (an exact exponent shift), on the high-group rows
        subh = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
        hi16 = jnp.where(subh >= m["bg"] // 2, jnp.float32(1.0 / 16.0),
                         jnp.float32(1.0))
    # accumulate [Mp, TR] ELEMENTWISE per block and sublane-reduce ONCE
    # per tile: the per-block jnp.sum(axis=0) this replaces is a
    # cross-sublane reduction — the VPU's slow shuffle path — repeated
    # nblk times per tile (sum linearity makes the two orders equal)
    acc = None
    for b in range(nblk):
        xm = xm_full[:, b * BC : (b + 1) * BC]
        sblk = sb[slot, b * Mp : (b + 1) * Mp, :]
        if m.get("raw16"):
            sblk = sblk.astype(jnp.float32) * hi16
        if m["packed"]:
            # sign-hi nibble unpack: two int8 ANDs + two mixed half-dots
            # (quant/device.py TQ4Tensor; scales/offsets pre-folded)
            h = BC // 2
            blk = qb[slot, b * h : (b + 1) * h, :]
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
            )  # [Mp, TR]
        else:
            wb = qb[slot, b * BC : (b + 1) * BC, :]
            pb = jax.lax.dot_general(
                xm, wb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Mp, TR]
        contrib = sblk * pb  # [Mp, TR]
        if ob is not None:
            xg = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)
            contrib = contrib - ob[slot, b * Mp : (b + 1) * Mp, :] * xg
        elif m["packed"] and m["centered"]:
            xg = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)
            contrib = contrib - lom8 * sblk * xg
        acc = contrib if acc is None else acc + contrib
    return jnp.sum(acc, axis=0, keepdims=True)


def _make_kernel(*, L, H, Hkv, dk, dv, D, F, Rq, Adim, V, S, TN,
                 eps, attn_scale, softcap, has_pa, has_pf, plans,
                 no_attn=False, no_logits=False, ldepth=2, defer_wb=False,
                 eager=True):
    group = H // Hkv
    nt_log = V // TN

    def head_trigger(i):
        """run_part tile index at which the NEXT part's head DMAs issue.
        eager (default): 2 tiles before the end, so the DMA queue never
        drains at a part boundary — triggering at the LAST tile (the old
        schedule, LLMI_STREAM_EAGER=0) leaves the engine idle for the
        final two tile-computes and then exposes the next head's copy
        latency; ~4 boundaries x 48 layers of that is milliseconds at
        the 12B geometry."""
        return max(0, plans[i]["nt"] - 3) if eager else plans[i]["nt"] - 1

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
        win = []  # (qT, sT, offT?) HBM refs per part
        for m in plans:
            q_ = nxt()
            s_ = nxt()
            o_ = nxt() if m["has_off"] else None
            win.append((q_, s_, o_))
        emb_r = nxt()
        kc, vc = nxt(), nxt()
        logits_out, kc_out, vc_out = nxt(), nxt(), nxt()
        wbufs = []  # (qb, sb, ob?, out, mask) VMEM per part
        for m in plans:
            qb_ = nxt()
            sb_ = nxt()
            ob_ = nxt() if m["has_off"] else None
            out_ = nxt()
            mask_ = nxt()
            wbufs.append((qb_, sb_, ob_, out_, mask_))
        kb, vb = nxt(), nxt()
        emb_b = nxt()
        lw_b, lo_b = nxt(), nxt()
        x_s, h_s = nxt(), nxt()
        wsems = [nxt() for _ in plans]  # DMA sems [2, 3] per part
        kvsem, wbsem, lsem, osem, esem = [nxt() for _ in range(5)]

        tok = token_r[0]
        p = pos_r[0]

        def tile_copies(i, l, t, slot):
            m = plans[i]
            qh, sh, oh = win[i]
            qb_, sb_, ob_ = wbufs[i][0], wbufs[i][1], wbufs[i][2]
            off = t * m["TR"]
            cs = [
                pltpu.make_async_copy(
                    qh.at[l, :, pl.ds(off, m["TR"])], qb_.at[slot],
                    wsems[i].at[slot, 0]),
                pltpu.make_async_copy(
                    sh.at[l, :, pl.ds(off, m["TR"])], sb_.at[slot],
                    wsems[i].at[slot, 1]),
            ]
            if oh is not None:
                cs.append(pltpu.make_async_copy(
                    oh.at[l, :, pl.ds(off, m["TR"])], ob_.at[slot],
                    wsems[i].at[slot, 2]))
            return cs

        def start_head(i, l):
            """Prefetch tiles 0 (and 1) of part i for layer l."""
            for c in tile_copies(i, l, 0, 0):
                c.start()
            if plans[i]["nt"] > 1:
                for c in tile_copies(i, l, 1, 1):
                    c.start()

        # prefix-bounded, window-aware cache DMA: chunks of S/NKV rows,
        # copying only [lo, hi) where hi covers the causal frontier (and
        # the 16-row insert window) and lo skips rows a sliding window
        # can never attend. The full-slab copy this replaces moved
        # 16.8 MB/layer at ANY fill (~1 ms/step of dead bytes at shallow
        # fills on the 12B). Rows outside [lo, hi) keep the buffer's
        # previous (finite) contents — the prologue zero-fill guarantees
        # no uninitialized-NaN bit pattern ever reaches the PV dot, and
        # the score mask zeroes their probability exactly.
        NKV = 4 if S % 64 == 0 else 1
        CH = S // NKV

        def kv_bounds(l):
            hi = jnp.clip((p + 16 + CH - 1) // CH, 1, NKV)
            wl = win_r[l]
            lo = jnp.where(
                wl > 0,
                jnp.minimum(jnp.maximum(p + 1 - wl, 0) // CH, hi - 1), 0)
            return lo, hi

        def kv_chunk_copies(l, slot, j):
            return [
                pltpu.make_async_copy(kc.at[l, pl.ds(j * CH, CH)],
                                      kb.at[slot, pl.ds(j * CH, CH)],
                                      kvsem.at[slot, 0]),
                pltpu.make_async_copy(vc.at[l, pl.ds(j * CH, CH)],
                                      vb.at[slot, pl.ds(j * CH, CH)],
                                      kvsem.at[slot, 1]),
            ]

        def kv_start(l, slot):
            lo, hi = kv_bounds(l)

            def go(j, c_):
                for cp in kv_chunk_copies(l, slot, j):
                    cp.start()
                return c_

            jax.lax.fori_loop(lo, hi, go, 0)

        def kv_wait(l, slot):
            lo, hi = kv_bounds(l)

            def go(j, c_):
                for cp in kv_chunk_copies(l, slot, j):
                    cp.wait()
                return c_

            jax.lax.fori_loop(lo, hi, go, 0)

        def run_part(i, l, x_bf, *, tail):
            """Stream part i's tiles for layer l; returns [1, R] f32.
            ``tail(t)`` runs after each tile's compute (successor issues)."""
            m = plans[i]
            qb_, sb_, ob_, out_, mask_ = wbufs[i]
            xm_full = x_bf * mask_[:]  # [Mp, C], offset-0 broadcast, once/part
            for t in range(m["nt"]):
                slot = t % 2
                for c in tile_copies(i, l, t, slot):
                    c.wait()
                out_[:, t * m["TR"] : (t + 1) * m["TR"]] = _tile_dot(
                    qb_, sb_, ob_, slot, xm_full, m, t)
                if t + 2 < m["nt"]:
                    for c in tile_copies(i, l, t + 2, slot):
                        c.start()
                tail(t)
            return out_[:]

        # prologue: embedding row window, layer-0 qkv tiles + K/V cache
        tok0 = pl.multiple_of((tok // 16) * 16, 16)
        e0 = pltpu.make_async_copy(emb_r.at[pl.ds(tok0, 16)], emb_b, esem.at[0])
        e0.start()
        start_head(0, 0)
        # zero-fill BOTH cache buffer slots once per step (finite bits in
        # the un-DMA'd region — see kv_bounds), then start layer 0's
        # bounded chunks
        kb[...] = jnp.zeros((2, S, Hkv * dk), dtype=kb.dtype)
        vb[...] = jnp.zeros((2, S, Hkv * dv), dtype=vb.dtype)
        kv_start(0, 0)

        # part masks: group-local 0/1 pattern, periodic in BC; constant
        # across layers (built once, under the prologue DMA shadow).
        # Padding rows m >= bg come out zero.
        for i, m in enumerate(plans):
            sub = jax.lax.broadcasted_iota(jnp.int32, (m["mp"], m["C"]), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (m["mp"], m["C"]), 1)
            wbufs[i][4][:] = jnp.maximum(
                0, 1 - jnp.abs((lane % m["bc"]) // m["gs"] - sub)
            ).astype(jnp.bfloat16)

        e0.wait()
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == tok - tok0)
        row = jnp.sum(jnp.where(rowsel, emb_b[:].astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)
        x_s[:] = row * jnp.float32(math.sqrt(D))

        def body(l, carry):
            slot_kv = jax.lax.rem(l, 2)

            x = x_s[:]
            h = (_rms(x, eps) * an_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)

            def qkv_tail(t):
                if t == head_trigger(0):
                    start_head(1, l)  # wo tiles ride under attention

            qkv = run_part(0, l, h, tail=qkv_tail)  # [1, Rq]

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

            # wait the layer's cache, insert the new K/V row, write it back
            kv_wait(l, slot_kv)
            p0 = pl.multiple_of((p // 16) * 16, 16)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == p - p0
            kwin = kb[slot_kv, pl.ds(p0, 16), :]
            vwin = vb[slot_kv, pl.ds(p0, 16), :]
            kb[slot_kv, pl.ds(p0, 16), :] = jnp.where(
                rsel, kbv.reshape(1, Hkv * dk), kwin)
            vb[slot_kv, pl.ds(p0, 16), :] = jnp.where(
                rsel, vbv.reshape(1, Hkv * dv), vwin)
            wk = pltpu.make_async_copy(
                kb.at[slot_kv, pl.ds(p0, 16), :],
                kc_out.at[l, pl.ds(p0, 16), :], wbsem.at[0])
            wv = pltpu.make_async_copy(
                vb.at[slot_kv, pl.ds(p0, 16), :],
                vc_out.at[l, pl.ds(p0, 16), :], wbsem.at[1])
            wk.start()
            wv.start()
            if not defer_wb:
                wk.wait()
                wv.wait()
            # defer_wb (LLMI_STREAM_DEFER_WB=1): the 16-row HBM writeback
            # flies under the FFN stream instead of blocking here. Its
            # wait moves to down_tail (just before kv_copies(l+1) — the
            # first point that could overwrite the kb/vb parity slot a
            # writeback still reads) + the post-loop epilogue for the
            # final layer.

            if no_attn:
                # PERF DIAGNOSTIC ONLY (LLMI_STREAM_NO_ATTN=1): skip the
                # serial attention chain, keep every DMA — the time delta
                # vs a normal run is the UNHIDDEN attention cost.
                attn_flat = jnp.zeros((1, H * dv), dtype=jnp.bfloat16)
            else:
                ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
                # causal + optional per-layer sliding window (real SWA; see
                # fused_decode.py / models/gemma.py _masked_scores)
                wl = win_r[l]
                valid = (ids <= p) & ((wl <= 0) | (ids > p - wl))
                outs = []
                for i in range(Hkv):
                    qi = qb[i * group : (i + 1) * group, :]
                    ki = kb[slot_kv][:, i * dk : (i + 1) * dk]
                    s = jax.lax.dot_general(
                        qi, ki,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if softcap > 0.0:
                        s = softcap * jnp.tanh(s / softcap)
                    s = jnp.where(valid, s, -jnp.inf)
                    mx = jnp.max(s, axis=1, keepdims=True)
                    pr = jnp.where(valid, jnp.exp(s - mx), 0.0)
                    denom = jnp.sum(pr, axis=1, keepdims=True)
                    vi = vb[slot_kv][:, i * dv : (i + 1) * dv]
                    pv = jax.lax.dot_general(
                        pr.astype(jnp.bfloat16), vi,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    outs.append(pv / denom)
                attn = outs[0] if Hkv == 1 else jnp.concatenate(outs, axis=0)
                attn_flat = attn.reshape(1, H * dv).astype(jnp.bfloat16)

            def wo_tail(t):
                if t == head_trigger(1):
                    start_head(2, l)

            y = run_part(1, l, attn_flat, tail=wo_tail)
            if has_pa:
                y = _rms(y, eps) * pan_r[pl.ds(l, 1), :]
            x2 = x + y
            h2 = (_rms(x2, eps) * fn_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)

            def gu_tail(t):
                if t == head_trigger(2):
                    start_head(3, l)

            gu = run_part(2, l, h2, tail=gu_tail)  # [1, 2F]
            g = gu[:, :F]
            u = gu[:, F:]
            c = jnp.float32(0.7978845608028654)
            a = 0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))) * u

            def down_tail(t):
                if t == 0:
                    if defer_wb:
                        # layer l-1's deferred writeback reads
                        # kb/vb[1 - slot_kv] — the slot kv_copies(l + 1)
                        # are about to overwrite. It has had a full layer
                        # of stream time; this wait is bookkeeping, not a
                        # stall.
                        @pl.when(l >= 1)
                        def _():
                            pltpu.make_async_copy(
                                kb.at[1 - slot_kv, pl.ds(p0, 16), :],
                                kc_out.at[l - 1, pl.ds(p0, 16), :],
                                wbsem.at[0]).wait()
                            pltpu.make_async_copy(
                                vb.at[1 - slot_kv, pl.ds(p0, 16), :],
                                vc_out.at[l - 1, pl.ds(p0, 16), :],
                                wbsem.at[1]).wait()

                    if not eager:
                        # old schedule: the cache DMA enqueues BEFORE
                        # down tiles >= 2, delaying them
                        @pl.when(l + 1 < L)
                        def _():
                            kv_start(l + 1, 1 - slot_kv)
                if t == head_trigger(3):
                    @pl.when(l + 1 < L)
                    def _():
                        start_head(0, l + 1)
                if eager and t == plans[3]["nt"] - 1:
                    # cache for layer l+1 queues AFTER every down tile and
                    # after the next qkv head: it streams under the next
                    # layer's qkv compute and is only awaited at its
                    # attention
                    @pl.when(l + 1 < L)
                    def _():
                        kv_start(l + 1, 1 - slot_kv)

            y3 = run_part(3, l, a.astype(jnp.bfloat16), tail=down_tail)
            if has_pf:
                y3 = _rms(y3, eps) * pfn_r[pl.ds(l, 1), :]
            x_s[:] = x2 + y3
            return carry

        jax.lax.fori_loop(0, L, body, 0)

        if defer_wb:
            # the final layer's writeback is the only one still unwaited
            # (down_tail(l) waited layer l-1's for l = 1..L-1)
            pe = pos_r[0]
            pe0 = pl.multiple_of((pe // 16) * 16, 16)
            sl = (L - 1) % 2
            pltpu.make_async_copy(
                kb.at[sl, pl.ds(pe0, 16), :],
                kc_out.at[L - 1, pl.ds(pe0, 16), :], wbsem.at[0]).wait()
            pltpu.make_async_copy(
                vb.at[sl, pl.ds(pe0, 16), :],
                vc_out.at[L - 1, pl.ds(pe0, 16), :], wbsem.at[1]).wait()

        h_s[:] = (_rms(x_s[:], eps) * on_r[:]).astype(jnp.bfloat16)

        if no_logits:
            # PERF DIAGNOSTIC ONLY (LLMI_STREAM_NO_LOGITS=1): skip the
            # tied-embedding tail (~2 GB/step at the 12B geometry) — the
            # delta vs a normal run is the tail's cost. The logits output
            # is left UNWRITTEN (garbage tokens; perf numbers only).
            return

        # tied-embedding logits: bf16 [TN, D] tiles, ldepth-deep stream
        # (LLMI_STREAM_LDEPTH; 2 = classic double buffer). The output
        # writeback stays its own 2-deep pipeline regardless of ldepth.
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

        for tt in range(min(ldepth - 1, nt_log)):
            for c in lcopies(tt, tt % ldepth):
                c.start()

        def lbody(t, carry):
            s_ = jax.lax.rem(t, ldepth)
            o_ = jax.lax.rem(t, 2)

            @pl.when(t + ldepth - 1 < nt_log)
            def _():
                for c in lcopies(t + ldepth - 1,
                                 jax.lax.rem(t + ldepth - 1, ldepth)):
                    c.start()

            for c in lcopies(t, s_):
                c.wait()

            @pl.when(t >= 2)
            def _():
                ocopy(t - 2, o_).wait()

            lo_b[o_] = jax.lax.dot_general(
                h_s[:], lw_b[s_],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ocopy(t, o_).start()
            return carry

        jax.lax.fori_loop(0, nt_log, lbody, 0)
        for t in range(max(0, nt_log - 2), nt_log):
            ocopy(t, t % 2).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("eps", "attn_scale", "softcap", "H", "Hkv", "dk", "dv",
                     "has_pa", "has_pf", "plan_key", "no_attn", "no_logits",
                     "ldepth", "defer_wb", "eager", "interpret"),
)
def _run_step(
    token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on, pan, pfn,
    wparts, emb, kc, vc,
    *, eps, attn_scale, softcap, H, Hkv, dk, dv, has_pa, has_pf,
    plan_key, no_attn=False, no_logits=False, ldepth=2, defer_wb=False,
    eager=True, interpret=False,
):
    # plan_key: hashable per-part meta (rebuilt into dicts here so the jit
    # cache keys on it; the array shapes alone don't capture gs/bg/packed)
    plans = [dict(kv) for kv in plan_key]
    L = wparts[0][0].shape[0]
    D = plans[0]["C"]
    Rq = plans[0]["R"]
    Adim = plans[1]["C"]
    F = plans[3]["C"]
    V = emb.shape[0]
    S = kc.shape[1]  # [L, S, Hkv*dk]
    TN = _pick_tn(V, D, _base_need(plans, D, Hkv, dk, dv, S), ldepth)
    if TN is None:
        raise ValueError("streamed megakernel: no logits tile fits VMEM")
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
    for m, parts in zip(plans, wparts):
        for x in parts:
            in_specs.append(anym)
            args.append(x)
        scratch.append(pltpu.VMEM((2, m["c_store"], m["TR"]), jnp.int8))
        scratch.append(pltpu.VMEM(
            (2, m["gp"], m["TR"]),
            jnp.float16 if m.get("raw16") else jnp.float32))
        if m["has_off"]:
            scratch.append(pltpu.VMEM((2, m["gp"], m["TR"]), jnp.float32))
        scratch.append(pltpu.VMEM((1, m["R"]), jnp.float32))  # output
        scratch.append(pltpu.VMEM((m["mp"], m["C"]), jnp.bfloat16))  # mask
    in_specs += [anym, anym, anym]
    args += [emb, kc, vc]
    kc_idx = len(args) - 2
    vc_idx = len(args) - 1

    kernel = _make_kernel(
        L=L, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, F=F, Rq=Rq, Adim=Adim, V=V,
        S=S, TN=TN, eps=eps, attn_scale=attn_scale, softcap=softcap,
        has_pa=has_pa, has_pf=has_pf, plans=plans, no_attn=no_attn,
        no_logits=no_logits, ldepth=ldepth, defer_wb=defer_wb, eager=eager,
    )
    scratch += [
        pltpu.VMEM((2, S, Hkv * dk), kc.dtype),
        pltpu.VMEM((2, S, Hkv * dv), vc.dtype),
        pltpu.VMEM((16, D), jnp.bfloat16),
        pltpu.VMEM((ldepth, TN, D), jnp.bfloat16),
        pltpu.VMEM((2, 1, TN), jnp.float32),
        pltpu.VMEM((1, D), jnp.float32),
        pltpu.VMEM((1, D), jnp.bfloat16),
    ]
    scratch += [pltpu.SemaphoreType.DMA((2, 3)) for _ in plans]
    scratch += [
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((ldepth,)),
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


def _freeze(plans):
    return tuple(tuple(sorted(m.items())) for m in plans)


def decode_step_megakernel_stream(hp, w, cache, token, pos, *, windows=None,
                                  interpret=False):
    """One single-token decode step of a capacity-class model as one
    streamed Pallas call over transposed group-scaled weights.
    ``windows``: per-layer sliding-window sizes [L] int32 (0 = none; see
    fused_decode.py). Returns (logits [vocab] f32 — softcap applied by
    the caller, new cache)."""
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
    plans = _plan(weights)
    if plans is None:
        raise ValueError("streamed megakernel: no tile plan for this geometry")
    wparts = tuple(
        ((wt.packedT if m["packed"] else wt.qT), wt.sT)
        + ((wt.offT,) if wt.offT is not None else ())
        for wt, m in zip(weights, plans)
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
        wparts,
        w.token_embd.w,
        # flat capacity caches (init_cache flat=True) arrive in the
        # kernel layout already — the per-step re-tiling reshape (and the
        # carry-aliasing break it caused) only happens for 4-D callers
        cache.k if cache.k.ndim == 3
        else cache.k.reshape(L, cache.k.shape[1], -1),
        cache.v if cache.v.ndim == 3
        else cache.v.reshape(L, cache.v.shape[1], -1),
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        H=hp.n_head, Hkv=hp.n_head_kv, dk=dk, dv=dv,
        has_pa=has_pa, has_pf=has_pf,
        plan_key=_freeze(plans),
        no_attn=os.environ.get("LLMI_STREAM_NO_ATTN", "0") == "1",
        no_logits=os.environ.get("LLMI_STREAM_NO_LOGITS", "0") == "1",
        ldepth=int(os.environ.get("LLMI_STREAM_LDEPTH", "2")),
        defer_wb=os.environ.get("LLMI_STREAM_DEFER_WB", "0") == "1",
        eager=os.environ.get("LLMI_STREAM_EAGER", "1") == "1",
        interpret=interpret,
    )
    return (logits[0], kc.reshape(cache.k.shape), vc.reshape(cache.v.shape))
