"""Tensor-parallel LOSSLESS whole-step decode megakernel: the masked-dot
transposed layout (fused_decode_q.py) sharded over a ``model`` mesh axis
with the in-kernel all-reduces of fused_decode_tp.py.

This is the BASELINE north-star combination (27B-class serve-q4 x TP):
round 3 served maskdot TP through the per-op GSPMD path, paying ~200
kernel-launch gaps per step. Here every device runs ONE Pallas call per
step over its weight shard and the two partial-sum boundaries the
reference engine all-reduces at (reference model.cpp:839-841 attention
output, 905-912 FFN down) ride inter-chip DMA inside the kernel.

Sharding layout (axis ``model``, n devices) — chosen so every slice cuts
WHOLE contraction blocks, preserving the sign-hi scale folding
(quant/device.py TQ4Tensor):

  - wqkv  (transposed [D, Rq]): OUTPUT-lane shard — local Q-head lanes
    (H/n heads) + replicated K/V lanes. No collective: each device owns
    its heads end-to-end.
  - wo    ([Adim, D]): CONTRACTION-row shard — the local heads' rows,
    whole blocks (Hl*dv % BC == 0) -> partial [1, D], all-reduce #1.
  - gate_up ([D, 2F]): output-lane shard, gate and up slices re-paired
    locally ([1, 2*Fl]).
  - w_down ([F, D]): contraction-row shard (Fl % BC == 0) -> partial
    [1, D], all-reduce #2.
  - token_embd (dense bf16 [V, D]): V/n rows; entry row via owner-gather
    + all-reduce, exit logits as a local [1, V/n] shard (shard_map
    reassembles — no collective).

Validated against the single-chip masked-dot kernel on the virtual mesh
via the Pallas TPU interpreter's multi-device DMA simulation (race
detection on): tests/test_fused_decode_q_tp.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ...quant.device import TQ4Tensor, TQuantTensor
from .fused_decode import _LOGITS_TILE, _VMEM_LIMIT, _rms, _rope_rows, _rope_tables
from .fused_decode_q import _qdot, megakernel_q_supported

LANE = 128


def _parts(wt):
    """(qT-or-packedT, sT, offT?) of a transposed quant tensor."""
    q = wt.packedT if isinstance(wt, TQ4Tensor) else wt.qT
    return q, wt.sT, wt.offT


def tp_megakernel_q_supported(hp, w, n: int) -> bool:
    """Eligibility: single-chip masked-dot eligibility + clean whole-block
    splits for an n-way shard (see module docstring)."""
    if n < 2:
        return False
    if not megakernel_q_supported(hp, w):
        return False
    lw = w.layers
    if not isinstance(lw.wqkv, (TQuantTensor, TQ4Tensor)):
        return False  # needs the load-time maskdot repack, not raw planar
    H, Hkv = hp.n_head, hp.n_head_kv
    if H % n:
        return False
    Hl = H // n
    group = H // Hkv
    if Hl % group and group % Hl:
        return False  # local heads must tile whole KV groups (or fit one)
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    if (Hl * dk) % LANE or (Hl * dv) % LANE:
        return False
    # wo contraction slice must cut whole blocks
    bc_wo = lw.wo.bg * lw.wo.group_size
    if (Hl * dv) % bc_wo:
        return False
    F = lw.w_down.cols
    if F % n:
        return False
    Fl = F // n
    if Fl % LANE:
        return False
    bc_wd = lw.w_down.bg * lw.w_down.group_size
    if Fl % bc_wd:
        return False
    V = w.token_embd.rows
    if V % n:
        return False
    Vl = V // n
    if Vl % 16 or Vl % LANE:
        return False
    if Vl > _LOGITS_TILE and Vl % _LOGITS_TILE:
        return False
    return True


def _slice_lanes(wt, lanes: slice):
    """Output-feature (lane) slice of a transposed quant tensor's arrays:
    [L, C(/2), R] -> [L, C(/2), len]; scales/offsets share the lane dim."""
    q, s, o = _parts(wt)
    return (np.asarray(q)[..., lanes], np.asarray(s)[..., lanes],
            None if o is None else np.asarray(o)[..., lanes])


def _slice_blocks(wt, c0: int, c1: int):
    """Contraction slice [c0, c1) cutting WHOLE blocks: q rows (nibble
    pairs stay intact — packing is block-paired), scale/offset block rows."""
    bc = wt.bg * wt.group_size
    assert c0 % bc == 0 and c1 % bc == 0
    q, s, o = _parts(wt)
    packed = isinstance(wt, TQ4Tensor)
    div = 2 if packed else 1
    qs = np.asarray(q)[:, c0 // div : c1 // div, :]
    b0, b1 = c0 // bc, c1 // bc
    ss = np.asarray(s)[:, b0 * wt.mp : b1 * wt.mp, :]
    os_ = None if o is None else np.asarray(o)[:, b0 * wt.mp : b1 * wt.mp, :]
    return qs, ss, os_


def shard_maskdot_for_tp(hp, w, n: int):
    """Host-side shard of stacked maskdot weights into per-device blocks
    with a leading [n] axis (shard_map splits it with P('model')).
    Returns (packed dict, static geom dict)."""
    lw = w.layers
    D = hp.embedding_length
    H, Hkv = hp.n_head, hp.n_head_kv
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    Hl = H // n
    F = lw.w_down.cols
    Fl = F // n
    V = w.token_embd.rows
    Vl = V // n
    L = lw.wqkv.sT.shape[0]

    def stack(parts_per_dev):
        qs = jnp.asarray(np.stack([p[0] for p in parts_per_dev]))
        ss = jnp.asarray(np.stack([p[1] for p in parts_per_dev]))
        os_ = (None if parts_per_dev[0][2] is None
               else jnp.asarray(np.stack([p[2] for p in parts_per_dev])))
        return qs, ss, os_

    qkv_parts, wo_parts, gu_parts, wd_parts = [], [], [], []
    q_all, s_all, o_all = _parts(lw.wqkv)
    q_all, s_all = np.asarray(q_all), np.asarray(s_all)
    o_all = None if o_all is None else np.asarray(o_all)
    kv_lanes = slice(H * dk, None)
    for i in range(n):
        qlanes = slice(i * Hl * dk, (i + 1) * Hl * dk)
        qkv_parts.append(tuple(
            None if a is None else np.concatenate(
                [a[..., qlanes], a[..., kv_lanes]], axis=-1)
            for a in (q_all, s_all, o_all)))
        wo_parts.append(_slice_blocks(lw.wo, i * Hl * dv, (i + 1) * Hl * dv))
        gq, gs_, go = _slice_lanes(lw.w_gate_up, slice(i * Fl, (i + 1) * Fl))
        uq, us, uo = _slice_lanes(
            lw.w_gate_up, slice(F + i * Fl, F + (i + 1) * Fl))
        gu_parts.append((
            np.concatenate([gq, uq], axis=-1),
            np.concatenate([gs_, us], axis=-1),
            None if go is None else np.concatenate([go, uo], axis=-1),
        ))
        wd_parts.append(_slice_blocks(lw.w_down, i * Fl, (i + 1) * Fl))

    emb = np.asarray(w.token_embd.w)  # dense bf16 [V, D]

    parts4 = [stack(qkv_parts), stack(wo_parts), stack(gu_parts),
              stack(wd_parts)]
    packed = dict(emb=jnp.asarray(emb.reshape(n, Vl, D)))
    for name, (qs, ss, os_) in zip(("qkv", "wo", "gu", "wd"), parts4):
        packed[f"{name}_q"] = qs
        packed[f"{name}_s"] = ss
        if os_ is not None:
            packed[f"{name}_o"] = os_

    weights = [lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down]
    # per-part LOCAL geometry: lane shards keep the global cols; block
    # shards keep (bg, BC, mp) and scale nblk down (whole-block slices)
    geoms = []
    for wt, local_cols in zip(weights, (D, Hl * dv, D, Fl)):
        bc = wt.bg * wt.group_size
        geoms.append((wt.bg, bc, local_cols // bc, wt.mp))
    geom = dict(
        n=n, L=L, D=D, H=H, Hkv=Hkv, dk=dk, dv=dv, Hl=Hl, F=F, Fl=Fl,
        V=V, Vl=Vl,
        geoms=tuple(geoms),
        gss=tuple(wt.group_size for wt in weights),
        has_off=tuple(wt.offT is not None for wt in weights),
        packed=tuple(isinstance(wt, TQ4Tensor) for wt in weights),
        centered=tuple(getattr(wt, "centered", False) for wt in weights),
    )
    return packed, geom


def _make_tp_kernel_q(*, n, L, Hl, H, Hkv, dk, dv, D, Fl, Vl, S, TN,
                      eps, attn_scale, softcap, has_pa, has_pf,
                      geoms, gss, has_off, packed, centered):
    group = H // Hkv  # GLOBAL GQA group size
    nt = Vl // TN
    n_w = 8 + sum(has_off)
    n_wdma = n_w + 2

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
        win = []
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
        gbuf, ssem, rsem = nxt(), nxt(), nxt()
        wsem, wbsem, lsem, osem, esem = [nxt() for _ in range(5)]

        my = jax.lax.axis_index("model")
        tok = token_r[0]
        p = pos_r[0]

        def all_reduce(val, slot):
            """[1, D] f32 partial -> full sum on every device (broadcast-
            gather over inter-chip DMA; alternate `slot` between calls)."""
            gbuf[slot, my] = val[0]
            rdmas = []
            for s in range(1, n):
                dst = jax.lax.rem(my + s, n)
                r = pltpu.make_async_remote_copy(
                    src_ref=gbuf.at[slot, my], dst_ref=gbuf.at[slot, my],
                    send_sem=ssem.at[slot, s], recv_sem=rsem.at[slot, s],
                    device_id=dst,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                r.start()
                rdmas.append(r)
            for r in rdmas:
                r.wait()
            return jnp.sum(gbuf[slot], axis=0, keepdims=True)

        def layer_copies(l, b):
            cs = []
            si = 0
            for (qh, sh, oh), (qb_, sb_, ob_) in zip(win, wbufs):
                cs.append(pltpu.make_async_copy(qh.at[0, l], qb_.at[b],
                                                wsem.at[b, si]))
                si += 1
                cs.append(pltpu.make_async_copy(sh.at[0, l], sb_.at[b],
                                                wsem.at[b, si]))
                si += 1
                if oh is not None:
                    cs.append(pltpu.make_async_copy(oh.at[0, l], ob_.at[b],
                                                    wsem.at[b, si]))
                    si += 1
            cs.append(pltpu.make_async_copy(kc.at[l], kb.at[b], wsem.at[b, si]))
            cs.append(pltpu.make_async_copy(vc.at[l], vb.at[b],
                                            wsem.at[b, si + 1]))
            return cs

        # embedding row: this device owns vocab rows [my*Vl, (my+1)*Vl);
        # non-owners DMA an in-range window and contribute zeros; the
        # entry all-reduce (slot 0) assembles the true row everywhere
        tl = tok - my * Vl
        owner = (tl >= 0) & (tl < Vl)
        tls = jnp.clip(tl, 0, Vl - 1)
        tok0 = pl.multiple_of((tls // 16) * 16, 16)
        e0 = pltpu.make_async_copy(emb_r.at[0, pl.ds(tok0, 16)], emb_b,
                                   esem.at[0])
        e0.start()
        for c in layer_copies(0, 0):
            c.start()
        e0.wait()
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == tls - tok0)
        row = jnp.sum(jnp.where(rowsel, emb_b[:].astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)
        contrib = jnp.where(owner, row * jnp.float32(math.sqrt(D)), 0.0)
        x_s[:] = all_reduce(contrib, 0)

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
                        centered=centered[0])  # [1, Rql] local

            q = qkv[:, : Hl * dk].reshape(Hl, dk)
            k = qkv[:, Hl * dk : Hl * dk + Hkv * dk].reshape(Hkv, dk)
            v = qkv[:, Hl * dk + Hkv * dk :].reshape(Hkv, dv)
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

            # identical replicated K/V row write on every device
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

            def attend(qi, kv):
                koff = pl.multiple_of(kv * dk, dk)
                voff = pl.multiple_of(kv * dv, dv)
                ki = kb[b, :, pl.ds(koff, dk)]
                s = jax.lax.dot_general(
                    qi, ki, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if softcap > 0.0:
                    s = softcap * jnp.tanh(s / softcap)
                s = jnp.where(valid, s, -jnp.inf)
                m = jnp.max(s, axis=1, keepdims=True)
                pr = jnp.where(valid, jnp.exp(s - m), 0.0)
                denom = jnp.sum(pr, axis=1, keepdims=True)
                vi = vb[b, :, pl.ds(voff, dv)]
                pv = jax.lax.dot_general(
                    pr.astype(jnp.bfloat16), vi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return pv / denom

            if Hl >= group:
                for i in range(Hl // group):
                    kv = my * (Hl // group) + i
                    outs.append(attend(qb[i * group : (i + 1) * group, :], kv))
            else:
                outs.append(attend(qb, (my * Hl) // group))
            attn = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
            attn_flat = attn.reshape(1, Hl * dv).astype(jnp.bfloat16)

            y = _qdot(wbufs[1][0], wbufs[1][1], wbufs[1][2], b, attn_flat,
                      gs=gss[1], geom=geoms[1], packed=packed[1],
                      centered=centered[1])  # PARTIAL [1, D]
            y = all_reduce(y, jax.lax.rem(1 + 2 * l, 2))
            if has_pa:
                y = _rms(y, eps) * pan_r[pl.ds(l, 1), :]
            x2 = x + y
            h2 = (_rms(x2, eps) * fn_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            gu = _qdot(wbufs[2][0], wbufs[2][1], wbufs[2][2], b, h2,
                       gs=gss[2], geom=geoms[2], packed=packed[2],
                       centered=centered[2])  # [1, 2*Fl]
            g = gu[:, :Fl]
            u = gu[:, Fl:]
            c = jnp.float32(0.7978845608028654)
            a = 0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))) * u
            y3 = _qdot(wbufs[3][0], wbufs[3][1], wbufs[3][2], b,
                       a.astype(jnp.bfloat16), gs=gss[3], geom=geoms[3],
                       packed=packed[3], centered=centered[3])  # PARTIAL
            y3 = all_reduce(y3, jax.lax.rem(2 * l, 2))
            if has_pf:
                y3 = _rms(y3, eps) * pfn_r[pl.ds(l, 1), :]
            x_s[:] = x2 + y3
            return carry

        jax.lax.fori_loop(0, L, body, 0)

        h_s[:] = (_rms(x_s[:], eps) * on_r[:]).astype(jnp.bfloat16)

        # local logits shard, tiled + double-buffered; shard_map
        # reassembles the [1, V] row — no collective
        def lcopies(t, s_):
            off = pl.multiple_of(t * TN, 16)
            return [pltpu.make_async_copy(emb_r.at[0, pl.ds(off, TN)],
                                          lw_b.at[s_], lsem.at[s_])]

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


def _run_step_tp_q(
    packed, geom, token, pos, base_idx, windows, cos, sin,
    an, fn_, qn, kn, on, pan, pfn, kc, vc, S,
    *, eps, attn_scale, softcap, has_pa, has_pf, mesh, interpret=False,
):
    n = geom["n"]
    L, D = geom["L"], geom["D"]
    Hl, H, Hkv = geom["Hl"], geom["H"], geom["Hkv"]
    dk, dv = geom["dk"], geom["dv"]
    Fl, Vl = geom["Fl"], geom["Vl"]
    geoms, gss = geom["geoms"], geom["gss"]
    has_off, pk, centered = geom["has_off"], geom["packed"], geom["centered"]
    TN = Vl if Vl <= _LOGITS_TILE else _LOGITS_TILE
    if Vl % TN:
        raise ValueError(f"vocab shard {Vl} % logits tile {TN}")

    kernel, n_wdma = _make_tp_kernel_q(
        n=n, L=L, Hl=Hl, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, Fl=Fl, Vl=Vl,
        S=S, TN=TN, eps=eps, attn_scale=attn_scale, softcap=softcap,
        has_pa=has_pa, has_pf=has_pf, geoms=geoms, gss=gss,
        has_off=has_off, packed=pk, centered=centered,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    names4 = ("qkv", "wo", "gu", "wd")
    wkeys = []
    for i, name in enumerate(names4):
        wkeys.append(f"{name}_q")
        wkeys.append(f"{name}_s")
        if has_off[i]:
            wkeys.append(f"{name}_o")
    wkeys.append("emb")

    in_specs = [smem, smem, smem, smem, vmem, vmem, vmem, vmem, vmem, vmem,
                vmem]
    if has_pa:
        in_specs.append(vmem)
    if has_pf:
        in_specs.append(vmem)
    in_specs += [anym] * (len(wkeys) + 2)

    def local_call(token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn,
                   on, pan_, pfn_, *rest):
        args = [token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on]
        if has_pa:
            args.append(pan_)
        if has_pf:
            args.append(pfn_)
        args += list(rest)  # weight parts + emb + kc + vc
        kc_idx = len(args) - 2
        vc_idx = len(args) - 1
        scratch = []
        ri = 0
        for i in range(4):
            qa = rest[ri]
            sa = rest[ri + 1]
            ri += 2
            scratch.append(pltpu.VMEM((2,) + qa.shape[2:], jnp.int8))
            scratch.append(pltpu.VMEM((2,) + sa.shape[2:], jnp.float32))
            if has_off[i]:
                scratch.append(pltpu.VMEM((2,) + rest[ri].shape[2:],
                                          jnp.float32))
                ri += 1
        scratch += [
            pltpu.VMEM((2, S, Hkv * dk), kc.dtype),
            pltpu.VMEM((2, S, Hkv * dv), vc.dtype),
            pltpu.VMEM((16, D), jnp.bfloat16),
            pltpu.VMEM((2, TN, D), jnp.bfloat16),
            pltpu.VMEM((2, 1, TN), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.bfloat16),
            pltpu.VMEM((2, n, D), jnp.float32),   # all-reduce gather
            pltpu.SemaphoreType.DMA((2, n)),       # AR send
            pltpu.SemaphoreType.DMA((2, n)),       # AR recv
            pltpu.SemaphoreType.DMA((2, n_wdma)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
        ]
        interp = (pltpu.InterpretParams() if interpret else False)
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=(anym, anym, anym),
            out_shape=(
                jax.ShapeDtypeStruct((1, Vl), jnp.float32),
                jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            ),
            input_output_aliases={kc_idx: 1, vc_idx: 2},
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True,
                collective_id=1,
            ),
            interpret=interp,
        )(*args)

    rep = P()
    shardspec = P("model")
    f = jax.shard_map(
        local_call, mesh=mesh,
        in_specs=(rep,) * 13 + (shardspec,) * len(wkeys) + (rep, rep),
        out_specs=(P(None, "model"), rep, rep),
        check_vma=False,
    )
    return f(token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on,
             pan, pfn, *[packed[k] for k in wkeys], kc, vc)


def decode_step_megakernel_q_tp(hp, packed, geom, w, cache, token, pos, *,
                                mesh, windows=None, interpret=False):
    """One TP lossless single-token decode step: one Pallas call per
    device over maskdot weight shards with in-kernel all-reduces.
    ``packed``/``geom`` from shard_maskdot_for_tp; ``w`` supplies the
    (replicated) norms. ``windows``: per-layer sliding-window sizes [L]
    int32 (0 = none; see fused_decode.py). Returns (logits [vocab] f32,
    new cache arrays) — softcap applied by the caller."""
    lw = w.layers
    L = geom["L"]
    base_idx, cos, sin = _rope_tables(hp, L, pos)
    windows = (jnp.zeros((L,), dtype=jnp.int32) if windows is None
               else jnp.asarray(windows, dtype=jnp.int32))
    f32 = jnp.float32
    has_pa = lw.post_attn_norm is not None
    has_pf = lw.post_ffw_norm is not None
    S = cache.k.shape[1]
    if S % 16:
        raise ValueError(f"megakernel needs max_seq % 16 == 0, got {S}")

    logits, kc, vc = _run_step_tp_q(
        packed, geom,
        jnp.asarray(token, dtype=jnp.int32).reshape(1),
        jnp.asarray(pos, dtype=jnp.int32).reshape(1),
        base_idx, windows, cos, sin,
        lw.attn_norm.astype(f32), lw.ffn_norm.astype(f32),
        lw.q_norm.astype(f32), lw.k_norm.astype(f32),
        w.output_norm.astype(f32)[None, :],
        lw.post_attn_norm.astype(f32) if has_pa else jnp.zeros((1, 1), f32),
        lw.post_ffw_norm.astype(f32) if has_pf else jnp.zeros((1, 1), f32),
        cache.k.reshape(L, S, -1), cache.v.reshape(L, S, -1), S,
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        has_pa=has_pa, has_pf=has_pf, mesh=mesh, interpret=interpret,
    )
    return (logits.reshape(-1), kc.reshape(cache.k.shape),
            vc.reshape(cache.v.shape))
