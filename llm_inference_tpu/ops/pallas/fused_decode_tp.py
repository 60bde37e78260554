"""Tensor-parallel whole-step decode megakernel: ONE Pallas call per chip
per step, with the cross-chip all-reduces INSIDE the kernel.

Round-2 review finding: all megakernels disabled under sharding, so TP
served through the per-op GSPMD path and paid the per-kernel launch gaps
the single-chip megakernel exists to remove. This kernel closes that gap:
``shard_map`` launches one copy per device, weights are pre-sharded
host-side (:func:`shard_rowq8_for_tp`), and the two partial-sum
boundaries the reference engine all-reduces at (reference
model.cpp:839-841 attention output, 905-912 FFN down) become in-kernel
broadcast all-reduces over inter-chip DMA — the [1, D] partials ride the
ICI while the NEXT layer's weight shard is already streaming from HBM,
so collective latency hides under the weight stream exactly like the
attention bubble does in the single-chip kernel (fused_decode.py).

Sharding layout (axis ``model``, n devices):
  - wqkv: LOCAL Q-head rows (H/n heads) + REPLICATED K/V rows — K/V and
    the KV cache are replicated (cheap: Hkv is small), which keeps
    attention fully local and the cache write identical on every chip.
  - wo: columns of the local heads' attention output -> partial [1, D],
    all-reduce #1.
  - gate_up: F/n rows per device (zero-padded to the 128-lane tile);
    w_down: the matching F/n columns -> partial [1, D], all-reduce #2.
  - token_embd: V/n rows per device; the embedding row is an entry
    all-reduce (only the owner contributes), and each device emits its
    own [1, V/n] logits shard (shard_map reassembles — no collective).

The in-kernel all-reduce is a broadcast-gather: every device remote-DMAs
its partial into row ``my_id`` of the peers' gather buffer and sums the
n rows after n-1 receive waits. For [1, D] f32 partials a ring would be
latency-bound; the broadcast costs one hop. Two alternating gather slots
make consecutive all-reduces safe without a barrier (a device can be at
most one collective ahead, never two).

Validated end-to-end on the virtual CPU mesh via the Pallas TPU
interpreter's multi-device shared memory + DMA simulation (race
detection on) against the single-chip megakernel: tests/test_fused_decode_tp.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from .fused_decode import (
    LANE,
    _LOGITS_TILE,
    _VMEM_LIMIT,
    _mixed_dot,
    _rms,
    _rope_rows,
    _rope_tables,
)


def _pad_rows(a: np.ndarray, rows: int) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    pad = np.zeros((rows - a.shape[0],) + a.shape[1:], dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def tp_megakernel_supported(hp, w, n: int) -> bool:
    """Eligibility: single-chip megakernel eligibility (rowq8 stacked
    layers etc.) + clean head/vocab splits for an n-way shard."""
    from .fused_decode import megakernel_supported

    if n < 2:
        return False
    if not megakernel_supported(hp, w):
        return False
    H, Hkv = hp.n_head, hp.n_head_kv
    if H % n:
        return False
    group = H // Hkv
    Hl = H // n
    if Hl % group and group % Hl:
        return False  # local heads must tile whole KV groups (or fit one)
    dv = hp.n_embd_head_v
    if (Hl * dv) % LANE:
        return False
    V = w.token_embd.rows
    Vl = V // n
    if V % n or Vl % LANE:
        return False
    F = w.layers.w_down.cols
    if F % n:
        return False
    return True


def shard_rowq8_for_tp(hp, w, n: int):
    """Host-side repack of stacked rowq8 weights into per-device blocks
    with a leading [n] axis (shard_map splits it with P('model')).

    Returns (packed dict of jnp arrays, static geometry dict)."""
    lw = w.layers
    L = lw.wqkv.q.shape[0]
    D = hp.embedding_length
    H, Hkv = hp.n_head, hp.n_head_kv
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    Hl = H // n
    F = lw.w_down.cols
    Fl = F // n
    Flp = -(-Fl // LANE) * LANE  # zero-padded to the lane tile
    V = w.token_embd.rows
    Vl = V // n

    qkv_q = np.asarray(lw.wqkv.q)           # [L, Rq, D]
    qkv_s = np.asarray(lw.wqkv.scale).reshape(L, -1)  # [L, Rq]
    wo_q = np.asarray(lw.wo.q)               # [L, D, A]
    wo_s = np.asarray(lw.wo.scale).reshape(L, -1)     # [L, D]
    gu_q = np.asarray(lw.w_gate_up.q)         # [L, 2F, D]
    gu_s = np.asarray(lw.w_gate_up.scale).reshape(L, -1)
    wd_q = np.asarray(lw.w_down.q)            # [L, D, F]
    wd_s = np.asarray(lw.w_down.scale).reshape(L, -1)
    emb_q = np.asarray(w.token_embd.q)        # [V, D]
    emb_s = np.asarray(w.token_embd.scale).reshape(-1)  # [V]

    kv_rows_q = qkv_q[:, H * dk :, :]         # replicated K+V rows
    kv_rows_s = qkv_s[:, H * dk :]

    wqkv_tp, wqkv_s_tp = [], []
    wo_tp, gu_tp, gu_s_tp, wd_tp = [], [], [], []
    for i in range(n):
        qrows = slice(i * Hl * dk, (i + 1) * Hl * dk)
        wqkv_tp.append(np.concatenate([qkv_q[:, qrows, :], kv_rows_q], axis=1))
        wqkv_s_tp.append(np.concatenate([qkv_s[:, qrows], kv_rows_s], axis=1))
        acols = slice(i * Hl * dv, (i + 1) * Hl * dv)
        wo_tp.append(wo_q[:, :, acols])
        frows = slice(i * Fl, (i + 1) * Fl)
        g = np.stack([_pad_rows(gu_q[l, frows.start : frows.stop], Flp)
                      for l in range(L)])
        u = np.stack([_pad_rows(gu_q[l, F + frows.start : F + frows.stop], Flp)
                      for l in range(L)])
        gu_tp.append(np.concatenate([g, u], axis=1))  # [L, 2*Flp, D]
        gs = np.stack([np.pad(gu_s[l, frows], (0, Flp - Fl)) for l in range(L)])
        us = np.stack([np.pad(gu_s[l, F + frows.start : F + frows.stop],
                              (0, Flp - Fl)) for l in range(L)])
        gu_s_tp.append(np.concatenate([gs, us], axis=1))
        wd_cols = wd_q[:, :, frows]
        if Flp != Fl:
            wd_cols = np.concatenate(
                [wd_cols, np.zeros((L, D, Flp - Fl), dtype=wd_cols.dtype)],
                axis=2)
        wd_tp.append(wd_cols)

    packed = dict(
        wqkv_q=jnp.asarray(np.stack(wqkv_tp)),
        wqkv_s=jnp.asarray(np.stack(wqkv_s_tp))[:, :, None, :],
        wo_q=jnp.asarray(np.stack(wo_tp)),
        wo_s=jnp.broadcast_to(jnp.asarray(wo_s)[None, :, None, :],
                              (n, L, 1, D)),
        gu_q=jnp.asarray(np.stack(gu_tp)),
        gu_s=jnp.asarray(np.stack(gu_s_tp))[:, :, None, :],
        wd_q=jnp.asarray(np.stack(wd_tp)),
        wd_s=jnp.broadcast_to(jnp.asarray(wd_s)[None, :, None, :],
                              (n, L, 1, D)),
        emb_q=jnp.asarray(emb_q.reshape(n, Vl, D)),
        emb_s=jnp.asarray(emb_s.reshape(n, 1, Vl)),
    )
    geom = dict(n=n, L=L, D=D, H=H, Hkv=Hkv, dk=dk, dv=dv, Hl=Hl,
                F=F, Fl=Fl, Flp=Flp, V=V, Vl=Vl)
    return packed, geom


def _make_tp_kernel(*, n, L, Hl, H, Hkv, dk, dv, D, Flp, Vl, S, TN,
                    eps, attn_scale, softcap, has_pa, has_pf):
    group = H // Hkv  # GLOBAL GQA group size
    nt = Vl // TN
    Rql = Hl * dk + Hkv * (dk + dv)
    n_wdma = 10

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
        (wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s,
         emb_q, emb_s, kc, vc) = [nxt() for _ in range(12)]
        logits_out, kc_out, vc_out = nxt(), nxt(), nxt()
        (wqkv_b, wqkv_sb, wo_b, wo_sb, gu_b, gu_sb, wd_b, wd_sb,
         kb, vb, emb_b, emb_sb, lw_b, lw_sb, lo_b, x_s, h_s) = [nxt() for _ in range(17)]
        gbuf, ssem, rsem = nxt(), nxt(), nxt()
        wsem, wbsem, lsem, osem, esem = [nxt() for _ in range(5)]

        my = jax.lax.axis_index("model")
        tok = token_r[0]
        p = pos_r[0]

        def all_reduce(val, slot):
            """[1, D] f32 partial -> full sum on every device. Broadcast-
            gather over inter-chip DMA; `slot` must alternate between
            consecutive calls (double-buffered gather rows)."""
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
                r.wait()  # n-1 sends done AND n-1 peer rows arrived
            return jnp.sum(gbuf[slot], axis=0, keepdims=True)

        def layer_copies(l, b):
            cs = [
                pltpu.make_async_copy(wqkv_q.at[0, l], wqkv_b.at[b], wsem.at[b, 0]),
                pltpu.make_async_copy(wqkv_s.at[0, l], wqkv_sb.at[b], wsem.at[b, 1]),
                pltpu.make_async_copy(wo_q.at[0, l], wo_b.at[b], wsem.at[b, 2]),
                pltpu.make_async_copy(wo_s.at[0, l], wo_sb.at[b], wsem.at[b, 3]),
                pltpu.make_async_copy(gu_q.at[0, l], gu_b.at[b], wsem.at[b, 4]),
                pltpu.make_async_copy(gu_s.at[0, l], gu_sb.at[b], wsem.at[b, 5]),
                pltpu.make_async_copy(wd_q.at[0, l], wd_b.at[b], wsem.at[b, 6]),
                pltpu.make_async_copy(wd_s.at[0, l], wd_sb.at[b], wsem.at[b, 7]),
                pltpu.make_async_copy(kc.at[l], kb.at[b], wsem.at[b, 8]),
                pltpu.make_async_copy(vc.at[l], vb.at[b], wsem.at[b, 9]),
            ]
            return cs

        # embedding row: this device owns vocab rows [my*Vl, (my+1)*Vl);
        # non-owners DMA a harmless in-range window and contribute zeros,
        # the entry all-reduce (#slot 0) assembles the true row everywhere
        tl = tok - my * Vl
        owner = (tl >= 0) & (tl < Vl)
        tls = jnp.clip(tl, 0, Vl - 1)
        tok0 = pl.multiple_of((tls // 32) * 32, 32)
        tokl = pl.multiple_of((tls // 128) * 128, 128)
        e0 = pltpu.make_async_copy(emb_q.at[0, pl.ds(tok0, 32)], emb_b, esem.at[0])
        e1 = pltpu.make_async_copy(emb_s.at[0, :, pl.ds(tokl, 128)], emb_sb, esem.at[1])
        e0.start()
        e1.start()
        for c in layer_copies(0, 0):
            c.start()
        e0.wait()
        e1.wait()
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) == tls - tok0)
        row = jnp.sum(jnp.where(rowsel, emb_b[:].astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)
        lanesel = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == tls - tokl)
        scale = jnp.sum(jnp.where(lanesel, emb_sb[:], 0.0))
        contrib = jnp.where(owner, row * scale * jnp.float32(math.sqrt(D)), 0.0)
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
            qkv = _mixed_dot(h, wqkv_b[b]) * wqkv_sb[b]  # [1, Rql]

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
            if Hl >= group:
                # whole KV groups live on this device
                for i in range(Hl // group):
                    kv = my * (Hl // group) + i  # global kv head (dynamic)
                    qi = qb[i * group : (i + 1) * group, :]
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
                    outs.append(pv / denom)
            else:
                # all local heads share ONE kv head: kv = my*Hl // group
                kv = (my * Hl) // group
                koff = pl.multiple_of(kv * dk, dk)
                voff = pl.multiple_of(kv * dv, dv)
                ki = kb[b, :, pl.ds(koff, dk)]
                s = jax.lax.dot_general(
                    qb, ki, dimension_numbers=(((1,), (1,)), ((), ())),
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
                outs.append(pv / denom)
            attn = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
            attn_flat = attn.reshape(1, Hl * dv).astype(jnp.bfloat16)

            y = _mixed_dot(attn_flat, wo_b[b]) * wo_sb[b]  # PARTIAL [1, D]
            y = all_reduce(y, jax.lax.rem(1 + 2 * l, 2))
            if has_pa:
                y = _rms(y, eps) * pan_r[pl.ds(l, 1), :]
            x2 = x + y
            h2 = (_rms(x2, eps) * fn_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            gu = _mixed_dot(h2, gu_b[b]) * gu_sb[b]  # [1, 2*Flp]
            g = gu[:, :Flp]
            u = gu[:, Flp:]
            c = jnp.float32(0.7978845608028654)
            a = 0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))) * u
            y3 = jax.lax.dot_general(
                a.astype(jnp.bfloat16), wd_b[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * wd_sb[b]  # PARTIAL [1, D]
            y3 = all_reduce(y3, jax.lax.rem(2 * l, 2))
            if has_pf:
                y3 = _rms(y3, eps) * pfn_r[pl.ds(l, 1), :]
            x_s[:] = x2 + y3
            return carry

        jax.lax.fori_loop(0, L, body, 0)

        h_s[:] = (_rms(x_s[:], eps) * on_r[:]).astype(jnp.bfloat16)

        # local logits shard, tiled + double-buffered like the single-chip
        # kernel; shard_map reassembles the [1, V] row — no collective
        def lcopies(t, s_):
            off = pl.multiple_of(t * TN, 128)
            return [
                pltpu.make_async_copy(emb_q.at[0, pl.ds(off, TN)], lw_b.at[s_],
                                      lsem.at[s_, 0]),
                pltpu.make_async_copy(emb_s.at[0, :, pl.ds(off, TN)],
                                      lw_sb.at[s_], lsem.at[s_, 1]),
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


def _run_step_tp(
    packed, geom, token, pos, base_idx, windows, cos, sin,
    an, fn_, qn, kn, on, pan, pfn, kc, vc, S,
    *, eps, attn_scale, softcap, has_pa, has_pf, mesh, interpret=False,
):
    n = geom["n"]
    L, D = geom["L"], geom["D"]
    Hl, H, Hkv = geom["Hl"], geom["H"], geom["Hkv"]
    dk, dv = geom["dk"], geom["dv"]
    Flp, Vl = geom["Flp"], geom["Vl"]
    Rql = Hl * dk + Hkv * (dk + dv)
    TN = Vl if Vl <= _LOGITS_TILE else _LOGITS_TILE
    if Vl % TN:
        raise ValueError(f"vocab shard {Vl} % logits tile {TN}")

    kernel = _make_tp_kernel(
        n=n, L=L, Hl=Hl, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, Flp=Flp, Vl=Vl,
        S=S, TN=TN, eps=eps, attn_scale=attn_scale, softcap=softcap,
        has_pa=has_pa, has_pf=has_pf,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [smem, smem, smem, smem, vmem, vmem, vmem, vmem, vmem, vmem,
                vmem]
    if has_pa:
        in_specs.append(vmem)
    if has_pf:
        in_specs.append(vmem)
    in_specs += [anym] * 12

    def local_call(token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn,
                   on, pan_, pfn_, wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s,
                   wd_q, wd_s, emb_q, emb_s, kc, vc):
        args = [token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on]
        if has_pa:
            args.append(pan_)
        if has_pf:
            args.append(pfn_)
        args += [wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s,
                 emb_q, emb_s, kc, vc]
        kc_idx = len(args) - 2
        vc_idx = len(args) - 1
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
            scratch_shapes=[
                pltpu.VMEM((2, Rql, D), jnp.int8),
                pltpu.VMEM((2, 1, Rql), jnp.float32),
                pltpu.VMEM((2, D, Hl * dv), jnp.int8),
                pltpu.VMEM((2, 1, D), jnp.float32),
                pltpu.VMEM((2, 2 * Flp, D), jnp.int8),
                pltpu.VMEM((2, 1, 2 * Flp), jnp.float32),
                pltpu.VMEM((2, D, Flp), jnp.int8),
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
                pltpu.VMEM((2, n, D), jnp.float32),   # all-reduce gather
                pltpu.SemaphoreType.DMA((2, n)),       # AR send
                pltpu.SemaphoreType.DMA((2, n)),       # AR recv
                pltpu.SemaphoreType.DMA((2, 10)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True,
                collective_id=1,
            ),
            interpret=interp,
        )(*args)

    rep = P()  # replicated
    shardspec = P("model")
    f = jax.shard_map(
        local_call, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, rep, rep, rep, rep,
                  rep, rep, rep,
                  shardspec, shardspec, shardspec, shardspec, shardspec,
                  shardspec, shardspec, shardspec, shardspec, shardspec,
                  rep, rep),
        out_specs=(P(None, "model"), rep, rep),
        check_vma=False,
    )
    return f(token, pos, base_idx, windows, cos, sin, an, fn_, qn, kn, on,
             pan, pfn,
             packed["wqkv_q"], packed["wqkv_s"], packed["wo_q"],
             packed["wo_s"], packed["gu_q"], packed["gu_s"],
             packed["wd_q"], packed["wd_s"], packed["emb_q"],
             packed["emb_s"], kc, vc)


def decode_step_megakernel_tp(hp, packed, geom, w, cache, token, pos, *,
                              mesh, windows=None, interpret=False):
    """One TP single-token decode step: one Pallas call per device with
    in-kernel all-reduces. ``packed``/``geom`` from shard_rowq8_for_tp;
    ``w`` supplies the (replicated) norms. ``windows``: per-layer
    sliding-window sizes [L] int32 (0 = none; see fused_decode.py).
    Returns (logits [vocab] f32, new cache arrays) — softcap applied by
    the caller."""
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

    logits, kc, vc = _run_step_tp(
        packed, geom,
        jnp.asarray(token, dtype=jnp.int32).reshape(1),
        jnp.asarray(pos, dtype=jnp.int32).reshape(1),
        base_idx, windows, cos, sin,
        lw.attn_norm.astype(f32), lw.ffn_norm.astype(f32),
        lw.q_norm.astype(f32), lw.k_norm.astype(f32),
        w.output_norm.astype(f32)[None, :],
        # shard_map needs arrays, not None: unused dummies when absent
        lw.post_attn_norm.astype(f32) if has_pa else jnp.zeros((1, 1), f32),
        lw.post_ffw_norm.astype(f32) if has_pf else jnp.zeros((1, 1), f32),
        cache.k.reshape(L, S, -1), cache.v.reshape(L, S, -1), S,
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        has_pa=has_pa, has_pf=has_pf, mesh=mesh, interpret=interpret,
    )
    return (logits.reshape(-1), kc.reshape(cache.k.shape),
            vc.reshape(cache.v.shape))
