"""Batched whole-step decode megakernel: B concurrent lanes, one call.

The batched serving step (models/gemma.py forward_batched_decode) is one
XLA GEMM per weight plus the ragged flash-decode kernel — already
weight-optimal in bytes, but a ~200-kernel program whose device-side
launch gaps leave the HBM pipe idle between ops (round-2 measurement:
~8.8 ms/step at batch 32 vs the 1.22 ms weight-stream floor). This
kernel runs the ENTIRE batched decode step as one Pallas call, reusing
fused_decode.py's hand-rolled pipeline: layer l+1's weights and all B
lanes' KV caches DMA into the alternate VMEM buffer set while layer l
computes.

Differences from the single-stream kernel (fused_decode.py):

  - activations are [B, D]; every projection is ONE mixed bf16xint8 MXU
    dot with the batch riding the M-slot (the weight stream is read once
    per step regardless of B — the whole point of batching);
  - the per-layer cache copy is the batched [B, S, Hkv*dk] slab, double-
    buffered by layer parity like the weights;
  - rope tables, KV row insert/writeback, and masked-softmax attention
    are per-lane (pos differs per request) — unrolled over the static B;
  - parked lanes (serving slots with no live request) pass pos >= S; the
    wrapper clamps them to row 0. The clamped row write is garbage but
    harmless: a re-admitted slot's prefill overwrites rows [0, plen),
    row 0 included. Clamping low (not to S-1) also keeps parked lanes
    out of the cache-DMA prefix bound below.
  - cache DMA is PREFIX-BOUNDED: each slab copy is split into 4 row
    chunks and only ceil((max(pos)+16)/chunk) of them move per layer
    (scalar-prefetched bound). At batch 32 x 1k the full slab is
    ~870 MB/step against ~1 GB of weights, so early-fill steps roughly
    halve their HBM traffic. Un-copied VMEM tail chunks hold garbage;
    the causal mask -inf's them out of QK, and the PV dot accumulates
    per chunk behind a scalar select so even NaN bit patterns there
    cannot reach live lanes.
  - logits are [B, V], tiled over the tied embedding exactly as the
    single-stream tail.

Same rowq8 numerics as fused_decode.py (exact int8-in-bf16 mixed dots,
per-row f32 scales). Reference counterpart of the computation chain:
model.cpp:706-1049 (one request; the reference cannot batch).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_decode import (
    LANE,
    _BUFFER_BUDGET,
    _LOGITS_TILE,
    _VMEM_LIMIT,
    _mixed_dot,
    _rms,
    _rope_rows,
    _rope_tables,
    _rowq8,
    _sizes,
)


def _kv_slots(hp, *, batch, max_seq, layer_bytes, tn, D, F, Rq) -> int:
    """2 = cache slabs double-buffered by layer parity (copies ride the
    weight prefetch); 1 = single slab, next layer's copy issued right
    after attention so it hides under the FFN weight stream (halves the
    cache VMEM — what lets batch-32 / 4k-context configs in); 0 = no fit."""
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    fixed = 2 * layer_bytes
    fixed += 2 * tn * D + 2 * 1 * tn * 4  # logits weight tiles + scales
    fixed += 2 * batch * tn * 4  # lo_b: double-buffered [B, TN] f32 out
    fixed += 2 * (Rq + 2 * D + 2 * F) * 4  # per-part f32 row-scale slots
    fixed += batch * (32 * D + 128 * 4 + 6 * D)  # emb windows + x/h bufs
    kv_one = batch * max_seq * hp.n_head_kv * (dk + dv) * 2
    for slots in (2, 1):
        if fixed + slots * kv_one <= _BUFFER_BUDGET:
            return slots
    return 0


def megakernel_batch_supported(hp, w, *, batch, max_seq) -> bool:
    """Eligibility: the single-stream whole-layer contract PLUS the
    [B, S, Hkv*(dk+dv)] bf16 cache slabs (double- or single-buffered,
    _kv_slots) in VMEM."""
    from ...models.weights import LayerWeights

    lw = w.layers
    if not isinstance(lw, LayerWeights):
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
    if max_seq % 16:
        return False
    layer_bytes = Rq * D + D * Adim + 2 * F * D + D * F
    tn = V if V <= _LOGITS_TILE else _LOGITS_TILE
    return _kv_slots(hp, batch=batch, max_seq=max_seq,
                     layer_bytes=layer_bytes, tn=tn, D=D, F=F, Rq=Rq) > 0


def _make_kernel(*, B, L, H, Hkv, dk, dv, D, F, Rq, Adim, V, S, TN,
                 eps, attn_scale, softcap, has_pa, has_pf, kv_slots,
                 greedy):
    group = H // Hkv
    nt = V // TN

    def kernel(*refs):
        idx = 0

        def nxt():
            nonlocal idx
            r = refs[idx]
            idx += 1
            return r

        token_r, pos_r, nch_r, base_idx_r = nxt(), nxt(), nxt(), nxt()
        cos_r, sin_r = nxt(), nxt()
        an_r, fn_r, qn_r, kn_r, on_r = nxt(), nxt(), nxt(), nxt(), nxt()
        pan_r = nxt() if has_pa else None
        pfn_r = nxt() if has_pf else None
        (wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s,
         emb_q, emb_s, kc, vc) = [nxt() for _ in range(12)]
        logits_out, kc_out, vc_out = nxt(), nxt(), nxt()
        (wqkv_b, wqkv_sb, wo_b, wo_sb, gu_b, gu_sb, wd_b, wd_sb,
         kb, vb, emb_b, emb_sb, lw_b, lw_sb, lo_b, x_s, h_s) = [nxt() for _ in range(17)]
        best_v, best_i = (nxt(), nxt()) if greedy else (None, None)
        wsem, kvsem, wbsem, lsem, osem, esem = [nxt() for _ in range(6)]

        def layer_copies(l, b):
            return [
                pltpu.make_async_copy(wqkv_q.at[l], wqkv_b.at[b], wsem.at[b, 0]),
                pltpu.make_async_copy(wqkv_s.at[l], wqkv_sb.at[b], wsem.at[b, 1]),
                pltpu.make_async_copy(wo_q.at[l], wo_b.at[b], wsem.at[b, 2]),
                pltpu.make_async_copy(wo_s.at[l], wo_sb.at[b], wsem.at[b, 3]),
                pltpu.make_async_copy(gu_q.at[l], gu_b.at[b], wsem.at[b, 4]),
                pltpu.make_async_copy(gu_s.at[l], gu_sb.at[b], wsem.at[b, 5]),
                pltpu.make_async_copy(wd_q.at[l], wd_b.at[b], wsem.at[b, 6]),
                pltpu.make_async_copy(wd_s.at[l], wd_sb.at[b], wsem.at[b, 7]),
            ]

        # Prefix-bounded cache DMA: the slab copy is split into NKV
        # fixed-size row chunks and only the first nch (covering
        # max(pos)+16 rows, computed by the wrapper) are moved. At
        # batch 32 the full [B, S, H] slab rivals the weight stream in
        # bytes, so skipping the unfilled tail is a first-order win.
        # Chunks >= nch leave VMEM garbage; attention guards every read
        # of that region (causal mask for QK, scalar-predicated select
        # for PV), so arbitrary bits -- NaN included -- cannot leak in.
        NKV = 4 if S % 64 == 0 else 1
        KVC = S // NKV

        def kv_chunks(l, s_):
            out = []
            for c in range(NKV):
                sl = pl.ds(c * KVC, KVC)
                out.append((c, [
                    pltpu.make_async_copy(kc.at[l, :, sl, :],
                                          kb.at[s_, :, sl, :],
                                          kvsem.at[s_, 0]),
                    pltpu.make_async_copy(vc.at[l, :, sl, :],
                                          vb.at[s_, :, sl, :],
                                          kvsem.at[s_, 1]),
                ]))
            return out

        def kv_start(l, s_):
            for c, copies in kv_chunks(l, s_):
                if c == 0:
                    for cp in copies:
                        cp.start()
                else:
                    @pl.when(c < nch_r[0])
                    def _(copies=copies):
                        for cp in copies:
                            cp.start()

        def kv_wait(l, s_):
            for c, copies in kv_chunks(l, s_):
                if c == 0:
                    for cp in copies:
                        cp.wait()
                else:
                    @pl.when(c < nch_r[0])
                    def _(copies=copies):
                        for cp in copies:
                            cp.wait()

        # B embedding row windows (int8 HBM is (32, 128)-tiled) + the
        # lane-major scale windows, one DMA pair per lane
        ecopies = []
        for bi_ in range(B):
            tok = token_r[bi_]
            tok0 = pl.multiple_of((tok // 32) * 32, 32)
            tokl = pl.multiple_of((tok // 128) * 128, 128)
            ecopies.append((
                pltpu.make_async_copy(
                    emb_q.at[pl.ds(tok0, 32)], emb_b.at[bi_], esem.at[bi_, 0]),
                pltpu.make_async_copy(
                    emb_s.at[:, pl.ds(tokl, 128)], emb_sb.at[bi_],
                    esem.at[bi_, 1]),
            ))
        for e0, e1 in ecopies:
            e0.start()
            e1.start()
        for c in layer_copies(0, 0):
            c.start()
        kv_start(0, 0)
        for bi_ in range(B):
            e0, e1 = ecopies[bi_]
            e0.wait()
            e1.wait()
            tok = token_r[bi_]
            tok0 = pl.multiple_of((tok // 32) * 32, 32)
            tokl = pl.multiple_of((tok // 128) * 128, 128)
            rowsel = (jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) == tok - tok0)
            row = jnp.sum(jnp.where(rowsel, emb_b[bi_].astype(jnp.float32), 0.0),
                          axis=0, keepdims=True)
            lanesel = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == tok - tokl)
            scale = jnp.sum(jnp.where(lanesel, emb_sb[bi_], 0.0))
            x_s[pl.ds(bi_, 1), :] = row * scale * jnp.float32(math.sqrt(D))

        def body(l, carry):
            b = jax.lax.rem(l, 2)
            skv = b if kv_slots == 2 else 0

            @pl.when(l + 1 < L)
            def _():
                for c in layer_copies(l + 1, 1 - b):
                    c.start()
                if kv_slots == 2:
                    # cache copies ride the weight prefetch (parity slots)
                    kv_start(l + 1, 1 - b)

            for c in layer_copies(l, b):
                c.wait()

            x = x_s[:]  # [B, D] f32
            h = (_rms(x, eps) * an_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            qkv = _mixed_dot(h, wqkv_b[b]) * wqkv_sb[b]  # [B, Rq]

            # single-slab mode: layer l's cache copy was issued after the
            # PREVIOUS layer's attention (prologue for l=0) — wait here,
            # as late as the lane loop allows
            kv_wait(l, skv)

            bi = base_idx_r[l]
            attn_rows = []
            for bl in range(B):
                p = pos_r[bl]
                q = qkv[bl : bl + 1, : H * dk].reshape(H, dk)
                k = qkv[bl : bl + 1, H * dk : H * dk + Hkv * dk].reshape(Hkv, dk)
                v = qkv[bl : bl + 1, H * dk + Hkv * dk :].reshape(Hkv, dv)
                q = _rms(q, eps) * qn_r[pl.ds(l, 1), :]
                k = _rms(k, eps) * kn_r[pl.ds(l, 1), :]
                cos = cos_r[pl.ds(bl * cos_r.shape[0] // B + bi, 1), :]
                sin = sin_r[pl.ds(bl * sin_r.shape[0] // B + bi, 1), :]
                q = _rope_rows(q, cos, sin) * jnp.float32(attn_scale)
                k = _rope_rows(k, cos, sin)
                kbv = k.astype(jnp.bfloat16)
                vbv = v.astype(jnp.bfloat16)
                qb = q.astype(jnp.bfloat16)

                # insert the lane's new K/V row into its VMEM cache slab,
                # then DMA the aligned 16-row window back to HBM
                p0 = pl.multiple_of((p // 16) * 16, 16)
                rsel = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == p - p0
                kwin = kb[skv, bl, pl.ds(p0, 16), :]
                vwin = vb[skv, bl, pl.ds(p0, 16), :]
                kb[skv, bl, pl.ds(p0, 16), :] = jnp.where(
                    rsel, kbv.reshape(1, Hkv * dk), kwin)
                vb[skv, bl, pl.ds(p0, 16), :] = jnp.where(
                    rsel, vbv.reshape(1, Hkv * dv), vwin)
                wk = pltpu.make_async_copy(
                    kb.at[skv, bl, pl.ds(p0, 16), :],
                    kc_out.at[l, bl, pl.ds(p0, 16), :], wbsem.at[0])
                wv = pltpu.make_async_copy(
                    vb.at[skv, bl, pl.ds(p0, 16), :],
                    vc_out.at[l, bl, pl.ds(p0, 16), :], wbsem.at[1])
                wk.start()
                wv.start()
                wk.wait()
                wv.wait()

                ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
                valid = ids <= p
                outs = []
                for i in range(Hkv):
                    qi = qb[i * group : (i + 1) * group, :]
                    ki = kb[skv, bl][:, i * dk : (i + 1) * dk]
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
                    vi = vb[skv, bl][:, i * dv : (i + 1) * dv]
                    if NKV == 1:
                        pv = jax.lax.dot_general(
                            pr.astype(jnp.bfloat16), vi,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        # PV per cache chunk, scalar-predicated: chunks
                        # >= nch hold un-DMA'd garbage whose NaNs would
                        # survive pr == 0 through the dot; select drops
                        # them bitwise instead
                        pv = jnp.zeros((group, dv), dtype=jnp.float32)
                        for cci in range(NKV):
                            pvc = jax.lax.dot_general(
                                pr[:, cci * KVC : (cci + 1) * KVC].astype(
                                    jnp.bfloat16),
                                vi[cci * KVC : (cci + 1) * KVC, :],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            pv = pv + jnp.where(cci < nch_r[0], pvc, 0.0)
                    outs.append(pv / denom)
                attn = outs[0] if Hkv == 1 else jnp.concatenate(outs, axis=0)
                attn_rows.append(attn.reshape(1, H * dv))
            attn_flat = (attn_rows[0] if B == 1
                         else jnp.concatenate(attn_rows, axis=0))
            attn_flat = attn_flat.astype(jnp.bfloat16)  # [B, H*dv]

            if kv_slots == 1:
                # attention (and the row writebacks) are done with the
                # slab; the next layer's cache copy hides under the FFN
                # weight stream
                @pl.when(l + 1 < L)
                def _():
                    kv_start(l + 1, 0)

            y = _mixed_dot(attn_flat, wo_b[b]) * wo_sb[b]
            if has_pa:
                y = _rms(y, eps) * pan_r[pl.ds(l, 1), :]
            x2 = x + y
            h2 = (_rms(x2, eps) * fn_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            gu = _mixed_dot(h2, gu_b[b]) * gu_sb[b]  # [B, 2F]
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

        if greedy:
            # greedy argmax IN KERNEL: no [B, V] logits round-trip. The
            # final softcap is monotone, so argmax commutes with it; ties
            # resolve to the lowest id (jnp.argmax semantics).
            best_v[:] = jnp.full((B, 1), -jnp.inf, dtype=jnp.float32)
            best_i[:] = jnp.zeros((B, 1), dtype=jnp.int32)

            def lbody(t, carry):
                s_ = jax.lax.rem(t, 2)

                @pl.when(t + 1 < nt)
                def _():
                    for c in lcopies(t + 1, 1 - s_):
                        c.start()

                for c in lcopies(t, s_):
                    c.wait()

                vals = _mixed_dot(h_s[:], lw_b[s_]) * lw_sb[s_]  # [B, TN]
                m = jnp.max(vals, axis=1, keepdims=True)
                ii = jax.lax.broadcasted_iota(jnp.int32, (B, TN), 1) + t * TN
                idx = jnp.min(jnp.where(vals == m, ii, V),
                              axis=1, keepdims=True)
                upd = m > best_v[:]
                best_i[:] = jnp.where(upd, idx, best_i[:])
                best_v[:] = jnp.where(upd, m, best_v[:])
                return carry

            jax.lax.fori_loop(0, nt, lbody, 0)
            logits_out[:] = best_i[:]
        else:
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
                     "has_pa", "has_pf", "greedy", "interpret"),
)
def _run_step(
    tokens, pos, nch, base_idx, cos, sin, an, fn_, qn, kn, on, pan, pfn,
    wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s, emb_q, emb_s, kc, vc,
    *, eps, attn_scale, softcap, H, Hkv, dk, dv, has_pa, has_pf,
    greedy=False, interpret=False,
):
    B = tokens.shape[0]
    L, Rq, D = wqkv_q.shape
    F = wd_q.shape[2]
    Adim = wo_q.shape[2]
    V = emb_q.shape[0]
    S = kc.shape[2]  # kc is the flat [L, B, S, Hkv*dk] view
    TN = V if V <= _LOGITS_TILE else _LOGITS_TILE
    if S % 16:
        raise ValueError(f"megakernel needs max_seq % 16 == 0, got {S}")
    if V % 32 or TN % LANE:
        raise ValueError(f"megakernel needs vocab % 32 == 0, got {V}")

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [smem, smem, smem, smem,
                vmem, vmem, vmem, vmem, vmem, vmem, vmem]
    args = [tokens, pos, nch, base_idx, cos, sin, an, fn_, qn, kn, on]
    if has_pa:
        in_specs.append(vmem)
        args.append(pan)
    if has_pf:
        in_specs.append(vmem)
        args.append(pfn)
    in_specs += [anym] * 12
    args += [wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s,
             emb_q, emb_s, kc, vc]
    kc_idx = len(args) - 2
    vc_idx = len(args) - 1

    layer_bytes = Rq * D + D * Adim + 2 * F * D + D * F
    kv_slots = _kv_slots(
        type("hp", (), dict(n_embd_head_k=dk, n_embd_head_v=dv,
                            n_head_kv=Hkv))(),
        batch=B, max_seq=S, layer_bytes=layer_bytes, tn=TN, D=D, F=F, Rq=Rq)
    if kv_slots == 0:
        raise ValueError("batched megakernel: cache slabs don't fit VMEM")
    kernel = _make_kernel(
        B=B, L=L, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, F=F, Rq=Rq, Adim=Adim,
        V=V, S=S, TN=TN, eps=eps, attn_scale=attn_scale, softcap=softcap,
        has_pa=has_pa, has_pf=has_pf, kv_slots=kv_slots, greedy=greedy,
    )
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(vmem if greedy else anym, anym, anym),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1) if greedy else (B, V),
                                 jnp.int32 if greedy else jnp.float32),
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
            pltpu.VMEM((kv_slots, B, S, Hkv * dk), kc.dtype),
            pltpu.VMEM((kv_slots, B, S, Hkv * dv), vc.dtype),
            pltpu.VMEM((B, 32, D), jnp.int8),
            pltpu.VMEM((B, 1, 128), jnp.float32),
            pltpu.VMEM((2, TN, D), jnp.int8),
            pltpu.VMEM((2, 1, TN), jnp.float32),
            pltpu.VMEM((2, B, TN), jnp.float32),
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((B, D), jnp.bfloat16),
        ] + ([
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ] if greedy else []) + [
            pltpu.SemaphoreType.DMA((2, 8)),
            pltpu.SemaphoreType.DMA((kv_slots, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((B, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (Rq * D + D * Adim + 3 * D * F) + 2 * B * V * D,
            bytes_accessed=L * (Rq * D + D * Adim + 3 * D * F) + V * D
            + 2 * L * B * S * Hkv * dk,
            transcendentals=B * L * (F + H * S),
        ),
        interpret=interpret,
    )(*args)


def decode_step_megakernel_batch(hp, w, cache, tokens, pos, *,
                                 greedy=False, interpret=False):
    """One batched decode step as one Pallas call. ``w.layers`` must be
    the stacked LayerWeights (rowq8); ``cache`` the stacked BATCHED KV
    cache ([L, B, S, Hkv, d]). ``pos`` may hold >= S for parked lanes
    (clamped; see module docstring).

    Returns (out, new k, new v): ``out`` is the [B, vocab] f32 logits
    (softcap applied by the caller) — or, with ``greedy=True``, the [B]
    int32 argmax tokens computed IN KERNEL, skipping the [B, vocab] HBM
    round-trip entirely (the final softcap is monotone, so greedy
    streams are unchanged)."""
    lw = w.layers
    L = lw.wqkv.q.shape[0]
    B = tokens.shape[0]
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    half = dk // 2
    S = cache.k.shape[2]

    pos = jnp.asarray(pos, dtype=jnp.int32)
    # parked lanes (pos >= S) clamp to row 0: a re-admitted slot's
    # prefill always rewrites row 0, and row 0 is inside the first
    # cache-DMA chunk so parked lanes never inflate the prefix bound
    # or read un-copied garbage
    pos = jnp.where(pos >= S, 0, pos)
    # cache-DMA prefix bound: chunks of S/4 rows (S % 64 == 0) covering
    # max(pos) + 16 rows — the aligned insert window reads 16 rows
    # around each lane's cursor
    nkv = 4 if S % 64 == 0 else 1
    kvc = S // nkv
    nch = jnp.clip((jnp.max(pos) + 16 + kvc - 1) // kvc, 1, nkv)
    nch = nch.astype(jnp.int32).reshape(1)
    # per-lane rope rows, flattened [B * n_bases, half] (kernel indexes
    # row bl * n_bases + base_idx[l])
    base_idx, cos, sin = _rope_tables(hp, L, pos)

    f32 = jnp.float32
    has_pa = lw.post_attn_norm is not None
    has_pf = lw.post_ffw_norm is not None
    out, kc, vc = _run_step(
        jnp.asarray(tokens, dtype=jnp.int32),
        pos, nch,
        base_idx, cos, sin,
        lw.attn_norm.astype(f32), lw.ffn_norm.astype(f32),
        lw.q_norm.astype(f32), lw.k_norm.astype(f32),
        w.output_norm.astype(f32)[None, :],
        lw.post_attn_norm.astype(f32) if has_pa else None,
        lw.post_ffw_norm.astype(f32) if has_pf else None,
        lw.wqkv.q, lw.wqkv.scale.reshape(L, 1, -1),
        lw.wo.q, lw.wo.scale.reshape(L, 1, -1),
        lw.w_gate_up.q, lw.w_gate_up.scale.reshape(L, 1, -1),
        lw.w_down.q, lw.w_down.scale.reshape(L, 1, -1),
        w.token_embd.q, w.token_embd.scale.reshape(1, -1),
        cache.k.reshape(L, B, S, -1),
        cache.v.reshape(L, B, S, -1),
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        H=hp.n_head, Hkv=hp.n_head_kv, dk=dk, dv=dv,
        has_pa=has_pa, has_pf=has_pf, greedy=greedy, interpret=interpret,
    )
    if greedy:
        out = out.reshape(B)
    return out, kc.reshape(cache.k.shape), vc.reshape(cache.v.shape)
