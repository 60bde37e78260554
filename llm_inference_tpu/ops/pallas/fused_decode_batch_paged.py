"""PAGED batched whole-step decode megakernel: B lanes over a shared
page pool, one Pallas call per step.

Round-4 roofline: the per-op paged batched step (models/gemma.py
forward_batched_decode_paged) ran at 40.9% of its HBM speed-of-light
with 77.9% of device time unattributed — page-table gather fusions,
kv_insert glue, and ~200 per-op launch gaps on exactly the long-context
configuration paging exists for. This kernel runs the ENTIRE paged
batched step as one Pallas call, reusing fused_decode_batch.py's weight
pipeline, and replaces the dense [L, B, S, H] cache slabs with per-lane
page gathers out of the shared pool:

  - the pool is the stacked [L, n_pages+1, PAGE, Hkv*d] paged KV store
    (serving.py's per-layer pools, +1 trash row — see below). It stays
    in HBM; each lane's live pages DMA into a per-lane [S, H] VMEM
    buffer, double-buffered by LANE parity (lane bl+1's pages stream
    while lane bl's attention computes);
  - the page-table ([B, NB] int32 pool rows) and the per-lane block
    bound nblk[b] = pos[b]//PAGE + 1 are scalar-prefetched; the DMA
    fori_loops run to each lane's own bound — a PER-LANE prefix bound,
    strictly tighter than the dense batched kernel's global max(pos)
    chunk bound (a single deep lane no longer inflates every lane's
    cache traffic);
  - the new K/V row inserts into the lane buffer (aligned 16-row
    window), and the same window DMAs back to pool row table[b, p//PAGE]
    at the in-page offset — the paged analogue of the dense kernel's
    aliased row writeback;
  - parked lanes (pos >= NB*PAGE) clamp to pos 0 and their table row 0
    is the pool's TRASH ROW (index n_pages — serving allocates pools
    with one extra page and the host table already uses n_pages as its
    "unmapped" sentinel), so their garbage row writes land in dedicated
    scratch instead of a page another request owns;
  - the lane buffers are zero-filled ONCE per step, so VMEM beyond a
    lane's DMA'd pages holds zeros (or finite stale pool rows), never
    uninitialized NaN bit patterns — attention needs only the causal
    mask, no per-chunk predication (contrast fused_decode_batch.py's
    scalar-predicated PV chunks).

Weights, embedding gather, logits tiling and the in-kernel greedy
argmax are identical to fused_decode_batch.py (rowq8 numerics).
Reference counterpart of the computation chain: model.cpp:706-1049
(one request, one growing cache — model.cpp:461-474 — the design the
shared pool replaces).
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


def _paged_fit(hp, *, batch, nb, page, layer_bytes, tn, D, F, Rq) -> bool:
    """VMEM budget: double-buffered whole-layer weights + logits tiles +
    the TWO per-lane [S, H] cache buffers (lane-parity double buffer)."""
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    fixed = 2 * layer_bytes
    fixed += 2 * tn * D + 2 * 1 * tn * 4  # logits weight tiles + scales
    fixed += 2 * batch * tn * 4  # lo_b: double-buffered [B, TN] f32 out
    fixed += 2 * (Rq + 2 * D + 2 * F) * 4  # per-part f32 row-scale slots
    fixed += batch * (32 * D + 128 * 4 + 6 * D)  # emb windows + x/h bufs
    S = nb * page
    kv = 2 * S * hp.n_head_kv * (dk + dv) * 2  # two lane-parity buffers
    return fixed + kv <= _BUFFER_BUDGET


def megakernel_batch_paged_supported(hp, w, *, batch, nb, page) -> bool:
    """Eligibility: the batched whole-layer weight contract (see
    fused_decode_batch.megakernel_batch_supported) PLUS a page size the
    16-row writeback window tiles (page % 16) and per-lane [nb*page, H]
    buffers that fit the lane-parity VMEM double buffer."""
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
    if page % 16 or nb < 1:
        return False
    layer_bytes = Rq * D + D * Adim + 2 * F * D + D * F
    tn = V if V <= _LOGITS_TILE else _LOGITS_TILE
    return _paged_fit(hp, batch=batch, nb=nb, page=page,
                      layer_bytes=layer_bytes, tn=tn, D=D, F=F, Rq=Rq)


def _make_kernel(*, B, L, H, Hkv, dk, dv, D, F, Rq, Adim, V, NB, PAGE, TN,
                 eps, attn_scale, softcap, has_pa, has_pf, greedy):
    group = H // Hkv
    nt = V // TN
    S = NB * PAGE
    HK = Hkv * dk
    HV = Hkv * dv

    def kernel(*refs):
        idx = 0

        def nxt():
            nonlocal idx
            r = refs[idx]
            idx += 1
            return r

        token_r, pos_r, nblk_r, tbl_r, base_idx_r = (
            nxt(), nxt(), nxt(), nxt(), nxt())
        cos_r, sin_r = nxt(), nxt()
        an_r, fn_r, qn_r, kn_r, on_r = nxt(), nxt(), nxt(), nxt(), nxt()
        pan_r = nxt() if has_pa else None
        pfn_r = nxt() if has_pf else None
        (wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s,
         emb_q, emb_s, kc, vc) = [nxt() for _ in range(12)]
        logits_out, kc_out, vc_out = nxt(), nxt(), nxt()
        (wqkv_b, wqkv_sb, wo_b, wo_sb, gu_b, gu_sb, wd_b, wd_sb,
         kb2, vb2, emb_b, emb_sb, lw_b, lw_sb, lo_b, x_s, h_s) = [nxt() for _ in range(17)]
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

        def page_copies(l, bl, s_, j):
            """Lane bl's j-th page for layer l into lane-slot s_."""
            trow = tbl_r[bl, j]
            off = pl.multiple_of(j * PAGE, PAGE)
            return [
                pltpu.make_async_copy(kc.at[l, trow],
                                      kb2.at[s_, pl.ds(off, PAGE), :],
                                      kvsem.at[s_, 0]),
                pltpu.make_async_copy(vc.at[l, trow],
                                      vb2.at[s_, pl.ds(off, PAGE), :],
                                      kvsem.at[s_, 1]),
            ]

        def pages_start(l, bl, s_):
            def body(j, carry):
                for cp in page_copies(l, bl, s_, j):
                    cp.start()
                return carry

            jax.lax.fori_loop(0, nblk_r[bl], body, 0)

        def pages_wait(l, bl, s_):
            def body(j, carry):
                for cp in page_copies(l, bl, s_, j):
                    cp.wait()
                return carry

            jax.lax.fori_loop(0, nblk_r[bl], body, 0)

        # B embedding row windows + scale windows (identical to the dense
        # batched kernel)
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
        # zero the lane buffers ONCE: pages never DMA'd this step leave
        # zeros (finite), so attention needs only the causal mask — no
        # NaN bit patterns can reach the PV dot (module docstring)
        kb2[:] = jnp.zeros((2, S, HK), dtype=kb2.dtype)
        vb2[:] = jnp.zeros((2, S, HV), dtype=vb2.dtype)
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

            @pl.when(l + 1 < L)
            def _():
                for c in layer_copies(l + 1, 1 - b):
                    c.start()

            # this layer's first two lanes' pages start BEFORE the weight
            # wait (they depend only on the prefetched table; the previous
            # layer's lane loop is done with both slots), so their latency
            # hides under the weight stream
            pages_start(l, 0, 0)
            if B > 1:
                pages_start(l, 1, 1)

            for c in layer_copies(l, b):
                c.wait()

            x = x_s[:]  # [B, D] f32
            h = (_rms(x, eps) * an_r[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            qkv = _mixed_dot(h, wqkv_b[b]) * wqkv_sb[b]  # [B, Rq]

            bi = base_idx_r[l]
            attn_rows = []
            for bl in range(B):
                s_ = bl % 2
                pages_wait(l, bl, s_)

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

                # insert the lane's new K/V row into its VMEM buffer at
                # the logical position, then DMA the aligned 16-row
                # window back to the POOL page that owns it
                p0 = pl.multiple_of((p // 16) * 16, 16)
                blk = p // PAGE
                op0 = pl.multiple_of(p0 - blk * PAGE, 16)
                trow = tbl_r[bl, blk]
                rsel = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == p - p0
                kwin = kb2[s_, pl.ds(p0, 16), :]
                vwin = vb2[s_, pl.ds(p0, 16), :]
                kb2[s_, pl.ds(p0, 16), :] = jnp.where(
                    rsel, kbv.reshape(1, HK), kwin)
                vb2[s_, pl.ds(p0, 16), :] = jnp.where(
                    rsel, vbv.reshape(1, HV), vwin)
                wk = pltpu.make_async_copy(
                    kb2.at[s_, pl.ds(p0, 16), :],
                    kc_out.at[l, trow, pl.ds(op0, 16), :], wbsem.at[0])
                wv = pltpu.make_async_copy(
                    vb2.at[s_, pl.ds(p0, 16), :],
                    vc_out.at[l, trow, pl.ds(op0, 16), :], wbsem.at[1])
                wk.start()
                wv.start()
                wk.wait()
                wv.wait()

                ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
                valid = ids <= p
                outs = []
                for i in range(Hkv):
                    qi = qb[i * group : (i + 1) * group, :]
                    ki = kb2[s_][:, i * dk : (i + 1) * dk]
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
                    vi = vb2[s_][:, i * dv : (i + 1) * dv]
                    # single full-S PV dot: masked slots contribute
                    # pr == 0 exactly, and the lane buffer holds no
                    # non-finite bits (zero-filled prologue)
                    pv = jax.lax.dot_general(
                        pr.astype(jnp.bfloat16), vi,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    outs.append(pv / denom)
                attn = outs[0] if Hkv == 1 else jnp.concatenate(outs, axis=0)
                attn_rows.append(attn.reshape(1, H * dv))
                # depth-2 lane prefetch: this lane's slot is free now
                if bl + 2 < B:
                    pages_start(l, bl + 2, s_)
            attn_flat = (attn_rows[0] if B == 1
                         else jnp.concatenate(attn_rows, axis=0))
            attn_flat = attn_flat.astype(jnp.bfloat16)  # [B, H*dv]

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
            # greedy argmax IN KERNEL (fused_decode_batch.py tail): the
            # final softcap is monotone, ties resolve to the lowest id
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
    tokens, pos, nblk, table, base_idx, cos, sin,
    an, fn_, qn, kn, on, pan, pfn,
    wqkv_q, wqkv_s, wo_q, wo_s, gu_q, gu_s, wd_q, wd_s, emb_q, emb_s, kc, vc,
    *, eps, attn_scale, softcap, H, Hkv, dk, dv, has_pa, has_pf,
    greedy=False, interpret=False,
):
    B = tokens.shape[0]
    L, Rq, D = wqkv_q.shape
    F = wd_q.shape[2]
    Adim = wo_q.shape[2]
    V = emb_q.shape[0]
    P1, PAGE = kc.shape[1], kc.shape[2]  # kc: [L, n_pages+1, PAGE, Hkv*dk]
    NB = table.shape[1]
    TN = V if V <= _LOGITS_TILE else _LOGITS_TILE
    if PAGE % 16:
        raise ValueError(f"paged megakernel needs page % 16 == 0, got {PAGE}")
    if V % 32 or TN % LANE:
        raise ValueError(f"megakernel needs vocab % 32 == 0, got {V}")

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [smem, smem, smem, smem, smem,
                vmem, vmem, vmem, vmem, vmem, vmem, vmem]
    args = [tokens, pos, nblk, table, base_idx, cos, sin,
            an, fn_, qn, kn, on]
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

    kernel = _make_kernel(
        B=B, L=L, H=H, Hkv=Hkv, dk=dk, dv=dv, D=D, F=F, Rq=Rq, Adim=Adim,
        V=V, NB=NB, PAGE=PAGE, TN=TN, eps=eps, attn_scale=attn_scale,
        softcap=softcap, has_pa=has_pa, has_pf=has_pf, greedy=greedy,
    )
    S = NB * PAGE
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
            pltpu.VMEM((2, S, Hkv * dk), kc.dtype),  # lane-parity K buffer
            pltpu.VMEM((2, S, Hkv * dv), vc.dtype),  # lane-parity V buffer
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
            pltpu.SemaphoreType.DMA((2, 2)),
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


def decode_step_megakernel_batch_paged(hp, w, kpool, vpool, table, tokens,
                                       pos, *, greedy=False, interpret=False):
    """One PAGED batched decode step as one Pallas call.

    ``w.layers`` must be the stacked rowq8 LayerWeights. ``kpool`` /
    ``vpool`` are the stacked page pools [L, n_pages+1, PAGE, Hkv, d]
    (or the dsplit [.., m, 128] view — any layout whose trailing dims
    flatten to Hkv*d), where row n_pages is the TRASH page; ``table`` is
    the [B, NB] int32 page table whose unmapped entries hold n_pages.
    ``pos`` may hold >= NB*PAGE for parked lanes (clamped to 0; their
    row writeback lands in the trash page).

    Returns (out, new kpool, new vpool) with the pools reshaped back to
    the input layout; ``out`` as in fused_decode_batch (logits [B, V]
    f32 — caller applies the final softcap — or [B] int32 greedy
    tokens)."""
    lw = w.layers
    L = lw.wqkv.q.shape[0]
    B = tokens.shape[0]
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    kshape, vshape = kpool.shape, vpool.shape
    P1, PAGE = kshape[1], kshape[2]
    NB = table.shape[1]

    pos = jnp.asarray(pos, dtype=jnp.int32)
    # parked lanes (pos >= NB*PAGE) clamp to 0: block 0's table entry for
    # a parked slot is the n_pages sentinel = the pools' trash row, so
    # the garbage row write stays out of live pages
    pos = jnp.where((pos < 0) | (pos >= NB * PAGE), 0, pos)
    nblk = jnp.clip(pos // PAGE + 1, 1, NB).astype(jnp.int32)
    # sentinel/bogus entries clamp INTO the trash row (P1 - 1 == n_pages)
    table = jnp.clip(jnp.asarray(table, dtype=jnp.int32), 0, P1 - 1)
    base_idx, cos, sin = _rope_tables(hp, L, pos)

    f32 = jnp.float32
    has_pa = lw.post_attn_norm is not None
    has_pf = lw.post_ffw_norm is not None
    out, kc, vc = _run_step(
        jnp.asarray(tokens, dtype=jnp.int32),
        pos, nblk, table,
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
        kpool.reshape(L, P1, PAGE, -1),
        vpool.reshape(L, P1, PAGE, -1),
        eps=hp.rms_eps, attn_scale=hp.f_attention_scale,
        softcap=hp.attn_soft_cap or 0.0,
        H=hp.n_head, Hkv=hp.n_head_kv, dk=dk, dv=dv,
        has_pa=has_pa, has_pf=has_pf, greedy=greedy, interpret=interpret,
    )
    if greedy:
        out = out.reshape(B)
    return out, kc.reshape(kshape), vc.reshape(vshape)
