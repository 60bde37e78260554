"""Ragged flash-decode attention: blockwise online-softmax over the KV
cache with per-request lengths.

The XLA attention in models/gemma.py reads and masks the WHOLE preallocated
cache every step — correct, but at high batch and long context the masked
tail dominates HBM traffic (batch 32 x 4k cache is gigabytes per step of
mostly-masked keys). This kernel is the serving-path fix, the TPU analogue
of paged/flash decode:

  - grid (batch, key_blocks); the key/value BlockSpec index_map CLAMPS the
    block index to each request's live window [starts, length) (scalar-
    prefetched), so out-of-range blocks re-reference the previous block and
    Mosaic skips their DMA — bytes moved scale with the request's actual
    live context, not max_seq;
  - online softmax (m, l, acc) in VMEM scratch across key blocks — the
    same numerics as the reference's run_attn accumulator
    (reference model.cpp:501-541), blockwise instead of per-element;
  - GQA by a static loop over KV heads (small), one MXU dot per KV head
    per block;
  - ``starts`` carries REAL sliding-window attention (LLMI_SWA_MASK=1):
    keys < starts[b] are skipped at DMA granularity and masked within the
    boundary block. The parity default passes starts=None (= 0s) — the
    reference parses the SWA pattern but never masks (model.cpp:727-748).

Scope: decode (one query token per request). ALiBi is not implemented
here (callers fall back to the XLA path when max_alibi_bias > 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256


def _kernel(lens_ref, starts_ref, q_ref, k_ref, v_ref, o_ref, acc, m_scr,
            l_scr, *, block, softcap):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)

    length = lens_ref[b]
    start = starts_ref[b]

    @pl.when((j * block < length) & ((j + 1) * block > start))
    def _():
        q = q_ref[0].astype(jnp.float32)  # [H, Dk]
        k = k_ref[0].astype(jnp.float32)  # [BLK, Hkv, Dk]
        v = v_ref[0].astype(jnp.float32)  # [BLK, Hkv, Dv]
        H = q.shape[0]
        hkv = k.shape[1]
        group = H // hkv

        key_pos = j * block + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        valid = (key_pos < length) & (key_pos >= start)  # [1, BLK]

        for i in range(hkv):  # static, small
            qi = q[i * group : (i + 1) * group, :]  # [G, Dk]
            ki = k[:, i, :]  # [BLK, Dk]
            s = jax.lax.dot_general(
                qi, ki,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, BLK]
            if softcap > 0.0:
                s = softcap * jnp.tanh(s / softcap)
            s = jnp.where(valid, s, -jnp.inf)

            m_prev = m_scr[i * group : (i + 1) * group, :]  # [G, 1]
            l_prev = l_scr[i * group : (i + 1) * group, :]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # [G, BLK]
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

            vi = v[:, i, :]  # [BLK, Dv]
            pv = jax.lax.dot_general(
                p, vi,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, Dv]
            acc_slice = acc[i * group : (i + 1) * group, :]
            acc[i * group : (i + 1) * group, :] = acc_slice * alpha + pv
            m_scr[i * group : (i + 1) * group, :] = m_new
            l_scr[i * group : (i + 1) * group, :] = l_new

    @pl.when(j == nb - 1)
    def _():
        denom = l_scr[:]
        safe = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc[:] / safe).astype(o_ref.dtype)


def _kernel_dsplit(lens_ref, starts_ref, q_ref, k_ref, v_ref, o_ref, acc,
                   m_scr, l_scr, *, block, softcap):
    """Split-d variant: ONE real KV head of dim m*128, stored as
    [BLK, m, 128] so the pool layout Mosaic-lowers everywhere (the row
    insert kernel rejects a [1, m*128] trailing layout, and XLA
    re-tiling between the two views costs ~3.7 ms/step at batch 32 —
    measured; see models/gemma.py forward_batched_decode_paged). The QK
    dot accumulates over the m 128-lane chunks; PV writes acc per chunk."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)

    length = lens_ref[b]
    start = starts_ref[b]

    @pl.when((j * block < length) & ((j + 1) * block > start))
    def _():
        q = q_ref[0].astype(jnp.float32)  # [H, Dk = mk*128]
        k = k_ref[0].astype(jnp.float32)  # [BLK, mk, 128]
        v = v_ref[0].astype(jnp.float32)  # [BLK, mv, 128]
        H = q.shape[0]
        mk = k.shape[1]
        mv = v.shape[1]

        key_pos = j * block + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        valid = (key_pos < length) & (key_pos >= start)  # [1, BLK]

        s = jnp.zeros((H, block), jnp.float32)
        for i in range(mk):  # static, small (d/128)
            s = s + jax.lax.dot_general(
                q[:, i * 128 : (i + 1) * 128], k[:, i, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, BLK]
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(valid, s, -jnp.inf)

        m_prev = m_scr[:]  # [H, 1]
        l_prev = l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [H, BLK]
        l_scr[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_new
        for i in range(mv):
            pv = jax.lax.dot_general(
                p, v[:, i, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, 128]
            acc[:, i * 128 : (i + 1) * 128] = (
                acc[:, i * 128 : (i + 1) * 128] * alpha + pv)

    @pl.when(j == nb - 1)
    def _():
        denom = l_scr[:]
        safe = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc[:] / safe).astype(o_ref.dtype)


def _starts_or_zeros(starts, lengths):
    if starts is None:
        return jnp.zeros_like(lengths, dtype=jnp.int32)
    return starts.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("softcap", "interpret", "dsplit", "nb_cap"))
def paged_flash_decode(
    q: Array,  # [B, H, Dk] f32 (already scaled)
    k_pool: Array,  # [N_pages, PAGE, Hkv, Dk]; dsplit: [N, PAGE, Dk/128, 128]
    v_pool: Array,  # [N_pages, PAGE, Hkv, Dv]; dsplit: [N, PAGE, Dv/128, 128]
    table: Array,  # [B, max_pages] int32: page id per block of each request
    lengths: Array,  # [B] int32
    starts: Array | None = None,  # [B] int32: first attendable key (SWA)
    *,
    softcap: float = 0.0,
    interpret: bool = False,
    dsplit: bool = False,
    nb_cap: int | None = None,
) -> Array:
    """Paged variant of :func:`flash_decode`: the KV cache lives in a
    shared PAGE POOL and each request's blocks indirect through a
    scalar-prefetched page table — HBM capacity scales with LIVE tokens
    across all requests instead of batch x max_seq, and DMA still skips
    blocks outside each request's live window (out-of-range grid steps
    clamp to the window's boundary pages, so consecutive steps
    re-reference the same pool row and Mosaic elides the copy). The kernel
    body (blockwise online softmax) is shared with the dense path. Page
    size = the kernel block (DEFAULT_BLOCK).

    ``dsplit``: the pools hold ONE real KV head of dim m*128 stored as
    [N, PAGE, m, 128] (the layout the in-place row-insert kernel lowers
    for; models/gemma.py picks it for degenerate n_head_kv=1 caches).
    q stays [B, H, m*128]; the kernel sums the QK dot over the chunks.

    ``nb_cap`` (static): upper bound on live blocks across the batch —
    the grid shrinks to (B, min(nb, nb_cap)). Without it the grid always
    walks table.shape[1] key blocks per lane even when every lane is a
    few hundred tokens deep: at batch 32 x 4k that is 512 grid steps per
    layer whose DMAs are elided but whose iteration overhead is not
    (round-4 roofline: the paged step's dominant unattributed cost).
    Callers bucket ceil(max(lengths)/PAGE) up (serving.py step()); a cap
    smaller than a lane's live depth would silently truncate attention,
    so it is the caller's contract to over- not under-shoot."""
    B, H, Dk = q.shape
    N, page, Hkv, Dv = v_pool.shape
    if dsplit:
        mk = k_pool.shape[2]
        mv = v_pool.shape[2]
        if mk * 128 != Dk or k_pool.shape[3] != 128 or v_pool.shape[3] != 128:
            raise ValueError(
                f"dsplit pools must be [N, PAGE, d/128, 128]; got k "
                f"{k_pool.shape} v {v_pool.shape} for Dk={Dk}")
        Dv = mv * 128
    nb = table.shape[1]
    if nb_cap is not None:
        nb = max(1, min(nb, int(nb_cap)))

    def pagemap(b, j, lens, starts_, tbl):
        # clamp j into the request's live window [first, last] (skips
        # dead-tail AND slid-out-prefix DMA), then clamp the page id
        # itself: parked lanes (length 0) hit the table's unassigned
        # sentinel (== n_pages), which would be an out-of-bounds block DMA
        # on real TPU hardware. The kernel body never reads the block
        # (the j-window gate fails), so any valid page works.
        last = jnp.maximum(lens[b] - 1, 0) // page
        first = jnp.minimum(starts_[b] // page, last)
        pid = tbl[b, jnp.minimum(jnp.maximum(j, first), last)]
        return (jnp.minimum(pid, N - 1), 0, 0, 0)

    kspec = ((1, page, mk, 128) if dsplit else (1, page, Hkv, Dk))
    vspec = ((1, page, mv, 128) if dsplit else (1, page, Hkv, Dv))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, H, Dk), lambda b, j, lens, starts_, tbl: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kspec, pagemap, memory_space=pltpu.VMEM),
            pl.BlockSpec(vspec, pagemap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, Dv), lambda b, j, lens, starts_, tbl: (b, 0, 0),
            memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((H, Dv), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
        ],
    )

    body = _kernel_dsplit if dsplit else _kernel

    def kernel(lens_ref, starts_ref, tbl_ref, q_ref, k_ref, v_ref, o_ref,
               acc, m_scr, l_scr):
        del tbl_ref  # indirection happens in the index_map
        body(lens_ref, starts_ref, q_ref, k_ref, v_ref, o_ref, acc,
             m_scr, l_scr, block=page, softcap=softcap)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), jnp.float32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), _starts_or_zeros(starts, lengths),
      table.astype(jnp.int32), q.astype(jnp.float32), k_pool, v_pool)


@functools.partial(jax.jit, static_argnames=("block", "softcap", "interpret"))
def flash_decode(
    q: Array,  # [B, H, Dk] f32 (already scaled; f16-rounded by caller if needed)
    k_cache: Array,  # [B, S, Hkv, Dk] f16
    v_cache: Array,  # [B, S, Hkv, Dv] f16
    lengths: Array,  # [B] int32: keys < length attend (the causal frontier)
    starts: Array | None = None,  # [B] int32: first attendable key (SWA)
    *,
    block: int = DEFAULT_BLOCK,
    softcap: float = 0.0,
    interpret: bool = False,
) -> Array:
    """Blockwise masked attention for one query per request: [B, H, Dv] f32."""
    B, H, Dk = q.shape
    _, S, Hkv, Dv = v_cache.shape
    if S % block:
        raise ValueError(f"max_seq {S} must be a multiple of block {block}")
    nb = S // block

    def clamp(b, j, lens, starts_):
        last = jnp.maximum(lens[b] - 1, 0) // block
        first = jnp.minimum(starts_[b] // block, last)
        return (b, jnp.minimum(jnp.maximum(j, first), last), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, H, Dk), lambda b, j, lens, starts_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, Hkv, Dk), clamp, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, Hkv, Dv), clamp, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, Dv), lambda b, j, lens, starts_: (b, 0, 0),
            memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((H, Dv), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
        ],
    )

    return pl.pallas_call(
        functools.partial(_kernel, block=block, softcap=softcap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), jnp.float32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), _starts_or_zeros(starts, lengths),
      q.astype(jnp.float32), k_cache, v_cache)
