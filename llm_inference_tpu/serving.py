"""Batched serving: slot-based continuous batching over a vmapped forward.

The reference is strictly batch-1, one token per step (reference
main.cpp:218-223). Production TPU serving wants the opposite: weights are
read from HBM once per step regardless of batch, so decode throughput
scales nearly linearly with concurrent requests until the MXU saturates.

Design:
  - ``max_batch`` slots, each a lane of stacked per-layer KV caches
    [B, max_seq, heads, dim]. ``jax.vmap`` over the single-sequence
    ``forward`` turns every weight matmul into one batched GEMM (the
    weight operand is broadcast — XLA streams it once per step).
  - Decode runs in on-device chunks (lax.scan inside vmap) exactly like
    the single-stream engine; inactive slots park at pos=max_seq so their
    cache writes drop (models/gemma.py masked scatter) and their outputs
    are ignored on the host.
  - Prefill is per-request (single-sequence jit, bucketed) and the
    resulting cache is inserted into the slot lane between decode chunks —
    iteration-level continuous batching: requests join and retire at chunk
    boundaries without disturbing other lanes. A freed slot's stale cache
    needs no scrubbing: the next occupant's causal mask only reaches
    positions its own prefill rewrote.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import prefill_bucket
from .gguf.reader import GGUFFile
from .models.gemma import forward, forward_batched_decode, init_cache
from .models.weights import fuse_projections, load_weights
from .ops.pallas.flash_decode import DEFAULT_BLOCK

# KV page size in tokens (LLMI_PAGE). The paged flash kernel's key block
# == the page, so bigger pages mean fewer grid steps and fewer DMA
# descriptors per deep-context step (the 8k-deep config walks
# B * len/PAGE blocks per layer) at the cost of coarser pool allocation
# (mean waste PAGE/2 tokens per lane).
PAGE = int(os.environ.get("LLMI_PAGE", str(DEFAULT_BLOCK)))
from .tokenizer import Tokenizer


@dataclasses.dataclass
class Request:
    uid: int
    prompt_ids: list[int]
    n_predict: int
    out: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    on_token: Optional[Callable[[int], None]] = None
    # runtime state
    slot: int = -1
    pos: int = 0
    pending: int = -1  # sampled but not yet consumed token
    pages: list[int] = dataclasses.field(default_factory=list)  # paged mode
    # timing (perf_counter seconds): submit -> first sampled token
    t_submit: float = 0.0
    t_first: float = 0.0

    @property
    def ttft_s(self) -> float:
        """Time to first token (sampled at prefill), seconds."""
        return max(0.0, self.t_first - self.t_submit)


class BatchedServer:
    def __init__(
        self,
        gguf: GGUFFile | str,
        *,
        max_seq: int = 2048,
        max_batch: int = 8,
        mode: str = "serve",
        decode_chunk: int = 8,
        max_admit_per_step: int = 2,
        sharding_fn=None,
        cache_sharding=None,
        kv_pages: Optional[int] = None,
        sampling=None,
        seed: int = 0,
    ):
        """``kv_pages``: enable the PAGED KV cache — a shared pool of
        ``kv_pages`` pages of 256 tokens per KV layer, so HBM capacity
        scales with live tokens across requests instead of
        max_batch x max_seq (a dense batch-32 x 4k cache at the 1B
        geometry is ~35 GB; pages make that configuration fit one chip).
        Requests allocate ceil((prompt+n_predict+chunk)/256) pages at
        admission and free them at retirement; admission waits when the
        pool is exhausted. Serve modes only (parity keeps dense lanes).

        ``sampling``: a SamplingConfig for stochastic decoding (per-lane
        keys derived from (seed, slot, position) — deterministic given
        the seed, independent across lanes). Greedy (the default, the
        reference's only sampler) keeps the batched megakernel's
        in-kernel argmax fast path; stochastic sampling routes through
        the per-op batched program's [B, vocab] logits. Parity mode is
        greedy by contract."""
        from .sampling import SamplingConfig, sample as _sample

        if isinstance(gguf, str):
            gguf = GGUFFile(gguf)
        self.mode = mode
        exact = mode == "parity"
        self.sampling = cfg = sampling if sampling is not None else SamplingConfig()
        if exact and not cfg.is_greedy:
            raise ValueError("parity mode is greedy by contract")
        self._base_key = jax.random.PRNGKey(seed)
        base_key = self._base_key

        def pick_one(logits, slot, position):
            # [vocab] -> token id; slot/position make the key unique per
            # (lane, step) and reproducible given the server seed
            if cfg.is_greedy:
                return jnp.argmax(logits).astype(jnp.int32)
            k = jax.random.fold_in(jax.random.fold_in(base_key, slot), position)
            return _sample(logits, cfg, k)

        def pick_batch(logits, slots, positions):
            # [B, vocab] -> [B] token ids
            if cfg.is_greedy:
                # max-reduce + min-index instead of jnp.argmax: the
                # variadic (value, index) reduce argmax lowers to ran
                # 447 us/step over [32, 262144] in the paged roofline;
                # two plain reduces (f32 max, int32 min) vectorize fully.
                # Ties resolve to the LOWEST id, same as argmax's
                # first-occurrence rule (and the megakernel tail).
                B, V = logits.shape
                m = jnp.max(logits, axis=-1, keepdims=True)
                ii = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
                return jnp.min(jnp.where(logits == m, ii, V),
                               axis=-1).astype(jnp.int32)
            return jax.vmap(lambda lg, s, p: pick_one(lg, s, p))(
                logits, slots, positions)
        load_modes = {
            "serve": "bf16",
            "serve-q": "packed-serve",
            "serve-q4": "packed-q4",
            "serve-q8": "rowq8",
            "parity": "packed",
        }
        if mode not in load_modes:
            raise ValueError(
                f"unknown server mode {mode!r}; supported: {sorted(load_modes)}"
            )
        load_mode = load_modes[mode]
        self.hparams, self.weights = load_weights(
            gguf, mode=load_mode, sharding_fn=sharding_fn
        )
        if mode != "parity":
            self.weights = fuse_projections(self.weights)
        # the batched decode step iterates per-layer weights; the scan
        # stacking is a single-stream engine concern
        self._stacked = False
        self.tokenizer = Tokenizer(gguf.metadata, self.hparams.architecture)
        self.max_seq = max_seq
        self.max_batch = max_batch
        self.decode_chunk = decode_chunk
        self.max_admit_per_step = max_admit_per_step
        hp = self.hparams

        def _prefill_slot(w, caches, slot, tokens, pos, n_valid):
            # slice -> forward -> write-back inside ONE jit: XLA fuses the
            # slot gather/scatter into in-place dynamic slices instead of
            # 2 x n_layers eager device round-trips.
            one = jax.tree_util.tree_map(lambda c: c[slot], caches)
            logits, one = forward(hp, w, one, tokens, pos, n_valid,
                                  exact=exact, mm_impl="xla")
            caches = jax.tree_util.tree_map(lambda c, s: c.at[slot].set(s), caches, one)
            return pick_one(logits, slot, n_valid), caches

        def _prefill_group(w, caches, slots, tokens, n_valids):
            # serve modes: admit a whole group in ONE dispatch — a vmapped
            # bucket prefill turns G serialized prefills into batched GEMMs
            # (G x bucket rows per weight stream). Padded group members use
            # n_valid = 0: their cache writes drop and outputs are ignored.
            lanes = jax.tree_util.tree_map(lambda c: c[slots], caches)

            def one(lane, toks, nv, slot):
                logits, lane = forward(hp, w, lane, toks, 0, nv,
                                       exact=exact, mm_impl="xla")
                return pick_one(logits, slot, nv), lane

            toks_out, lanes = jax.vmap(one)(lanes, tokens, n_valids, slots)
            # mode="drop": padded group members carry slot == max_batch
            # (out of bounds) so their stale lanes never scatter back
            caches = jax.tree_util.tree_map(
                lambda c, l: c.at[slots].set(l, mode="drop"), caches, lanes)
            return toks_out, caches

        def _chunk_one(w, cache, token, pos):
            def body(carry, _):
                c, tok, p = carry
                # mm_impl="xla": a vmapped Pallas grid runs per-lane; one
                # batched XLA GEMM is what the MXU wants (ops/linear.py).
                # f64_scores=False: this trace is vmapped (parity batch
                # lanes) and vmap's batching rule would truncate the f64
                # QK dot outside the enable_x64 scope (models/gemma.py).
                logits, c = forward(hp, w, c, tok[None], p, exact=exact,
                                    mm_impl="xla", f64_scores=False)
                nxt = jnp.argmax(logits).astype(jnp.int32)
                return (c, nxt, p + 1), nxt

            (c, _, _), toks = jax.lax.scan(body, (cache, token, pos), None,
                                           length=decode_chunk)
            return toks, c

        def _chunk_batched(w, caches, tokens, pos):
            if exact:
                # parity mode keeps the single-sequence exact forward
                return jax.vmap(lambda c, t, p: _chunk_one(w, c, t, p))(caches, tokens, pos)

            # serve modes: ONE batched program per step — single [B, .]
            # GEMMs over the weights and ragged flash-decode attention
            # (models/gemma.py forward_batched_decode)
            slots_b = jnp.arange(tokens.shape[0], dtype=jnp.int32)

            def body(carry, _):
                c, toks, p = carry
                logits, c = forward_batched_decode(hp, w, c, toks, p)
                nxt = pick_batch(logits, slots_b, p)
                return (c, nxt, p + 1), nxt

            (c, _, _), toks = jax.lax.scan(body, (caches, tokens, pos), None,
                                           length=decode_chunk)
            return jnp.moveaxis(toks, 0, 1), c  # [B, chunk]

        self._prefill = jax.jit(_prefill_slot, donate_argnums=(1,))
        self._prefill_group = jax.jit(_prefill_group, donate_argnums=(1,))
        self._chunk = jax.jit(_chunk_batched, donate_argnums=(1,))
        self._exact = exact

        # Batched whole-step megakernel: the per-op batched program above
        # is weight-optimal in bytes but ~200 device kernels per step; one
        # Pallas call per step removes the launch gaps
        # (ops/pallas/fused_decode_batch.py). Dense serve-q8 lanes only —
        # keeps a SECOND (stacked) copy of the layer weights for the
        # decode path while prefill keeps the per-layer set.
        from .models.gemma import swa_active

        self._mega_batch = False
        self._mega_paged = False  # set in the paged branch below
        if (
            mode == "serve-q8"
            and cfg.is_greedy  # stochastic sampling needs the logits
            and sharding_fn is None
            and kv_pages is None
            and not swa_active(hp)  # megakernels keep the no-mask contract
            and os.environ.get("LLMI_NO_FUSED_DECODE", "0") != "1"
            and (jax.default_backend() == "tpu"
                 or os.environ.get("LLMI_FUSED_INTERPRET"))
        ):
            import dataclasses as _dc

            from .models.weights import layers_stackable, stack_layers
            from .ops.pallas.fused_decode_batch import megakernel_batch_supported

            if layers_stackable(hp, self.weights.layers):
                # probe eligibility on a FIRST-LAYER view before paying the
                # full stacked weight copy (the same OOM guard engine.py
                # uses): supported() reads only first-layer shapes.
                probe = _dc.replace(self.weights, layers=self.weights.layers[0])
                if megakernel_batch_supported(
                        hp, probe, batch=max_batch, max_seq=max_seq):
                    self._w_stacked = _dc.replace(
                        self.weights, layers=stack_layers(self.weights.layers))
                    self._mega_batch = True

        if self._mega_batch:
            from .models.gemma import KVCache as _KV
            from .models.gemma import softcap as _softcap
            from .ops.pallas.fused_decode_batch import (
                decode_step_megakernel_batch,
            )

            interp = (jax.default_backend() != "tpu"
                      and bool(os.environ.get("LLMI_FUSED_INTERPRET")))
            n_kv = hp.n_kv_layers

            def _chunk_mega(w, caches, tokens, pos):
                # stack the per-layer lanes at the chunk boundary (one
                # cache copy per chunk, amortized over decode_chunk steps)
                ck = jnp.stack(caches.k)
                cv = jnp.stack(caches.v)

                def body(carry, _):
                    ck, cv, toks, p = carry
                    # greedy=True: the argmax happens IN the kernel — no
                    # [B, vocab] logits round-trip (softcap is monotone)
                    nxt, ck, cv = decode_step_megakernel_batch(
                        hp, w, _KV(k=ck, v=cv), toks, p,
                        greedy=True, interpret=interp)
                    return (ck, cv, nxt, p + 1), nxt

                (ck, cv, _, _), toks = jax.lax.scan(
                    body, (ck, cv, tokens, pos), None, length=decode_chunk)
                caches = _KV(k=tuple(ck[i] for i in range(n_kv)),
                             v=tuple(cv[i] for i in range(n_kv)))
                return jnp.moveaxis(toks, 0, 1), caches

            self._chunk_mega = jax.jit(_chunk_mega, donate_argnums=(1,))

        self.page = PAGE
        self._paged = kv_pages is not None
        kv_dtype = jnp.float16 if mode == "parity" else jnp.bfloat16
        if self._paged:
            if exact:
                raise ValueError("paged KV serving is a serve-mode feature")
            if max_seq % PAGE:
                raise ValueError(f"paged serving needs max_seq % {PAGE} == 0")
            from .models.gemma import forward_batched_decode_paged

            self.kv_pages = kv_pages
            nb = max_seq // PAGE

            # Real SWA windowing (LLMI_SWA_MASK=1): a windowed layer only
            # ever reads the last `window` keys, so its pool shrinks to a
            # per-lane RING of ceil(window/PAGE)+1 pages — block j of lane
            # b lives at ring row b*ring + j%ring, and the layer's KV
            # footprint is bounded by the window instead of max_seq.
            # Shared-KV models keep plain pools (owner/consumer window
            # agreement is not guaranteed there).
            ring_on = swa_active(hp) and hp.n_layer_kv_from_start < 0

            def _ring(i):
                win = hp.swa_window(i) if ring_on else 0
                return (-(-win // PAGE) + 1) if win > 0 else 0

            self._rings = {i: _ring(i) for i in range(hp.n_kv_layers)
                           if _ring(i) > 0}
            ring_layers = tuple(sorted(self._rings))

            # PAGED whole-step megakernel (ops/pallas/fused_decode_batch_
            # paged.py): same gate as the dense megakernel, plus no rings
            # (the kernel implements plain pools only). When eligible the
            # pools get ONE extra trash page (row kv_pages — the index the
            # host table already uses as its "unmapped" sentinel) so
            # parked-lane row writebacks land in dedicated scratch.
            self._mega_paged = False
            # OPT-IN (LLMI_PAGED_MEGAKERNEL=1): the round-5 hardware sweep
            # measured the paged whole-step kernel at 3240 tok/s vs 5201
            # for the per-op paged path (batch 32 x 4k, BENCH_SWEEP_r05
            # batch32-paged-4k vs -perop): its per-(lane, page, layer) DMA
            # descriptor issue/wait pairs (~2*L*sum(nblk_b) per step) are
            # scalar-core-bound and cost more than the XLA gather they
            # replace. Correct (pool/token parity tests), not yet faster.
            if (
                os.environ.get("LLMI_PAGED_MEGAKERNEL", "0") == "1"
                and mode == "serve-q8"
                and cfg.is_greedy
                and sharding_fn is None
                and not swa_active(hp)
                and not self._rings
                and os.environ.get("LLMI_NO_FUSED_DECODE", "0") != "1"
                and (jax.default_backend() == "tpu"
                     or os.environ.get("LLMI_FUSED_INTERPRET"))
            ):
                import dataclasses as _dc

                from .models.weights import layers_stackable, stack_layers
                from .ops.pallas.fused_decode_batch_paged import (
                    megakernel_batch_paged_supported,
                )

                if layers_stackable(hp, self.weights.layers):
                    probe = _dc.replace(self.weights,
                                        layers=self.weights.layers[0])
                    if megakernel_batch_paged_supported(
                            hp, probe, batch=max_batch,
                            nb=max_seq // PAGE, page=PAGE):
                        self._w_stacked = _dc.replace(
                            self.weights,
                            layers=stack_layers(self.weights.layers))
                        self._mega_paged = True

            def _dsplit_ok(i):
                # degenerate real geometry (one KV head, d = m*128, for
                # BOTH k and v): store split-d [*, PAGE, m, 128] so the
                # in-place row insert Mosaic-lowers with no re-tiling
                # copies and the flash kernel reads it natively
                # (dsplit=True). The two views hold identical bytes.
                dk = (hp.n_embd_head_k_swa if hp.is_swa_layer(i)
                      else hp.n_embd_head_k)
                dv = (hp.n_embd_head_v_swa if hp.is_swa_layer(i)
                      else hp.n_embd_head_v)
                return (hp.n_head_kv == 1
                        and dk % 128 == 0 and dk // 128 >= 2
                        and dv % 128 == 0 and dv // 128 >= 2)

            def _pool(i, dk_or_dv):
                rows = (max_batch * self._rings[i] if i in self._rings
                        else kv_pages + (1 if self._mega_paged else 0))
                d = dk_or_dv
                if _dsplit_ok(i):
                    return jnp.zeros((rows, PAGE, d // 128, 128),
                                     dtype=kv_dtype)
                return jnp.zeros((rows, PAGE, hp.n_head_kv, d),
                                 dtype=kv_dtype)

            from .models.gemma import KVCache

            self._caches = KVCache(
                k=tuple(_pool(i, hp.n_embd_head_k_swa if hp.is_swa_layer(i)
                              else hp.n_embd_head_k) for i in range(hp.n_kv_layers)),
                v=tuple(_pool(i, hp.n_embd_head_v_swa if hp.is_swa_layer(i)
                              else hp.n_embd_head_v) for i in range(hp.n_kv_layers)),
            )
            self._table = np.full((max_batch, nb), kv_pages, dtype=np.int32)
            self._free_pages: list[int] = list(range(kv_pages))

            def _chunk_paged(w, pools, table, tokens, pos, *, nb_cap=None):
                slots_b = jnp.arange(tokens.shape[0], dtype=jnp.int32)

                def body(carry, _):
                    c, toks, p = carry
                    logits, c = forward_batched_decode_paged(
                        hp, w, c, table, toks, p, ring_layers=ring_layers,
                        nb_cap=nb_cap)
                    nxt = pick_batch(logits, slots_b, p)
                    return (c, nxt, p + 1), nxt

                if os.environ.get("LLMI_PAGED_UNROLL", "0") == "1":
                    # unrolled probe: lax.scan double-buffers the pool
                    # carry (a full pool copy per step); unrolled, XLA's
                    # buffer assignment can chain the updates in place
                    carry = (pools, tokens, pos)
                    outs = []
                    for _ in range(decode_chunk):
                        carry, nxt = body(carry, None)
                        outs.append(nxt)
                    return jnp.stack(outs, axis=1), carry[0]
                (c, _, _), toks = jax.lax.scan(body, (pools, tokens, pos), None,
                                               length=decode_chunk)
                return jnp.moveaxis(toks, 0, 1), c

            def _prefill_paged(w, pools, pages, tokens, n_valid, slot):
                # dense scratch prefill (bucket-length lanes), then the
                # bucket rows scatter into the request's pages; page rows
                # past n_valid stay stale and are never read (causal mask).
                # Ring layers scatter into the lane's ring rows instead —
                # only the blocks covering [n_valid - window, n_valid)
                # (others would alias live ring rows and are masked anyway).
                bucket = tokens.shape[0]
                scratch = init_cache(hp, max(bucket, 16), dtype=kv_dtype)
                logits, scratch = forward(hp, w, scratch, tokens, 0, n_valid,
                                          exact=False, mm_impl="xla")
                nk, nv = list(pools.k), list(pools.v)
                nbk = -(-bucket // PAGE)
                last_blk = jnp.maximum(n_valid - 1, 0) // PAGE
                for i in range(len(nk)):
                    r = self._rings.get(i, 0)
                    for j in range(nbk):
                        lo = j * PAGE
                        rows = min(bucket, lo + PAGE) - lo
                        if r:
                            live = (j <= last_blk) & (j > last_blk - r)
                            row = jnp.where(live, slot * r + (j % r),
                                            max_batch * r)  # OOB -> drop
                        else:
                            row = pages[j]
                        # dsplit pools: re-view scratch rows [rows, 1, d]
                        # -> [rows, m, 128] (free, row-major-identical)
                        nk[i] = nk[i].at[row, :rows].set(
                            scratch.k[i][lo : lo + rows].reshape(
                                (rows,) + nk[i].shape[2:]).astype(nk[i].dtype),
                            mode="drop")
                        nv[i] = nv[i].at[row, :rows].set(
                            scratch.v[i][lo : lo + rows].reshape(
                                (rows,) + nv[i].shape[2:]).astype(nv[i].dtype),
                            mode="drop")
                from .models.gemma import KVCache as _KV

                return (pick_one(logits, slot, n_valid),
                        _KV(k=tuple(nk), v=tuple(nv)))

            def _prefill_paged_group(w, pools, pages, tokens, n_valids, slots):
                # grouped admission, paged flavor: ONE vmapped bucket
                # prefill for the whole group (G x bucket rows per weight
                # stream, exactly like the dense _prefill_group), then a
                # single vectorized scatter of each lane's scratch rows
                # into its pages. ``pages`` is [G, nbk]; padding entries
                # (unallocated tail pages, padded group members) hold
                # kv_pages — out of bounds, so their writes drop. Page rows
                # past n_valid are written but never read before decode
                # overwrites them (causal mask).
                G, bucket = tokens.shape
                nbk = pages.shape[1]

                def one(toks, nv, slot):
                    scratch = init_cache(hp, max(bucket, 16), dtype=kv_dtype)
                    logits, scratch = forward(hp, w, scratch, toks, 0, nv,
                                              exact=False, mm_impl="xla")
                    return pick_one(logits, slot, nv), scratch

                toks_out, scratch = jax.vmap(one)(tokens, n_valids, slots)
                pages_flat = pages.reshape(-1)
                last_blk = jnp.maximum(n_valids - 1, 0) // PAGE  # [G]
                js = jnp.arange(nbk, dtype=jnp.int32)  # [nbk]
                nk, nv = list(pools.k), list(pools.v)
                for i in range(len(nk)):
                    r = self._rings.get(i, 0)
                    if r:
                        # ring rows: slot*r + j%r for the live window's
                        # blocks only (one block per ring row — a single
                        # scatter never writes colliding indices); padded
                        # members carry slot == max_batch (OOB -> drop)
                        live = ((js[None, :] <= last_blk[:, None])
                                & (js[None, :] > last_blk[:, None] - r))
                        rows = jnp.where(
                            live, slots[:, None] * r + (js % r)[None, :],
                            max_batch * r)
                        idx = rows.reshape(-1)
                    else:
                        idx = pages_flat

                    def scatter(pool, s, idx=idx):
                        s = s[:, : nbk * PAGE]
                        pad = nbk * PAGE - s.shape[1]
                        if pad > 0:
                            s = jnp.pad(s, ((0, 0), (0, pad), (0, 0), (0, 0)))
                        # dsplit pools: [.., 1, d] -> [.., m, 128] free view
                        s = s.reshape(G * nbk, PAGE, *pool.shape[2:])
                        return pool.at[idx].set(
                            s.astype(pool.dtype), mode="drop")

                    nk[i] = scatter(nk[i], scratch.k[i])
                    nv[i] = scatter(nv[i], scratch.v[i])
                from .models.gemma import KVCache as _KV

                return toks_out, _KV(k=tuple(nk), v=tuple(nv))

            self._chunk_paged = jax.jit(_chunk_paged, donate_argnums=(1,),
                                        static_argnames=("nb_cap",))
            self._prefill_paged = jax.jit(_prefill_paged, donate_argnums=(1,))
            self._prefill_paged_group = jax.jit(
                _prefill_paged_group, donate_argnums=(1,))

            if self._mega_paged:
                from .models.gemma import KVCache as _KV
                from .ops.pallas.fused_decode_batch_paged import (
                    decode_step_megakernel_batch_paged,
                )

                interp = (jax.default_backend() != "tpu"
                          and bool(os.environ.get("LLMI_FUSED_INTERPRET")))
                n_kv = hp.n_kv_layers

                def _chunk_paged_mega(w, pools, table, tokens, pos):
                    # stack the per-layer pools at the chunk boundary (one
                    # pool copy per chunk, amortized over decode_chunk
                    # steps; the scan carry updates in place)
                    kp = jnp.stack(pools.k)
                    vp = jnp.stack(pools.v)

                    def body(carry, _):
                        kp, vp, toks, p = carry
                        nxt, kp, vp = decode_step_megakernel_batch_paged(
                            hp, w, kp, vp, table, toks, p,
                            greedy=True, interpret=interp)
                        return (kp, vp, nxt, p + 1), nxt

                    (kp, vp, _, _), toks = jax.lax.scan(
                        body, (kp, vp, tokens, pos), None,
                        length=decode_chunk)
                    pools = _KV(k=tuple(kp[i] for i in range(n_kv)),
                                v=tuple(vp[i] for i in range(n_kv)))
                    return jnp.moveaxis(toks, 0, 1), pools

                self._chunk_paged_mega = jax.jit(
                    _chunk_paged_mega, donate_argnums=(1,))
        else:
            one = init_cache(hp, max_seq, stacked=self._stacked, dtype=kv_dtype)
            self._caches = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (max_batch,) + a.shape).copy(), one
            )
            if cache_sharding is not None:  # [B, S, Hkv, dk] lanes: shard KV heads
                self._caches = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, cache_sharding), self._caches
                )
        self._free: list[int] = list(range(max_batch))
        self._active: dict[int, Request] = {}
        self._queue: list[Request] = []
        self._uid = 0

    # -- request lifecycle ----------------------------------------------------

    def submit(self, prompt_ids: list[int], n_predict: int = 100,
               on_token: Optional[Callable[[int], None]] = None) -> Request:
        """Queue a request; it joins the batch at the next step()."""
        # Reject anything that could overrun the preallocated cache: an
        # out-of-range write would silently drop (models/gemma.py
        # _write_cache mode='drop') and the request would emit garbage.
        need = len(prompt_ids) + n_predict + self.decode_chunk
        if prefill_bucket(len(prompt_ids)) > self.max_seq or need > self.max_seq:
            raise ValueError(
                f"request needs {need} cache slots (prompt {len(prompt_ids)} + "
                f"n_predict {n_predict} + chunk {self.decode_chunk}, prefill "
                f"bucket {prefill_bucket(len(prompt_ids))}) but max_seq is {self.max_seq}"
            )
        # Paged mode: the page pool is the real capacity bound. A request
        # needing more pages than the pool HOLDS (not merely more than are
        # currently free) can never be admitted — _admit() would stall at the
        # queue head forever and starve everything behind it.
        if self._paged:
            need_pages = -(-need // PAGE)
            if need_pages > self.kv_pages:
                raise ValueError(
                    f"request needs {need_pages} KV pages ({need} tokens at "
                    f"{PAGE}/page) but the pool only has {self.kv_pages}"
                )
        self._uid += 1
        req = Request(uid=self._uid, prompt_ids=list(prompt_ids),
                      n_predict=n_predict, on_token=on_token,
                      t_submit=time.perf_counter())
        self._queue.append(req)
        return req

    def _admit(self) -> None:
        """Prefill queued requests into free slots (between decode chunks).

        At most ``max_admit_per_step`` prefills run per scheduler
        iteration once requests are already decoding, bounding the
        head-of-line blocking a burst of long prompts adds to in-flight
        decodes; an idle engine admits as many as fit. Serve modes admit
        same-bucket groups in ONE vmapped dispatch (padded to power-of-two
        group sizes so group shapes compile once)."""
        budget = len(self._free) if not self._active else self.max_admit_per_step
        if self._paged:
            while self._queue and self._free and budget > 0:
                bucket = prefill_bucket(len(self._queue[0].prompt_ids))
                # form a same-bucket group bounded by free slots, the
                # admission budget, AND the page pool: a queue head the
                # pool can't satisfy yet stalls admission (fair FIFO —
                # skipping ahead would starve long requests forever)
                group: list[Request] = []
                pages_left = len(self._free_pages)
                while (self._queue and len(group) < len(self._free)
                       and budget > 0
                       and prefill_bucket(len(self._queue[0].prompt_ids)) == bucket):
                    head = self._queue[0]
                    need_pages = -(-(len(head.prompt_ids) + head.n_predict
                                     + self.decode_chunk) // PAGE)
                    if need_pages > pages_left:
                        break  # pool exhausted: wait for retirements
                    pages_left -= need_pages
                    group.append(self._queue.pop(0))
                    budget -= 1
                if not group:
                    return  # head blocked on the pool (or nothing queued)
                nbk = -(-bucket // PAGE)
                if len(group) == 1:
                    req = group[0]
                    need_pages = -(-(len(req.prompt_ids) + req.n_predict
                                     + self.decode_chunk) // PAGE)
                    slot = self._free.pop(0)
                    req.pages = [self._free_pages.pop(0)
                                 for _ in range(need_pages)]
                    self._table[slot, :] = self.kv_pages
                    self._table[slot, : need_pages] = req.pages
                    padded = np.zeros(bucket, dtype=np.int32)
                    padded[: len(req.prompt_ids)] = req.prompt_ids
                    pages_arr = np.full(max(nbk, 1), self.kv_pages,
                                        dtype=np.int32)
                    pages_arr[: min(nbk, need_pages)] = req.pages[:nbk]
                    tok, self._caches = self._prefill_paged(
                        self.weights, self._caches, jnp.asarray(pages_arr),
                        jnp.asarray(padded), jnp.int32(len(req.prompt_ids)),
                        jnp.int32(slot),
                    )
                    self._activate(req, slot, int(tok))
                    continue
                # grouped paged prefill: ONE vmapped dispatch, padded to
                # power-of-two group sizes so group shapes compile once
                g = 1
                while g < len(group):
                    g *= 2
                pages_arr = np.full((g, max(nbk, 1)), self.kv_pages,
                                    dtype=np.int32)
                tokens = np.zeros((g, bucket), dtype=np.int32)
                n_valids = np.zeros(g, dtype=np.int32)
                slots_arr = np.full(g, self.max_batch, dtype=np.int32)
                taken = []
                for i, req in enumerate(group):
                    need_pages = -(-(len(req.prompt_ids) + req.n_predict
                                     + self.decode_chunk) // PAGE)
                    slot = self._free.pop(0)
                    taken.append(slot)
                    slots_arr[i] = slot
                    req.pages = [self._free_pages.pop(0)
                                 for _ in range(need_pages)]
                    self._table[slot, :] = self.kv_pages
                    self._table[slot, : need_pages] = req.pages
                    pages_arr[i, : min(nbk, need_pages)] = req.pages[:nbk]
                    tokens[i, : len(req.prompt_ids)] = req.prompt_ids
                    n_valids[i] = len(req.prompt_ids)
                toks, self._caches = self._prefill_paged_group(
                    self.weights, self._caches, jnp.asarray(pages_arr),
                    jnp.asarray(tokens), jnp.asarray(n_valids),
                    jnp.asarray(slots_arr),
                )
                toks = np.asarray(toks)
                for i, req in enumerate(group):
                    self._activate(req, taken[i], int(toks[i]))
            return
        while self._queue and self._free and budget > 0:
            bucket = prefill_bucket(len(self._queue[0].prompt_ids))
            group: list[Request] = []
            while (
                self._queue and len(group) < len(self._free) and budget > 0
                and prefill_bucket(len(self._queue[0].prompt_ids)) == bucket
                and (self._exact is False or not group)
            ):
                group.append(self._queue.pop(0))
                budget -= 1
            if self._exact or len(group) == 1:
                for req in group:
                    slot = self._free.pop(0)
                    padded = np.zeros(bucket, dtype=np.int32)
                    padded[: len(req.prompt_ids)] = req.prompt_ids
                    tok, self._caches = self._prefill(
                        self.weights, self._caches, jnp.int32(slot),
                        jnp.asarray(padded), jnp.int32(0),
                        jnp.int32(len(req.prompt_ids)),
                    )
                    self._activate(req, slot, int(tok))
                continue
            g = 1
            while g < len(group):
                g *= 2
            # padding entries: slot out of bounds -> their write-back drops
            slots = np.full(g, self.max_batch, dtype=np.int32)
            tokens = np.zeros((g, bucket), dtype=np.int32)
            n_valids = np.zeros(g, dtype=np.int32)  # padding: 0 valid tokens
            taken = []
            for i, req in enumerate(group):
                slot = self._free.pop(0)
                taken.append(slot)
                slots[i] = slot
                tokens[i, : len(req.prompt_ids)] = req.prompt_ids
                n_valids[i] = len(req.prompt_ids)
            toks, self._caches = self._prefill_group(
                self.weights, self._caches, jnp.asarray(slots),
                jnp.asarray(tokens), jnp.asarray(n_valids),
            )
            toks = np.asarray(toks)
            for i, req in enumerate(group):
                self._activate(req, taken[i], int(toks[i]))

    def _activate(self, req: Request, slot: int, first_tok: int) -> None:
        req.slot = slot
        req.pos = len(req.prompt_ids)
        req.pending = first_tok
        req.t_first = time.perf_counter()
        self._active[slot] = req

    def _emit(self, req: Request, tid: int) -> bool:
        """Record one token; True when the request just finished."""
        if self.tokenizer.is_stop(tid) or len(req.out) >= req.n_predict:
            req.done = True
            return True
        req.out.append(tid)
        if req.on_token:
            req.on_token(tid)
        if len(req.out) >= req.n_predict:
            req.done = True
            return True
        return False

    # -- engine loop ------------------------------------------------------------

    def step(self) -> int:
        """One scheduler iteration: admit + one batched decode chunk.
        Returns the number of requests still in flight."""
        self._admit()
        if not self._active:
            return len(self._queue)

        tokens = np.zeros(self.max_batch, dtype=np.int32)
        pos = np.full(self.max_batch, self.max_seq, dtype=np.int32)  # parked
        for slot, req in self._active.items():
            tokens[slot] = req.pending
            pos[slot] = req.pos

        if self._paged and self._mega_paged:
            toks, self._caches = self._chunk_paged_mega(
                self._w_stacked, self._caches, jnp.asarray(self._table),
                jnp.asarray(tokens), jnp.asarray(pos)
            )
        elif self._paged:
            # bound the flash grid by the deepest lane's blocks at chunk
            # end, bucketed to a power of two (one retrace per bucket):
            # the paged flash grid otherwise walks max_seq/PAGE key blocks
            # per lane per layer, and the elided blocks' grid-iteration
            # overhead dominated the step (round-4 roofline "other")
            deepest = max(req.pos for req in self._active.values())
            blocks = -(-(deepest + self.decode_chunk + 1) // self.page)
            cap = min(self.max_seq // self.page,
                      1 << max(0, blocks - 1).bit_length())
            if os.environ.get("LLMI_PAGED_NBCAP", "1") == "0":
                cap = None  # A/B: full-table grid
            toks, self._caches = self._chunk_paged(
                self.weights, self._caches, jnp.asarray(self._table),
                jnp.asarray(tokens), jnp.asarray(pos), nb_cap=cap
            )
        elif self._mega_batch:
            toks, self._caches = self._chunk_mega(
                self._w_stacked, self._caches, jnp.asarray(tokens), jnp.asarray(pos)
            )
        else:
            toks, self._caches = self._chunk(
                self.weights, self._caches, jnp.asarray(tokens), jnp.asarray(pos)
            )
        toks = np.asarray(toks)  # [B, chunk]

        finished = []
        for slot, req in self._active.items():
            if self._emit(req, req.pending):
                finished.append(slot)
                continue
            req.pos += self.decode_chunk
            stopped = False
            for tid in toks[slot, :-1]:
                if self._emit(req, int(tid)):
                    finished.append(slot)
                    stopped = True
                    break
            if not stopped:
                req.pending = int(toks[slot, -1])
        for slot in finished:
            req = self._active.pop(slot)
            self._free.append(slot)
            if self._paged:
                self._free_pages.extend(req.pages)
                req.pages = []
                self._table[slot, :] = self.kv_pages
        return len(self._active) + len(self._queue)

    def run(self, requests: list[tuple[list[int], int]]) -> list[list[int]]:
        """Convenience: continuous-batch (prompt_ids, n_predict) pairs to
        completion; returns generated ids per request, in submit order."""
        reqs = [self.submit(ids, n) for ids, n in requests]
        while self.step():
            pass
        return [r.out for r in reqs]
