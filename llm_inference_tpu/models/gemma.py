"""Gemma-family forward pass: one jit-compiled function for prefill & decode.

TPU-native re-design of the reference's sequential executor (reference
model.cpp:706-1049). Differences that matter for the hardware:

  - The KV cache is **preallocated** [max_seq, n_kv_heads, head_dim] f16
    per layer with masked scatter writes, replacing the growing nested
    vectors (reference model.cpp:461-474) — static shapes so XLA compiles
    the step once.
  - Attention is a batched masked softmax over the whole cache (one MXU
    GEMM per projection and per QK/PV contraction) instead of a per-token
    per-head scan (reference model.cpp:478-548). The online-softmax there
    is numerically the same function; here XLA/Pallas handles blocking.
  - Tokens are processed as a [T, ...] batch everywhere (true batched
    prefill; the reference runs prefill token-by-token through GEMVs).

Parity-critical rounding points reproduced exactly (SURVEY.md §7 hard
part b): K/V stored through f16 (model.cpp:442-459), Q downcast to f16
before the QK dot (model.cpp:504-509), per-format activation quantization
inside every matmul (ops/linear.py), embedding scale sqrt(n_embd)
(model.cpp:336-344), attention softcap + ALiBi order (model.cpp:511-518),
final-token-only logits (model.cpp:983-1034).

``n_valid`` (a traced scalar) supports bucketed prefill: tokens[t] for
t >= n_valid are padding — their K/V writes are dropped and the logits are
read at index n_valid-1, so a prompt padded to a bucket length produces
bit-identical results to an unpadded run.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..ops.linear import matmul, embed_rows
from ..ops.numerics import f16_round, gelu_tanh, rms_norm, rope, softcap
from ..trace import tap
from .hparams import HParams
from .weights import LayerWeights, ModelWeights

KV_DTYPE = jnp.float16  # the reference stores K/V as IEEE f16 (model.cpp:442-459)


@partial(jax.tree_util.register_dataclass, data_fields=["k", "v"], meta_fields=[])
@dataclasses.dataclass
class KVCache:
    """Per-KV-layer preallocated caches, stacked pytree of
    k[i]: [max_seq, n_head_kv, head_dim_k], v[i]: [max_seq, n_head_kv, head_dim_v]."""

    k: tuple[Array, ...]
    v: tuple[Array, ...]


def init_cache(hp: HParams, max_seq: int, *, sharding=None, stacked: bool = False,
               flat: bool = False, dtype=KV_DTYPE) -> KVCache:
    """Allocate zeroed caches for every layer that owns KV storage.

    ``stacked=True`` returns single [n_layers, max_seq, heads, dim] arrays
    (the scan-over-layers layout; requires uniform head dims).

    ``flat=True`` (with stacked): [n_layers, max_seq, heads*dim] — the
    streamed capacity megakernel's native layout. Keeping the cache flat
    AT REST removes the per-decode-step [L,S,H,d]<->[L,S,H*d] re-tilings
    around the kernel (measured 2.5 ms/step of reshape+copy on the 12B:
    they also broke the decode scan's carry aliasing); the prefill scan
    views it 4-D per layer instead (once per request).

    ``dtype``: f16 (default) matches the reference's cache exactly; serve
    engines use bf16 — same byte width, Mosaic-native for the flash-decode
    kernel (Mosaic has no f16 support)."""
    if stacked:
        kshape = ((hp.n_kv_layers, max_seq, hp.n_head_kv * hp.n_embd_head_k)
                  if flat else
                  (hp.n_kv_layers, max_seq, hp.n_head_kv, hp.n_embd_head_k))
        vshape = ((hp.n_kv_layers, max_seq, hp.n_head_kv * hp.n_embd_head_v)
                  if flat else
                  (hp.n_kv_layers, max_seq, hp.n_head_kv, hp.n_embd_head_v))
        k = jnp.zeros(kshape, dtype=dtype)
        v = jnp.zeros(vshape, dtype=dtype)
        if sharding is not None:
            k, v = jax.device_put(k, sharding), jax.device_put(v, sharding)
        return KVCache(k=k, v=v)
    ks, vs = [], []
    for i in range(hp.n_kv_layers):
        swa = hp.is_swa_layer(i)
        dk = hp.n_embd_head_k_swa if swa else hp.n_embd_head_k
        dv = hp.n_embd_head_v_swa if swa else hp.n_embd_head_v
        k = jnp.zeros((max_seq, hp.n_head_kv, dk), dtype=dtype)
        v = jnp.zeros((max_seq, hp.n_head_kv, dv), dtype=dtype)
        if sharding is not None:
            k, v = jax.device_put(k, sharding), jax.device_put(v, sharding)
        ks.append(k)
        vs.append(v)
    return KVCache(k=tuple(ks), v=tuple(vs))


def _alibi_slopes(n_head: int, max_bias: float) -> np.ndarray:
    """Per-head ALiBi slopes (reference model.cpp:492-499)."""
    n_head_log2 = 1 << int(math.floor(math.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-(max_bias / 2.0) / n_head_log2)
    return np.array(
        [
            m0 ** (h + 1) if h < n_head_log2 else m1 ** (2 * (h - n_head_log2) + 1)
            for h in range(n_head)
        ],
        dtype=np.float32,
    )


def _norm(x: Array, weight: Array, eps: float) -> Array:
    """RMS norm + weight multiply (reference run_norm, model.cpp:361-386)."""
    return rms_norm(x, eps) * weight.astype(jnp.float32)


def _write_cache(cache: Array, new: Array, pos: Array, n_valid: Array) -> Array:
    """Masked append: write new[t] at cache slot pos+t for t < n_valid;
    padded rows scatter out-of-range and are dropped."""
    T = new.shape[0]
    slots = pos + jnp.arange(T, dtype=jnp.int32)
    slots = jnp.where(jnp.arange(T) < n_valid, slots, cache.shape[0])
    return cache.at[slots].set(new.astype(cache.dtype), mode="drop")


def _swa_mask_enabled() -> bool:
    """LLMI_SWA_MASK=1 turns on REAL sliding-window attention on SWA
    layers (SURVEY §5). The default reproduces the reference's behavior —
    it parses the SWA pattern but never applies a window mask
    (reference model.cpp:727-748) — which is what greedy parity vs the
    reference engine requires."""
    return os.environ.get("LLMI_SWA_MASK", "0") == "1"


def _inplace_insert_enabled() -> bool:
    """Batched/paged KV row writes go through the aliased Pallas DMA
    kernel (ops/pallas/kv_insert.py) instead of an XLA scatter: the
    scatter's TPU lowering copies the entire cache/pool per layer
    (measured ~9.1 ms/step at batch 32 x 4k paged). Default ON on TPU
    for geometries the kernel lowers for (kv_insert.layout_supported —
    degenerate H=1/head_dim=256 caches re-view as [2, 128] inside the
    kernel); per-shape fallback to the scatter happens at the call
    sites. On CPU the kernel only runs in interpret mode, so tests opt
    in via LLMI_FUSED_INTERPRET=1 (or LLMI_INPLACE_INSERT=1) and
    everything else keeps the scatter. LLMI_NO_INPLACE_INSERT=1 forces
    the scatter everywhere."""
    if os.environ.get("LLMI_NO_INPLACE_INSERT", "0") == "1":
        return False
    if os.environ.get("LLMI_INPLACE_INSERT", "0") == "1":
        return True
    if jax.default_backend() == "tpu":
        return True
    return os.environ.get("LLMI_FUSED_INTERPRET", "0") == "1"


def _use_inplace_insert(*caches) -> bool:
    """Per-shape gate: the env/default switch AND (on TPU) a lowerable
    trailing layout for every cache passed ([**, H, d] trailing dims)."""
    if not _inplace_insert_enabled():
        return False
    if jax.default_backend() == "tpu":
        from ..ops.pallas.kv_insert import layout_supported

        return all(layout_supported(c.shape[-2], c.shape[-1]) for c in caches)
    return True


def swa_active(hp: HParams) -> bool:
    """True when real windowing is both requested (LLMI_SWA_MASK=1) and
    applicable (the checkpoint records a window size and has SWA layers).
    The batched-serving megakernel gates check this (serving.py); the
    single-stream whole-step kernels take a per-layer window array
    (window_array below) and stay eligible under real SWA."""
    if not _swa_mask_enabled() or hp.sliding_window <= 0:
        return False
    return any(hp.is_swa_layer(i) for i in range(hp.block_count))


def window_array(hp: HParams) -> np.ndarray:
    """Per-layer sliding-window sizes [L] int32 for the megakernels:
    hp.swa_window per layer when real SWA is on (LLMI_SWA_MASK=1),
    zeros otherwise (the reference's no-mask parity contract,
    model.cpp:727-748)."""
    on = _swa_mask_enabled()
    return np.array([hp.swa_window(i) if on else 0
                     for i in range(hp.block_count)], dtype=np.int32)


def _masked_scores(q: Array, k_cache: Array, *, pos: Array, hp: HParams,
                   exact: bool = True, window: Array | int = 0,
                   f64_ok: bool = True):
    """QK scores + softcap + ALiBi + causal mask (reference model.cpp:501-518).
    ``window`` > 0 additionally masks keys older than q_pos - window + 1
    (real SWA; see _swa_mask_enabled). ``f64_ok=False`` forces the f32
    dot even in exact mode: callers that vmap this trace must set it —
    vmap's batching rule rebuilds the dot OUTSIDE the enable_x64 scope
    and would silently truncate (with a UserWarning) otherwise.

    Returns (scores [T, Hkv, group, S] f32 with -inf at masked slots,
    valid [T, S] bool)."""
    T, H, Dk = q.shape
    S, Hkv, _ = k_cache.shape
    group = H // Hkv

    # Parity: Q rounds through f16 before the QK dot (model.cpp:504-509);
    # HIGHEST keeps the dot true-f32 on the MXU (TPU defaults to bf16).
    qg = (f16_round(q) if exact else q.astype(jnp.float32)).reshape(T, Hkv, group, Dk)
    k = k_cache.astype(jnp.float32)
    if exact and f64_ok and jax.default_backend() == "cpu" and os.environ.get(
            "LLMI_EXACT_F32_SCORES", "0") != "1":
        # The reference accumulates each score in a C++ DOUBLE
        # (model.cpp:504-509). On CPU, accumulate in f64 too — removes the
        # f32 summation-order noise (~1e-7 relative) that was the residual
        # parity gap; the remaining difference is the reference's per-term
        # f32 product rounding (~1e-8) and libm-vs-XLA expf ulps.
        from jax import enable_x64

        with enable_x64():
            scores = jnp.einsum(
                "tkgd,skd->tkgs", qg.astype(jnp.float64),
                k.astype(jnp.float64),
                preferred_element_type=jnp.float64,
            ).astype(jnp.float32)
    else:
        scores = jnp.einsum(
            "tkgd,skd->tkgs", qg, k, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if exact else None,
        )

    scores = softcap(scores, hp.attn_soft_cap)

    q_pos = pos + jnp.arange(T, dtype=jnp.int32)  # [T]
    key_pos = jnp.arange(S, dtype=jnp.int32)  # [S]
    if hp.f_max_alibi_bias > 0.0:
        slopes = jnp.asarray(_alibi_slopes(H, hp.f_max_alibi_bias)).reshape(Hkv, group)
        bias = (key_pos[None, :] - q_pos[:, None]).astype(jnp.float32)  # [T, S]
        scores = scores + slopes[None, :, :, None] * bias[:, None, None, :]

    valid = key_pos[None, :] <= q_pos[:, None]  # causal over written slots [T, S]
    window = jnp.asarray(window, dtype=jnp.int32)
    # window <= 0 disables (works for both static ints and traced scalars
    # in the scan-over-layers path)
    valid = valid & ((window <= 0)
                     | (key_pos[None, :] > q_pos[:, None] - window))
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    return scores, valid


def _attention(
    q: Array,  # [T, H, Dk] f32, already scaled
    k_cache: Array,  # [S, Hkv, Dk] f16
    v_cache: Array,  # [S, Hkv, Dv] f16
    *,
    pos: Array,
    hp: HParams,
    exact: bool = True,
    window: Array | int = 0,
    f64_ok: bool = True,
) -> Array:
    """Masked-softmax attention over the full cache (reference run_attn,
    model.cpp:478-548), f32 accumulation. Returns [T, H*Dv] f32."""
    T, H, _ = q.shape
    S, Hkv, Dv = v_cache.shape

    # Ragged flash decode (ops/pallas/flash_decode.py) is opt-in: on v5e
    # its per-layer launch overhead loses to one fused XLA softmax up to at
    # least 4k context at batch 1 (the cache read is ~0.1 ms there). It
    # becomes the right tool at batch x multi-k contexts where cache bytes
    # rival weight bytes — wire a batched grid before flipping the default.
    use_flash = os.environ.get("LLMI_FLASH_DECODE", "0") == "1"
    if (
        use_flash
        and not exact
        and T == 1
        and hp.f_max_alibi_bias == 0.0
        and S % 256 == 0
        and jax.default_backend() == "tpu"
    ):
        # serving decode: ragged flash kernel — bytes scale with the actual
        # context length instead of max_seq (ops/pallas/flash_decode.py)
        from ..ops.pallas.flash_decode import flash_decode

        length = jnp.asarray(pos + 1, dtype=jnp.int32)
        window = jnp.asarray(window, dtype=jnp.int32)
        start = jnp.where(window > 0, jnp.maximum(length - window, 0), 0)
        out = flash_decode(
            q[None, 0],  # [1, H, Dk]
            k_cache[None],
            v_cache[None],
            length[None],
            start[None],
            softcap=hp.attn_soft_cap,
        )
        return out.reshape(T, H * Dv)

    scores, _ = _masked_scores(q, k_cache, pos=pos, hp=hp, exact=exact,
                               window=window, f64_ok=f64_ok)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom

    v = v_cache.astype(jnp.float32)
    out = jnp.einsum("tkgs,skd->tkgd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(T, H * Dv)


def _attention_parity(
    q: Array,
    k_cache: Array,
    v_cache: Array,
    *,
    pos: Array,
    hp: HParams,
    exact: bool = True,
    window: Array | int = 0,
    f64_ok: bool = True,
) -> Array:
    """Reference-faithful emulation of the online-softmax attention with
    its f16 V-accumulator (reference model.cpp:501-548, vec_scale_f16 /
    vec_mad_f16 ops.cpp:1084-1099): the accumulator rounds to f16 after
    every scale and every mad, in cache-slot order. One known last-ulp gap:
    the reference accumulates each QK score in a C++ double
    (model.cpp:504-509) while this path uses an f32 einsum — ~1e-7-relative
    on the scores, far inside the golden tolerances. A lax.scan over
    slots — slow by construction, used by the parity harness, never for
    serving."""
    T, H, _ = q.shape
    S, Hkv, Dv = v_cache.shape
    group = H // Hkv
    scores, valid = _masked_scores(q, k_cache, pos=pos, hp=hp, exact=exact,
                                   window=window, f64_ok=f64_ok)

    def step(carry, inputs):
        max_s, s_acc, v_acc = carry  # [T,Hkv,g], [T,Hkv,g], [T,Hkv,g,Dv]
        score_s, v_s, valid_s = inputs  # [T,Hkv,g], [Hkv,Dv], [T]
        gt = score_s > max_s
        new_max = jnp.where(gt, score_s, max_s)
        score_exp = jnp.where(gt, 1.0, jnp.exp(score_s - new_max))
        prev_exp = jnp.where(gt, jnp.exp(max_s - new_max), 1.0)
        # vec_scale_f16 then vec_mad_f16 — f16 rounding after each.
        va = f16_round(v_acc * prev_exp[..., None])
        va = f16_round(va + v_s.astype(jnp.float32)[None, :, None, :] * score_exp[..., None])
        new_s = s_acc * prev_exp + score_exp
        keep = valid_s[:, None, None]
        return (
            jnp.where(keep, new_max, max_s),
            jnp.where(keep, new_s, s_acc),
            jnp.where(keep[..., None], va, v_acc),
        ), None

    init = (
        jnp.full((T, Hkv, group), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((T, Hkv, group), dtype=jnp.float32),
        jnp.zeros((T, Hkv, group, Dv), dtype=jnp.float32),
    )
    xs = (
        jnp.moveaxis(scores, -1, 0),  # [S,T,Hkv,g]
        v_cache,  # [S,Hkv,Dv]
        valid.T,  # [S,T]
    )
    (max_s, s_acc, v_acc), _ = jax.lax.scan(step, init, xs)
    s_inv = jnp.where(s_acc == 0.0, 0.0, 1.0 / jnp.where(s_acc == 0.0, 1.0, s_acc))
    out = f16_round(v_acc) * s_inv[..., None]
    return out.reshape(T, H * Dv)


_ATTENTION_IMPLS = {"fused": _attention, "parity": _attention_parity}


def _per_layer_inputs(hp: HParams, w: ModelWeights, tokens: Array, x: Array, exact: bool = True) -> Optional[Array]:
    """gemma4 AltUp inputs: gather per-layer embeddings, project the hidden
    state into them (reference model.cpp:568-704). Returns [T, L, P] or None."""
    if w.token_embd_per_layer is None:
        return None
    L, P = hp.block_count, hp.embedding_length_per_layer
    rows = embed_rows(w.token_embd_per_layer, tokens)  # [T, L*P]
    inp = rows.reshape(-1, L, P) * jnp.float32(math.sqrt(P))
    if w.per_layer_model_proj is None:
        return inp
    proj = matmul(w.per_layer_model_proj, x, exact=exact)  # [T, L*P]
    proj = proj * jnp.float32(1.0 / math.sqrt(hp.embedding_length))
    proj = proj.reshape(-1, L, P)
    proj = rms_norm(proj, hp.rms_eps) * w.per_layer_proj_norm.astype(jnp.float32)
    return (proj + inp) * jnp.float32(1.0 / math.sqrt(2.0))


def forward(
    hp: HParams,
    w: ModelWeights,
    cache: KVCache,
    tokens: Array,  # [T] int32 (may include right-padding)
    pos: Array,  # scalar int32: absolute position of tokens[0]
    n_valid: Array | int | None = None,  # tokens beyond this are padding
    *,
    attention_impl: Optional[str] = None,  # "fused" | "parity"; None: by ``exact``
    exact: bool = True,  # reference numeric contract vs bf16 serve mode
    mm_impl: str = "auto",  # "xla": no Pallas grids (batched serving, ops/linear.py)
    f64_scores: bool = True,  # False when this trace is vmapped (see _masked_scores)
) -> tuple[Array, KVCache]:
    """One forward step over T tokens. Returns (logits [vocab] f32 for the
    last valid token, updated cache). Call with T=prompt_bucket for prefill
    and T=1 for decode — the same function, jit-specialized per T.

    ``exact=True`` reproduces the reference's numeric contract (f32
    matmuls of exactly-dequantized weights, activation-quant round-trips,
    the f16 rounding points). ``exact=False`` is the serving path: bf16
    weights/activations on the MXU, no contract round-trips — same model,
    ~1e-2 relative logit noise, 10x+ the throughput.

    ``attention_impl`` defaults to the mode's natural kernel: ``exact=True``
    runs the reference-faithful online-softmax with its f16 V-accumulator
    (slow lax.scan — validation only), ``exact=False`` the fused masked
    softmax."""
    if attention_impl is None:
        attention_impl = "parity" if exact else "fused"
    attention = partial(_ATTENTION_IMPLS[attention_impl], exact=exact,
                        f64_ok=f64_scores)
    mm = partial(matmul, exact=exact, mm_impl=mm_impl)
    T = tokens.shape[0]
    n_valid = jnp.asarray(T if n_valid is None else n_valid, dtype=jnp.int32)
    pos = jnp.asarray(pos, dtype=jnp.int32)

    if isinstance(w.layers, LayerWeights):  # stacked homogeneous layers
        if (
            not exact
            and mm_impl == "auto"
            and attention_impl == "fused"
            and T == 1
        ):
            interpret = bool(os.environ.get("LLMI_FUSED_INTERPRET"))
            # flat capacity cache ([L, S, heads*dim], init_cache
            # flat=True): only the streamed kernel speaks this layout;
            # the whole-layer kernels never see it (the capacity engine
            # allocates flat only when it picked the streamed path)
            flat_cache = cache.k.ndim == 3
            if not flat_cache and _megakernel_enabled(hp, w):
                # single-token serve decode: the ENTIRE step as one Pallas
                # call with hand-rolled layer-granularity double buffering
                # (ops/pallas/fused_decode.py).
                from ..ops.pallas.fused_decode import decode_step_megakernel

                logits, kc, vc = decode_step_megakernel(
                    hp, w, cache, tokens[0], pos,
                    windows=window_array(hp), interpret=interpret
                )
                return softcap(logits, hp.final_logit_softcap), KVCache(k=kc, v=vc)
            if not flat_cache and _megakernel_q_enabled(hp, w):
                # lossless variant: group-scaled weights in the masked-dot
                # transposed layout (ops/pallas/fused_decode_q.py).
                from ..ops.pallas.fused_decode_q import decode_step_megakernel_q

                logits, kc, vc = decode_step_megakernel_q(
                    hp, w, cache, tokens[0], pos,
                    windows=window_array(hp), interpret=interpret
                )
                return softcap(logits, hp.final_logit_softcap), KVCache(k=kc, v=vc)
            if _megakernel_stream_enabled(hp, w, max_seq=cache.k.shape[1]):
                # capacity variant: layers too big for whole-layer VMEM
                # double buffering stream in row-tiles instead
                # (ops/pallas/fused_decode_stream.py).
                from ..ops.pallas.fused_decode_stream import (
                    decode_step_megakernel_stream,
                )

                logits, kc, vc = decode_step_megakernel_stream(
                    hp, w, cache, tokens[0], pos,
                    windows=window_array(hp), interpret=interpret
                )
                return softcap(logits, hp.final_logit_softcap), KVCache(k=kc, v=vc)
        return _forward_scan(hp, w, cache, tokens, pos, n_valid, exact=exact,
                             f64_scores=f64_scores)

    # Embedding gather + sqrt(n_embd) scale (reference model.cpp:710-712).
    x = tap("imp_embed", embed_rows(w.token_embd, tokens))  # [T, D] f32
    x = tap("inp_scaled", x * jnp.float32(math.sqrt(hp.embedding_length)))

    inp_per_layer = _per_layer_inputs(hp, w, tokens, x, exact)

    # the gemma4 megakernel engine prefills through this unrolled path
    # with a STACKED cache ([n_kv, S, H, d] arrays, engine.py): iterate
    # per-layer slices and re-stack on return
    stacked_cache = not isinstance(cache.k, (tuple, list))
    new_k = list(cache.k)
    new_v = list(cache.v)

    for i, layer in enumerate(w.layers):
        is_swa = hp.is_swa_layer(i)
        rope_base = hp.rope_base_for_layer(i)
        dk = hp.n_embd_head_k_swa if is_swa else hp.n_embd_head_k
        dv = hp.n_embd_head_v_swa if is_swa else hp.n_embd_head_v

        h = tap(f"attn_norm-{i}", _norm(x, layer.attn_norm, hp.rms_eps))  # [T, D]

        if layer.wqkv is not None:  # load-time fusion (fuse_projections)
            rq, rk = hp.n_head * dk, hp.n_head_kv * dk
            qkv = mm(layer.wqkv, h)
            q_flat, k_flat, v_flat = (
                qkv[:, :rq], qkv[:, rq : rq + rk], qkv[:, rq + rk :]
            )
        else:
            q_flat = k_flat = v_flat = None

        q = tap(f"Qcur-{i}", q_flat if q_flat is not None else mm(layer.wq, h)).reshape(T, hp.n_head, dk)
        if layer.q_norm is not None:
            q = tap(f"Qcur_normed-{i}", _norm(q, layer.q_norm, hp.rms_eps))
        q = rope(q, n_rot=dk, freq_base=rope_base, freq_scale=hp.rope_freq_scale,
                 pos=pos + jnp.arange(T, dtype=jnp.int32))
        q = tap(f"Qcur-{i} (post rope)", q)
        q = tap(f"node_9-{i} (post scale)", q * jnp.float32(hp.f_attention_scale))

        src = hp.kv_source_layer(i)
        if hp.layer_has_kv(i):
            k = tap(f"Kcur-{i}", k_flat if k_flat is not None else mm(layer.wk, h)).reshape(T, hp.n_head_kv, dk)
            if layer.k_norm is not None:
                k = tap(f"Kcur_normed-{i}", _norm(k, layer.k_norm, hp.rms_eps))
            k = rope(k, n_rot=dk, freq_base=rope_base, freq_scale=hp.rope_freq_scale,
                     pos=pos + jnp.arange(T, dtype=jnp.int32))
            k = tap(f"Kcur-{i} (post rope)", k)
            v = tap(f"Vcur-{i}", v_flat if v_flat is not None else mm(layer.wv, h)).reshape(T, hp.n_head_kv, dv)
            if hp.architecture == "gemma4":
                # unweighted V norm (model.cpp:812-827)
                v = tap(f"Vcur_normed-{i}", rms_norm(v, hp.rms_eps))
            new_k[src] = _write_cache(new_k[src], k, pos, n_valid)
            new_v[src] = _write_cache(new_v[src], v, pos, n_valid)

        win = hp.swa_window(i) if _swa_mask_enabled() else 0
        attn = tap(f"kqv_out-{i}", attention(q, new_k[src], new_v[src],
                                             pos=pos, hp=hp, window=win))
        attn = mm(layer.wo, attn)  # output projection [T, D]
        if layer.post_attn_norm is not None:
            attn = tap(f"attn_post_norm-{i}", _norm(attn, layer.post_attn_norm, hp.rms_eps))
        x = tap(f"sa_out-{i}", x + attn)

        h2 = tap(f"ffn_norm-{i}", _norm(x, layer.ffn_norm, hp.rms_eps))
        if layer.w_gate_up is not None:  # load-time fusion
            gu = mm(layer.w_gate_up, h2)
            n_ff = gu.shape[-1] // 2
            gate, up = gu[:, :n_ff], gu[:, n_ff:]
        else:
            gate = tap(f"ffn_gate-{i}", mm(layer.w_gate, h2))
            up = tap(f"ffn_up-{i}", mm(layer.w_up, h2))
        ffn = mm(layer.w_down, tap(f"ffn_geglu-{i}", gelu_tanh(gate) * up))
        ffn = tap(f"ffn_out-{i}", ffn)
        if layer.post_ffw_norm is not None:
            ffn = tap(f"ffn_post_norm-{i}", _norm(ffn, layer.post_ffw_norm, hp.rms_eps))
        x = x + ffn

        if inp_per_layer is not None:
            # gemma4 per-layer-input epilogue (reference model.cpp:927-966).
            x = tap(f"pe_in-{i}", x)
            gate_out = gelu_tanh(mm(layer.per_layer_inp_gate, x))
            gate_out = gate_out * inp_per_layer[:, i, :]
            proj_out = mm(layer.per_layer_proj, gate_out)
            proj_out = rms_norm(proj_out, hp.rms_eps) * layer.per_layer_post_norm.astype(jnp.float32)
            x = tap(f"per_layer_embd_out-{i}", x + proj_out)

        if layer.out_scale is not None:
            x = x * layer.out_scale.reshape(())  # reference model.cpp:969-977
            x = tap(f"out_scaled-{i}", x)
        x = tap(f"l_out-{i}", x)

    # Final norm + tied-embedding logits for the LAST VALID token only
    # (reference model.cpp:983-1034).
    last = jnp.take(x, n_valid - 1, axis=0)
    last = tap("result_norm", _norm(last, w.output_norm, hp.rms_eps))
    logits = mm(w.token_embd, last)
    logits = tap("result_output", softcap(logits, hp.final_logit_softcap))

    if stacked_cache:
        return logits, KVCache(k=jnp.stack(new_k), v=jnp.stack(new_v))
    return logits, KVCache(k=tuple(new_k), v=tuple(new_v))


def _megakernel_enabled(hp: HParams, w: ModelWeights) -> bool:
    """Whole-step decode megakernel gate: backend + env + eligibility
    (ops/pallas/fused_decode.py megakernel_supported)."""
    if os.environ.get("LLMI_NO_FUSED_DECODE", "0") == "1":
        return False
    if jax.default_backend() != "tpu" and not os.environ.get("LLMI_FUSED_INTERPRET"):
        return False
    from ..ops.pallas.fused_decode import megakernel_supported

    return megakernel_supported(hp, w)


def _megakernel_q_enabled(hp: HParams, w: ModelWeights) -> bool:
    """Lossless (masked-dot) whole-step megakernel gate: the layer
    projections must already be in the transposed TQuantTensor layout
    (models/weights.py maskdot_layers, applied at engine load)."""
    if os.environ.get("LLMI_NO_FUSED_DECODE", "0") == "1":
        return False
    if os.environ.get("LLMI_FORCE_CAPACITY", "0") == "1":
        return False  # let the streamed capacity kernel take the step
    if jax.default_backend() != "tpu" and not os.environ.get("LLMI_FUSED_INTERPRET"):
        return False
    from ..quant.device import TQ4Tensor, TQuantTensor

    if not isinstance(w.layers.wqkv, (TQuantTensor, TQ4Tensor)):
        return False
    from ..ops.pallas.fused_decode_q import megakernel_q_supported

    return megakernel_q_supported(hp, w)


def _megakernel_stream_enabled(hp: HParams, w: ModelWeights, *, max_seq=None) -> bool:
    """Streamed capacity megakernel gate (ops/pallas/fused_decode_stream.py):
    transposed maskdot layers whose whole-layer set can't double-buffer in
    VMEM but whose projections tile into streamable lane-slices."""
    if os.environ.get("LLMI_NO_FUSED_DECODE", "0") == "1":
        return False
    if jax.default_backend() != "tpu" and not os.environ.get("LLMI_FUSED_INTERPRET"):
        return False
    from ..quant.device import TQ4Tensor, TQuantTensor

    if not isinstance(w.layers.wqkv, (TQuantTensor, TQ4Tensor)):
        return False
    from ..ops.pallas.fused_decode_stream import megakernel_stream_supported

    return megakernel_stream_supported(hp, w, max_seq=max_seq)


def forward_batched_decode(
    hp: HParams,
    w: ModelWeights,
    cache: KVCache,  # leading batch dim: k[i] [B, S, Hkv, dk]
    tokens: Array,   # [B] int32 (parked slots hold arbitrary ids)
    pos: Array,      # [B] int32; parked slots use pos >= S (writes drop)
) -> tuple[Array, KVCache]:
    """One decode step for B concurrent requests as ONE batched program:
    every weight matmul is a single [B, .] GEMM (the weight streams from
    HBM once per step regardless of batch) and attention is the ragged
    flash-decode kernel whose HBM traffic scales with each request's live
    context, not B x max_seq (ops/pallas/flash_decode.py). This is the
    serving-path replacement for vmapping the single-sequence forward
    (which lowers Pallas grids per-lane and reads whole caches).

    Serve-numerics only (bf16 GEMMs / W8A8); parity mode uses the
    single-sequence forward. Returns (logits [B, vocab] f32, cache)."""
    mm = partial(matmul, exact=False, mm_impl="xla")
    B = tokens.shape[0]
    pos = jnp.asarray(pos, dtype=jnp.int32)
    lanes = jnp.arange(B, dtype=jnp.int32)

    use_flash = (
        jax.default_backend() == "tpu"
        and hp.f_max_alibi_bias == 0.0
        and cache.k[0].shape[1] % 256 == 0
    )

    x = embed_rows(w.token_embd, tokens)  # [B, D] f32
    x = x * jnp.float32(math.sqrt(hp.embedding_length))

    inp_per_layer = _per_layer_inputs(hp, w, tokens, x, exact=False)

    new_k = list(cache.k)
    new_v = list(cache.v)

    for i, layer in enumerate(w.layers):
        is_swa = hp.is_swa_layer(i)
        rope_base = hp.rope_base_for_layer(i)
        dk = hp.n_embd_head_k_swa if is_swa else hp.n_embd_head_k
        dv = hp.n_embd_head_v_swa if is_swa else hp.n_embd_head_v

        has_kv = hp.layer_has_kv(i)  # shared-KV layers own no K/V weights
        h = _norm(x, layer.attn_norm, hp.rms_eps)  # [B, D]
        if layer.wqkv is not None:
            rq, rk = hp.n_head * dk, hp.n_head_kv * dk
            qkv = mm(layer.wqkv, h)
            q_flat, k_flat, v_flat = (
                qkv[:, :rq], qkv[:, rq : rq + rk], qkv[:, rq + rk :]
            )
        else:
            q_flat = mm(layer.wq, h)
            k_flat = mm(layer.wk, h) if has_kv else None
            v_flat = mm(layer.wv, h) if has_kv else None

        q = q_flat.reshape(B, hp.n_head, dk)
        if layer.q_norm is not None:
            q = _norm(q, layer.q_norm, hp.rms_eps)
        q = rope(q, n_rot=dk, freq_base=rope_base, freq_scale=hp.rope_freq_scale, pos=pos)
        q = q * jnp.float32(hp.f_attention_scale)

        src = hp.kv_source_layer(i)
        if has_kv:
            k = k_flat.reshape(B, hp.n_head_kv, dk)
            if layer.k_norm is not None:
                k = _norm(k, layer.k_norm, hp.rms_eps)
            k = rope(k, n_rot=dk, freq_base=rope_base,
                     freq_scale=hp.rope_freq_scale, pos=pos)
            v = v_flat.reshape(B, hp.n_head_kv, dv)
            if hp.architecture == "gemma4":
                v = rms_norm(v, hp.rms_eps)
            # per-lane row insert at (b, pos[b]); parked lanes (pos >= S)
            # drop. On TPU the XLA scatter is NOT in place (it copies the
            # whole [B, S, Hkv, d] cache per layer); use the aliased
            # Pallas row-DMA kernel instead (ops/pallas/kv_insert.py)
            if _use_inplace_insert(new_k[src], new_v[src]):
                from ..ops.pallas.kv_insert import insert_rows

                S_src = new_k[src].shape[1]
                rows_total = B * S_src
                # negatives map to the drop sentinel so the kernel and
                # the scatter share one drop rule (the scatter would
                # wrap them per JAX .at semantics)
                idx = jnp.where((pos >= 0) & (pos < S_src),
                                lanes * S_src + pos, rows_total)
                interp = jax.default_backend() != "tpu"
                new_k[src] = insert_rows(
                    new_k[src].reshape((rows_total,) + new_k[src].shape[2:]),
                    k.astype(new_k[src].dtype), idx,
                    interpret=interp).reshape(new_k[src].shape)
                new_v[src] = insert_rows(
                    new_v[src].reshape((rows_total,) + new_v[src].shape[2:]),
                    v.astype(new_v[src].dtype), idx,
                    interpret=interp).reshape(new_v[src].shape)
            else:
                new_k[src] = new_k[src].at[lanes, pos].set(
                    k.astype(new_k[src].dtype), mode="drop")
                new_v[src] = new_v[src].at[lanes, pos].set(
                    v.astype(new_v[src].dtype), mode="drop")

        S = new_k[src].shape[1]
        lengths = jnp.where(pos >= S, 0, pos + 1)
        win = hp.swa_window(i) if _swa_mask_enabled() else 0
        if use_flash:
            from ..ops.pallas.flash_decode import flash_decode

            starts = (jnp.maximum(lengths - win, 0) if win > 0
                      else jnp.zeros_like(lengths))
            attn = flash_decode(
                q, new_k[src], new_v[src], lengths, starts,
                softcap=hp.attn_soft_cap or 0.0
            ).reshape(B, hp.n_head * dv)
        else:
            attn = jax.vmap(
                lambda qb, kb, vb, pb: _attention(
                    qb[None], kb, vb, pos=pb, hp=hp, exact=False, window=win
                )[0]
            )(q, new_k[src], new_v[src], jnp.minimum(pos, S - 1))

        attn = mm(layer.wo, attn)
        if layer.post_attn_norm is not None:
            attn = _norm(attn, layer.post_attn_norm, hp.rms_eps)
        x = x + attn

        h2 = _norm(x, layer.ffn_norm, hp.rms_eps)
        if layer.w_gate_up is not None:
            gu = mm(layer.w_gate_up, h2)
            n_ff = gu.shape[-1] // 2
            gate, up = gu[:, :n_ff], gu[:, n_ff:]
        else:
            gate = mm(layer.w_gate, h2)
            up = mm(layer.w_up, h2)
        ffn = mm(layer.w_down, gelu_tanh(gate) * up)
        if layer.post_ffw_norm is not None:
            ffn = _norm(ffn, layer.post_ffw_norm, hp.rms_eps)
        x = x + ffn

        if inp_per_layer is not None:
            gate_out = gelu_tanh(mm(layer.per_layer_inp_gate, x))
            gate_out = gate_out * inp_per_layer[:, i, :]
            proj_out = mm(layer.per_layer_proj, gate_out)
            proj_out = rms_norm(proj_out, hp.rms_eps) * layer.per_layer_post_norm.astype(jnp.float32)
            x = x + proj_out
        if layer.out_scale is not None:
            x = x * layer.out_scale.reshape(())

    x = _norm(x, w.output_norm, hp.rms_eps)  # [B, D]
    logits = mm(w.token_embd, x)  # [B, vocab]
    logits = softcap(logits, hp.final_logit_softcap)
    return logits, KVCache(k=tuple(new_k), v=tuple(new_v))


def forward_batched_decode_paged(
    hp: HParams,
    w: ModelWeights,
    pools: KVCache,  # k[i]: [n_pages, PAGE, Hkv, dk] shared page pool
    table: Array,    # [B, max_blocks] int32 page ids; >= n_pages = unassigned
    tokens: Array,   # [B] int32
    pos: Array,      # [B] int32; parked slots use pos >= max_blocks*PAGE
    ring_layers: tuple[int, ...] = (),  # KV layers allocated as SWA rings
    nb_cap: int | None = None,  # static bound on live blocks (flash grid)
) -> tuple[Array, KVCache]:
    """One batched decode step over a PAGED KV cache: HBM capacity (and
    attention traffic) scale with the pool's live tokens, not
    B x max_seq — the serving path for long-context batches whose dense
    per-slot caches wouldn't fit HBM (reference contrast: one growing
    cache, one request, model.cpp:461-474). Weight matmuls are identical
    to forward_batched_decode; the K/V row scatters indirect through the
    page table and attention runs the paged ragged flash-decode kernel
    (ops/pallas/flash_decode.py paged_flash_decode).

    Under real windowing (LLMI_SWA_MASK=1) a SWA layer's pool may be a
    per-lane RING of ceil(window/PAGE)+1 pages (serving.py allocates it;
    recognized here by its shape, B * ring rows): block j of lane b lives
    at pool row b*ring + j%ring, so the layer's KV footprint is bounded by
    the window instead of the full context. Ring rows are only ever read
    inside the live window [start, length) — the window mask guarantees
    any aliased (overwritten) block is masked."""
    mm = partial(matmul, exact=False, mm_impl="xla")
    B = tokens.shape[0]
    pos = jnp.asarray(pos, dtype=jnp.int32)
    lanes = jnp.arange(B, dtype=jnp.int32)
    page = pools.k[0].shape[1]
    max_blocks = table.shape[1]
    n_pages = pools.k[0].shape[0]
    parked = pos >= max_blocks * page
    blk = jnp.minimum(pos // page, max_blocks - 1)
    page_of = jnp.where(parked, n_pages, table[lanes, blk])  # OOB -> drop
    off = pos % page
    lengths = jnp.where(parked, 0, pos + 1)

    use_flash = jax.default_backend() == "tpu" and hp.f_max_alibi_bias == 0.0

    x = embed_rows(w.token_embd, tokens)
    x = x * jnp.float32(math.sqrt(hp.embedding_length))

    inp_per_layer = _per_layer_inputs(hp, w, tokens, x, exact=False)

    new_k = list(pools.k)
    new_v = list(pools.v)

    for i, layer in enumerate(w.layers):
        is_swa = hp.is_swa_layer(i)
        rope_base = hp.rope_base_for_layer(i)
        dk = hp.n_embd_head_k_swa if is_swa else hp.n_embd_head_k
        dv = hp.n_embd_head_v_swa if is_swa else hp.n_embd_head_v

        has_kv = hp.layer_has_kv(i)
        h = _norm(x, layer.attn_norm, hp.rms_eps)
        if layer.wqkv is not None:
            rq, rk = hp.n_head * dk, hp.n_head_kv * dk
            qkv = mm(layer.wqkv, h)
            q_flat, k_flat, v_flat = (
                qkv[:, :rq], qkv[:, rq : rq + rk], qkv[:, rq + rk :]
            )
        else:
            q_flat = mm(layer.wq, h)
            k_flat = mm(layer.wk, h) if has_kv else None
            v_flat = mm(layer.wv, h) if has_kv else None

        q = q_flat.reshape(B, hp.n_head, dk)
        if layer.q_norm is not None:
            q = _norm(q, layer.q_norm, hp.rms_eps)
        q = rope(q, n_rot=dk, freq_base=rope_base, freq_scale=hp.rope_freq_scale, pos=pos)
        q = q * jnp.float32(hp.f_attention_scale)

        src = hp.kv_source_layer(i)
        win = hp.swa_window(i) if _swa_mask_enabled() else 0
        ring = (-(-win // page) + 1) if win > 0 else 0
        is_ring = src in ring_layers
        assert not is_ring or (ring > 0 and new_k[src].shape[0] == B * ring)
        if is_ring:
            # per-lane ring addressing: block j -> pool row b*ring + j%ring
            table_i = (lanes[:, None] * ring
                       + (jnp.arange(max_blocks, dtype=jnp.int32) % ring)[None, :])
            n_pages_i = B * ring
            page_of_i = jnp.where(parked, n_pages_i,
                                  lanes * ring + blk % ring)
        else:
            table_i = table
            page_of_i = page_of
        # split-d pool layout (serving.py _pool): a degenerate real
        # geometry [Hkv=1, d=m*128] is stored [*, PAGE, m, 128] so the
        # in-place row insert Mosaic-lowers with NO re-tiling — the
        # [1,256]<->[2,128] XLA reshapes around the insert measured
        # ~3.7 ms/step of pure copy at batch 32
        dsplit = new_k[src].shape[2:] != (hp.n_head_kv, dk)
        if has_kv:
            k = k_flat.reshape(B, hp.n_head_kv, dk)
            if layer.k_norm is not None:
                k = _norm(k, layer.k_norm, hp.rms_eps)
            k = rope(k, n_rot=dk, freq_base=rope_base,
                     freq_scale=hp.rope_freq_scale, pos=pos)
            v = v_flat.reshape(B, hp.n_head_kv, dv)
            if hp.architecture == "gemma4":
                v = rms_norm(v, hp.rms_eps)
            if dsplit:
                # free view: [B, 1, m*128] -> [B, m, 128] (row-major)
                k = k.reshape((B,) + new_k[src].shape[2:])
                v = v.reshape((B,) + new_v[src].shape[2:])
            # per-lane row insert at (page_of[b], off[b]); parked lanes
            # drop. Same scatter-copies-the-pool problem as the dense
            # path: measured 9.1 ms/step of pool copies at batch 32 x 4k
            # before the in-place kernel
            if _use_inplace_insert(new_k[src], new_v[src]):
                from ..ops.pallas.kv_insert import insert_rows

                pool_rows_i = new_k[src].shape[0] * page
                # negatives -> drop sentinel (shared drop rule with the
                # scatter path; see the dense-lane insert above)
                idx = jnp.where((page_of_i >= 0) & (off >= 0)
                                & (page_of_i < new_k[src].shape[0]),
                                page_of_i * page + off, pool_rows_i)
                interp = jax.default_backend() != "tpu"
                new_k[src] = insert_rows(
                    new_k[src].reshape((pool_rows_i,) + new_k[src].shape[2:]),
                    k.astype(new_k[src].dtype), idx,
                    interpret=interp).reshape(new_k[src].shape)
                new_v[src] = insert_rows(
                    new_v[src].reshape((pool_rows_i,) + new_v[src].shape[2:]),
                    v.astype(new_v[src].dtype), idx,
                    interpret=interp).reshape(new_v[src].shape)
            else:
                new_k[src] = new_k[src].at[page_of_i, off].set(
                    k.astype(new_k[src].dtype), mode="drop")
                new_v[src] = new_v[src].at[page_of_i, off].set(
                    v.astype(new_v[src].dtype), mode="drop")

        if use_flash:
            from ..ops.pallas.flash_decode import paged_flash_decode

            starts = (jnp.maximum(lengths - win, 0) if win > 0
                      else jnp.zeros_like(lengths))
            attn = paged_flash_decode(
                q, new_k[src], new_v[src], table_i, lengths, starts,
                softcap=hp.attn_soft_cap or 0.0, dsplit=dsplit,
                nb_cap=nb_cap,
            ).reshape(B, hp.n_head * dv)
        else:
            # gather-to-dense fallback (CPU tests / ALiBi): [B, S_max, ...]
            # (a dsplit pool's [m, 128] trailing dims re-view row-major
            # back to [Hkv=1, d] — same bytes)
            kd = new_k[src][table_i].reshape(B, max_blocks * page, hp.n_head_kv, dk)
            vd = new_v[src][table_i].reshape(B, max_blocks * page, hp.n_head_kv, dv)
            attn = jax.vmap(
                lambda qb, kb, vb, pb: _attention(
                    qb[None], kb, vb, pos=pb, hp=hp, exact=False, window=win
                )[0]
            )(q, kd, vd, jnp.minimum(pos, max_blocks * page - 1))

        attn = mm(layer.wo, attn)
        if layer.post_attn_norm is not None:
            attn = _norm(attn, layer.post_attn_norm, hp.rms_eps)
        x = x + attn

        h2 = _norm(x, layer.ffn_norm, hp.rms_eps)
        if layer.w_gate_up is not None:
            gu = mm(layer.w_gate_up, h2)
            n_ff = gu.shape[-1] // 2
            gate, up = gu[:, :n_ff], gu[:, n_ff:]
        else:
            gate = mm(layer.w_gate, h2)
            up = mm(layer.w_up, h2)
        ffn = mm(layer.w_down, gelu_tanh(gate) * up)
        if layer.post_ffw_norm is not None:
            ffn = _norm(ffn, layer.post_ffw_norm, hp.rms_eps)
        x = x + ffn

        if inp_per_layer is not None:
            gate_out = gelu_tanh(mm(layer.per_layer_inp_gate, x))
            gate_out = gate_out * inp_per_layer[:, i, :]
            proj_out = mm(layer.per_layer_proj, gate_out)
            proj_out = rms_norm(proj_out, hp.rms_eps) * layer.per_layer_post_norm.astype(jnp.float32)
            x = x + proj_out
        if layer.out_scale is not None:
            x = x * layer.out_scale.reshape(())

    x = _norm(x, w.output_norm, hp.rms_eps)
    logits = mm(w.token_embd, x)
    logits = softcap(logits, hp.final_logit_softcap)
    return logits, KVCache(k=tuple(new_k), v=tuple(new_v))


def _forward_scan(
    hp: HParams,
    w: ModelWeights,
    cache: KVCache,
    tokens: Array,
    pos: Array,
    n_valid: Array,
    *,
    exact: bool,
    f64_scores: bool = True,
) -> tuple[Array, KVCache]:
    """Scan-over-layers forward for homogeneous stacked weights
    (models/weights.py stack_layers). One compiled layer body instead of
    n_layers unrolled copies — ~n_layers-fold faster compiles, identical
    math. Requires every layer to own its KV and uniform head dims
    (layers_stackable); heterogeneous models use the unrolled path."""
    mm = partial(matmul, exact=exact)
    attention = partial(_ATTENTION_IMPLS["parity" if exact else "fused"],
                        exact=exact, f64_ok=f64_scores)
    T = tokens.shape[0]
    L = hp.block_count

    x = embed_rows(w.token_embd, tokens)  # [T, D] f32
    x = x * jnp.float32(math.sqrt(hp.embedding_length))

    rope_bases = jnp.asarray(
        np.array([hp.rope_base_for_layer(i) for i in range(L)], dtype=np.float32)
    )
    windows = jnp.asarray(
        np.array([hp.swa_window(i) if _swa_mask_enabled() else 0
                  for i in range(L)], dtype=np.int32)
    )
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    pos_vec = pos + jnp.arange(T, dtype=jnp.int32)

    # flat capacity cache ([L, S, heads*dim] at rest, see init_cache):
    # view each layer's slice 4-D inside the body, flatten back for the
    # carry — prefill-only cost; decode keeps the kernel-native layout
    flat_cache = cache.k.ndim == 3

    def body(x, inputs):
        lw, k_c, v_c, rope_base, win = inputs
        if flat_cache:
            k_c = k_c.reshape(k_c.shape[0], hp.n_head_kv, dk)
            v_c = v_c.reshape(v_c.shape[0], hp.n_head_kv, dv)

        h = _norm(x, lw.attn_norm, hp.rms_eps)
        if lw.wqkv is not None:  # load-time fusion (fuse_projections)
            rq, rk = hp.n_head * dk, hp.n_head_kv * dk
            qkv = mm(lw.wqkv, h)
            q = qkv[:, :rq].reshape(T, hp.n_head, dk)
            k = qkv[:, rq : rq + rk].reshape(T, hp.n_head_kv, dk)
            v = qkv[:, rq + rk :].reshape(T, hp.n_head_kv, dv)
        else:
            q = mm(lw.wq, h).reshape(T, hp.n_head, dk)
            k = mm(lw.wk, h).reshape(T, hp.n_head_kv, dk)
            v = mm(lw.wv, h).reshape(T, hp.n_head_kv, dv)
        if lw.q_norm is not None:
            q = _norm(q, lw.q_norm, hp.rms_eps)
        q = rope(q, n_rot=dk, freq_base=rope_base, freq_scale=hp.rope_freq_scale, pos=pos_vec)
        q = q * jnp.float32(hp.f_attention_scale)

        if lw.k_norm is not None:
            k = _norm(k, lw.k_norm, hp.rms_eps)
        k = rope(k, n_rot=dk, freq_base=rope_base, freq_scale=hp.rope_freq_scale, pos=pos_vec)
        if hp.architecture == "gemma4":
            v = rms_norm(v, hp.rms_eps)
        k_c = _write_cache(k_c, k, pos, n_valid)
        v_c = _write_cache(v_c, v, pos, n_valid)

        attn = attention(q, k_c, v_c, pos=pos, hp=hp, window=win)
        attn = mm(lw.wo, attn)
        if lw.post_attn_norm is not None:
            attn = _norm(attn, lw.post_attn_norm, hp.rms_eps)
        x = x + attn

        h2 = _norm(x, lw.ffn_norm, hp.rms_eps)
        if lw.w_gate_up is not None:
            gu = mm(lw.w_gate_up, h2)
            n_ff = gu.shape[-1] // 2
            ffn = mm(lw.w_down, gelu_tanh(gu[:, :n_ff]) * gu[:, n_ff:])
        else:
            ffn = mm(lw.w_down, gelu_tanh(mm(lw.w_gate, h2)) * mm(lw.w_up, h2))
        if lw.post_ffw_norm is not None:
            ffn = _norm(ffn, lw.post_ffw_norm, hp.rms_eps)
        x = x + ffn

        if lw.out_scale is not None:
            x = x * lw.out_scale.reshape(())
        if flat_cache:
            k_c = k_c.reshape(k_c.shape[0], -1)
            v_c = v_c.reshape(v_c.shape[0], -1)
        return x, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (w.layers, cache.k, cache.v, rope_bases, windows))

    last = jnp.take(x, n_valid - 1, axis=0)
    last = _norm(last, w.output_norm, hp.rms_eps)
    logits = mm(w.token_embd, last)
    logits = softcap(logits, hp.final_logit_softcap)
    return logits, KVCache(k=new_k, v=new_v)
