"""Inference engine: jit-compiled prefill/decode over a preallocated cache.

The TPU-native replacement of the reference's decode driver (reference
main.cpp:160-234). Differences by design:

  - ``forward`` is compiled ONCE per (bucket) shape; prompts are padded to
    power-of-two buckets (with masked cache writes, models/gemma.py) so a
    new prompt length doesn't recompile, and prefill runs as one batched
    GEMM pass instead of token-by-token GEMVs.
  - Decode runs in on-device CHUNKS: a lax.scan of N forward+argmax steps
    per dispatch, so the host round-trip (which dominates single-token
    stepping through a tunnel/PCIe) is amortized N ways. Only the sampled
    token ids cross back per chunk.
  - The KV cache is donated through the step so XLA updates it in place
    in HBM instead of copying.

Two numeric modes (models/gemma.py `exact`):
  - "parity":  the reference's numeric contract — cross-engine validation.
  - "serve":   bf16 weights on the MXU — the production path.
"""

from __future__ import annotations

import dataclasses
import os
import time

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .gguf.reader import GGUFFile
from .models.gemma import KVCache, forward, init_cache
from .models.hparams import HParams
from .models.weights import (
    ModelWeights,
    fuse_projections,
    layers_stackable,
    load_weights,
    stack_layers,
)
from .sampling import SamplingConfig, sample
from .tokenizer import Tokenizer

DEFAULT_MAX_SEQ = 4096
MIN_PREFILL_BUCKET = 32
DECODE_CHUNK = 16


def prefill_bucket(n: int) -> int:
    """Round a prompt length up to the next power-of-two bucket."""
    b = MIN_PREFILL_BUCKET
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class GenerationStats:
    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_seconds: float = 0.0
    decode_seconds: float = 0.0
    decode_steps: int = 0  # device steps executed (>= generated_tokens)
    # captured for the -v top-10 dump; a DEVICE array (np-convert lazily —
    # an eager fetch would add a host round trip to every TTFT)
    first_logits: Optional[np.ndarray] = None

    @property
    def decode_tok_per_s(self) -> float:
        return self.decode_steps / self.decode_seconds if self.decode_seconds else 0.0


class Engine:
    """Single-model generation engine (greedy sampling, batch 1).

    Mirrors the reference CLI's capabilities; continuous batching and
    multi-chip serving build on the same jitted step functions.
    """

    def __init__(
        self,
        gguf: GGUFFile | str,
        *,
        max_seq: int = DEFAULT_MAX_SEQ,
        mode: str = "serve",  # "serve" | "serve-q" | "serve-q8" | "parity"
        sharding_fn=None,
        cache_sharding=None,
        decode_chunk: int = DECODE_CHUNK,
        sampling: SamplingConfig | None = None,
        seed: int = 0,
        tp_mesh=None,
    ):
        """``tp_mesh``: a Mesh with a 'model' axis routes serve-q8 DECODE
        through the tensor-parallel whole-step megakernel (one Pallas call
        per chip per step, in-kernel all-reduces —
        ops/pallas/fused_decode_tp.py). Weights are re-packed into
        per-device shards at load; prefill runs the replicated XLA path
        (once per request, weight-stream bound either way). Mutually
        exclusive with ``sharding_fn`` (the per-op GSPMD TP path)."""
        if isinstance(gguf, str):
            gguf = GGUFFile(gguf)
        if mode not in ("serve", "serve-q", "serve-q4", "serve-q8", "parity"):
            raise ValueError(f"unknown engine mode {mode!r}")
        if tp_mesh is not None:
            if sharding_fn is not None:
                raise ValueError("tp_mesh and sharding_fn are mutually exclusive")
            if mode not in ("serve-q8", "serve-q", "serve-q4"):
                raise ValueError(
                    "tp_mesh requires mode 'serve-q8' (rowq8 TP kernel) or "
                    "'serve-q'/'serve-q4' (maskdot TP kernel)")
        self.gguf = gguf
        self.mode = mode
        exact = mode == "parity"
        # serve:   dequantize to bf16 at load (pure-XLA fast path)
        # serve-q: keep packed int8+scales; fused Pallas dequant-matmul on
        #          decode (1 byte/weight of HBM traffic instead of 2)
        load_mode = {
            "serve": "bf16",           # dequantized bf16, pure-XLA MXU path
            "serve-q": "packed-serve",  # packed int8+group scales, fused kernel
            "serve-q4": "packed-q4",    # nibble-packed 4-bit, lossless, 0.5 B/w
            "serve-q8": "rowq8",        # per-row int8 requant, fastest kernel
            "parity": "packed",
        }[mode]
        self.weights = None
        self._capacity = False
        if (
            mode in ("serve-q", "serve-q4")
            and sharding_fn is None
            and os.environ.get("LLMI_NO_FUSED_DECODE", "0") != "1"
            and (jax.default_backend() == "tpu" or os.environ.get("LLMI_FUSED_INTERPRET"))
        ):
            # Capacity-class checkpoints (12B+): the whole-layer megakernel
            # can't double-buffer a layer in VMEM, and the standard load +
            # device-side maskdot repack would transiently need ~2x the
            # weights in HBM. Decide from the tensor directory alone, load
            # the transposed layout host-side, and decode with the STREAMED
            # megakernel (ops/pallas/fused_decode_stream.py).
            from .models.weights import (
                load_maskdot_stacked,
                maskdot_layer_bytes_estimate,
            )
            from .ops.pallas.fused_decode_q import whole_layer_fits

            q4 = mode == "serve-q4"
            est = maskdot_layer_bytes_estimate(gguf, q4=q4)
            # LLMI_FORCE_CAPACITY=1: take the capacity load + streamed
            # kernel even when layers fit the whole-layer budget — lets
            # the streamed path be validated/profiled on small models.
            force = os.environ.get("LLMI_FORCE_CAPACITY", "0") == "1"
            # apply megakernel_q_supported's FULL bound (via the shared
            # whole_layer_fits helper), not just the layer term: a
            # mid-size model in the gap band would otherwise get neither
            # the whole-layer nor the streamed kernel and silently fall
            # to the slow per-matmul path.
            from .models.hparams import load_hparams
            from .ops.pallas.fused_decode import _LOGITS_TILE

            hp_probe = load_hparams(gguf.metadata)
            D_probe = hp_probe.embedding_length
            V_probe = hp_probe.vocab_size or _LOGITS_TILE
            if est is not None and (not whole_layer_fits(est, D_probe, V_probe) or force):
                # directory-only structural precheck: reject the capacity
                # path BEFORE the multi-GB host repack + upload
                from .ops.pallas.fused_decode_stream import (
                    stream_supported_from_directory,
                )

                res = None
                if stream_supported_from_directory(
                        gguf, hp_probe, q4=q4, max_seq=max_seq):
                    # RAW-f16 scales (exact — the checkpoint stores d as
                    # f16) would halve the capacity stream's scale bytes
                    # (~0.67 GB/step on the 12B), and the full path is
                    # built + bit-exactness-tested — but THIS toolchain's
                    # Mosaic rejects f16 in kernels ("Unsupported type in
                    # mosaic dialect: 'f16'", measured Aug 20), so it is
                    # opt-in until the compiler supports it.
                    res = load_maskdot_stacked(
                        gguf, q4=q4,
                        scale_f16=os.environ.get(
                            "LLMI_CAP_SCALE_F16", "0") == "1")
                if res is not None:
                    from .ops.pallas.fused_decode_stream import (
                        megakernel_stream_supported,
                    )

                    if megakernel_stream_supported(res[0], res[1], max_seq=max_seq):
                        self.hparams, self.weights = res
                        self._stacked = True
                        self._capacity = True
                    else:
                        del res  # free HBM before the fallback load
        if self.weights is None:
            self.hparams, self.weights = load_weights(
                gguf, sharding_fn=sharding_fn, mode=load_mode
            )
        if mode != "parity" and not self._capacity:
            # fewer kernel launches per step; identical results (row concat
            # commutes with the contraction). Parity keeps per-tensor taps.
            self.weights = fuse_projections(self.weights)
        # Stacked [n_layers, ...] weights serve two consumers: the
        # scan-over-layers forward (prefill; opt-in for other modes via
        # LLMI_SCAN_LAYERS=1) and the whole-step decode megakernel
        # (ops/pallas/fused_decode.py), which serve-q8 uses by default on
        # the TPU backend. Both read the SAME stacked arrays — one weight
        # copy in HBM.
        want_scan = os.environ.get("LLMI_SCAN_LAYERS", "0") == "1"
        want_mega = (
            mode in ("serve-q8", "serve-q", "serve-q4")
            and sharding_fn is None  # megakernel is single-chip; TP uses GSPMD
            and os.environ.get("LLMI_NO_FUSED_DECODE", "0") != "1"
            and (jax.default_backend() == "tpu" or os.environ.get("LLMI_FUSED_INTERPRET"))
        )
        self._g4_prefill_w = None
        if (want_mega and mode == "serve-q8" and not self._capacity
                and tp_mesh is None
                and self.hparams.architecture == "gemma4"):
            # gemma4 fast path: megakernel DECODE over zero-padded stacked
            # layers (ops/pallas/fused_decode.py gemma4 static features —
            # per-layer-input epilogue, shared-KV indexing, V norm,
            # out_scale); PREFILL keeps the unrolled per-op weights (the
            # scan-over-layers path cannot index shared-KV caches). Costs
            # a second weight copy in HBM — gemma4 checkpoints are
            # 3n-class (<= a few GB rowq8).
            from .models.gemma import _megakernel_enabled
            from .models.weights import stack_layers_gemma4

            g4 = stack_layers_gemma4(self.hparams, self.weights)
            if g4 is not None and _megakernel_enabled(self.hparams, g4):
                self._g4_prefill_w = self.weights
                self.weights = g4
                want_mega = want_scan = False
        self._stacked = self._g4_prefill_w is not None or self._capacity or (
            (want_scan or want_mega) and mode != "parity"
            and layers_stackable(self.hparams, self.weights.layers)
        )
        if self._capacity:
            want_mega = want_scan = False  # already stacked + transposed
        if self._stacked and want_mega and not want_scan:
            # megakernel eligibility is checked on a FIRST-LAYER probe
            # BEFORE stack_layers: stacking is a full second weight copy
            # in HBM, and paying it just to discover a 12B-class layer
            # set can't fit VMEM OOMs the chip.
            probe = dataclasses.replace(
                self.weights, layers=self.weights.layers[0]
            )
            if mode in ("serve-q", "serve-q4"):
                from .ops.pallas.fused_decode_q import megakernel_q_supported

                self._stacked = megakernel_q_supported(self.hparams, probe)
            else:
                from .models.gemma import _megakernel_enabled

                self._stacked = _megakernel_enabled(self.hparams, probe)
        if self._stacked and not self._capacity and self._g4_prefill_w is None:
            stacked = dataclasses.replace(
                self.weights, layers=stack_layers(self.weights.layers)
            )
            if want_mega and mode in ("serve-q", "serve-q4"):
                # lossless megakernel: repack the stacked projections into
                # the masked-dot transposed layout (exact values; decode
                # runs ops/pallas/fused_decode_q.py, prefill dequantizes
                # into XLA GEMMs). serve-q4 nibble-packs 4-bit parts
                # (TQ4Tensor, 0.5 B/weight, unpacked in-kernel).
                # Ineligible checkpoints keep the strided layout +
                # per-matmul fused kernels.
                from .models.gemma import _megakernel_q_enabled
                from .models.weights import maskdot_layers
                from .ops.pallas.fused_decode_q import megakernel_q_supported

                cand = None
                if megakernel_q_supported(self.hparams, stacked):
                    # the transform itself is a full transient weight copy;
                    # never attempt it on an ineligible (e.g. 12B) layer set.
                    # Under TP the contraction-sharded parts pick a block
                    # size whose whole blocks divide the shard
                    # (fused_decode_q_tp.py).
                    cand = maskdot_layers(
                        stacked, q4=(mode == "serve-q4"),
                        shard=tp_mesh.shape["model"] if tp_mesh is not None else 1)
                if cand is not None and _megakernel_q_enabled(self.hparams, cand):
                    self.weights = cand
                else:
                    self._stacked = want_scan
                    if want_scan:
                        self.weights = stacked
            else:
                if want_mega and not want_scan:
                    from .models.gemma import _megakernel_enabled

                    if not _megakernel_enabled(self.hparams, stacked):
                        stacked = None  # ineligible: keep the unrolled layout
                if stacked is not None:
                    self.weights = stacked
                else:
                    self._stacked = False
        self._tp = None
        self._tp_q = False
        if tp_mesh is not None:
            n_tp = tp_mesh.shape["model"]
            if mode == "serve-q8":
                from .ops.pallas.fused_decode_tp import (
                    shard_rowq8_for_tp,
                    tp_megakernel_supported,
                )

                if not (self._stacked and not self._capacity
                        and tp_megakernel_supported(self.hparams, self.weights, n_tp)):
                    raise ValueError(
                        "checkpoint/geometry not eligible for the TP megakernel "
                        "(needs stacked rowq8 layers and clean head/vocab/ffn "
                        f"splits over {n_tp} devices)")
                packed_tp, geom_tp = shard_rowq8_for_tp(
                    self.hparams, self.weights, n_tp)
            else:
                # serve-q / serve-q4: the lossless maskdot TP megakernel
                # (ops/pallas/fused_decode_q_tp.py) — the 27B-class
                # capacity format sharded with in-kernel all-reduces
                from .ops.pallas.fused_decode_q_tp import (
                    shard_maskdot_for_tp,
                    tp_megakernel_q_supported,
                )

                if not (self._stacked and not self._capacity
                        and tp_megakernel_q_supported(self.hparams, self.weights, n_tp)):
                    raise ValueError(
                        "checkpoint/geometry not eligible for the TP maskdot "
                        "megakernel (needs stacked transposed group-scaled "
                        "layers and whole-block head/ffn/vocab splits over "
                        f"{n_tp} devices)")
                packed_tp, geom_tp = shard_maskdot_for_tp(
                    self.hparams, self.weights, n_tp)
                self._tp_q = True
            self._tp = (tp_mesh, packed_tp, geom_tp)
        # Prefill operand cache for the masked-dot modes: the XLA prefill
        # path dequantizes every packed projection IN-GRAPH on every
        # prefill (ops/linear.py TQuantTensor branch) — measured 10-12.6 ms
        # of device time per bucket-32..512 prefill at the 1B geometry vs
        # 2.7-5.7 ms for rowq8 (ROOFLINE.md round 4). Memoize the exact
        # same w.dequant(bf16) arrays once at load (numerics unchanged —
        # the GEMM consumes identical operand values) and hand THEM to the
        # prefill dispatch; decode keeps the packed layout. Costs
        # 2 B/weight of extra HBM, so it is budget-gated (default 3 GiB:
        # 1B-class yes, 12B capacity class never reaches here).
        self._prefill_w = self.weights
        if self._g4_prefill_w is not None:
            self._prefill_w = self._g4_prefill_w  # unrolled gemma4 prefill
        if (
            not self._capacity
            and tp_mesh is None
            and mode in ("serve-q", "serve-q4")
            and self._stacked
            and os.environ.get("LLMI_PREFILL_BF16", "1") != "0"
        ):
            from .quant.device import TQ4Tensor, TQuantTensor

            lw = self.weights.layers
            if isinstance(lw.wqkv, (TQuantTensor, TQ4Tensor)):
                parts = {f: getattr(lw, f)
                         for f in ("wqkv", "wo", "w_gate_up", "w_down")}
                L = self.hparams.block_count
                need = sum(2 * L * t.rows * t.cols for t in parts.values())
                budget = int(os.environ.get(
                    "LLMI_PREFILL_BF16_BUDGET", str(3 * 1024**3)))
                if need <= budget:
                    from .gguf.constants import GGMLType
                    from .quant.device import DenseTensor

                    dense = {}
                    for f, t in parts.items():
                        arr = jax.jit(lambda tt: tt.dequant(jnp.bfloat16))(t)
                        arr.block_until_ready()  # bound dequant transients
                        dense[f] = DenseTensor(w=arr, fmt=GGMLType.BF16,
                                               rows=t.rows, cols=t.cols)
                    self._prefill_w = dataclasses.replace(
                        self.weights,
                        layers=dataclasses.replace(lw, **dense))
        self.tokenizer = Tokenizer(gguf.metadata, self.hparams.architecture)
        self.max_seq = max_seq
        self.decode_chunk = decode_chunk
        self._cache_sharding = cache_sharding

        hp = self.hparams
        self.sampling = sampling or SamplingConfig()
        self._base_key = jax.random.PRNGKey(seed)
        cfg = self.sampling

        def _prefill(w: ModelWeights, cache: KVCache, tokens, pos, n_valid, key):
            logits, cache = forward(hp, w, cache, tokens, pos, n_valid, exact=exact)
            nxt = sample(logits, cfg, jax.random.fold_in(key, pos + n_valid))
            return nxt, logits, cache

        def _prefill_fresh(w: ModelWeights, tokens, n_valid, key):
            # fresh-request prefill: the zeroed cache is allocated
            # IN-GRAPH — one dispatch covers cache init + prefill, so
            # TTFT pays a single tunnel round trip (the host-side
            # new_cache() + donation dance costs an extra dispatch,
            # measured ~35 ms through the axon tunnel vs ~3-6 ms of
            # actual prefill device time at buckets 32-512)
            cache = self.new_cache()
            return _prefill(w, cache, tokens, jnp.int32(0), n_valid, key)

        def _decode_chunk_fn(w: ModelWeights, cache: KVCache, token, pos, key):
            def body(carry, _):
                cache, tok, p = carry
                logits, cache = forward(hp, w, cache, tok[None], p, exact=exact)
                nxt = sample(logits, cfg, jax.random.fold_in(key, p + 1))
                return (cache, nxt, p + 1), nxt

            (cache, tok, p), toks = jax.lax.scan(
                body, (cache, token, pos), None, length=decode_chunk
            )
            return toks, cache

        # donate the cache: XLA aliases it in HBM instead of copying
        self._prefill = jax.jit(_prefill, donate_argnums=(1,))
        # sharded caches keep the host-side init (device_put placement)
        self._prefill_fresh = (jax.jit(_prefill_fresh)
                               if cache_sharding is None else None)
        self._decode_chunk = jax.jit(_decode_chunk_fn, donate_argnums=(1,))

        if self._tp is not None:
            # TP decode: one Pallas call per chip per step with in-kernel
            # all-reduces (ops/pallas/fused_decode_tp.py rowq8 /
            # fused_decode_q_tp.py maskdot). Prefill keeps the replicated
            # XLA path above.
            from .models.gemma import softcap as _softcap
            from .models.gemma import window_array as _window_array

            if self._tp_q:
                from .ops.pallas.fused_decode_q_tp import (
                    decode_step_megakernel_q_tp as _tp_step,
                )
            else:
                from .ops.pallas.fused_decode_tp import (
                    decode_step_megakernel_tp as _tp_step,
                )

            mesh_tp, packed_tp, geom_tp = self._tp
            interp = (jax.default_backend() != "tpu"
                      and bool(os.environ.get("LLMI_FUSED_INTERPRET")))
            tp_windows = _window_array(hp)

            def _decode_chunk_tp(packed, w, cache, token, pos, key):
                def body(carry, _):
                    cache, tok, p = carry
                    logits, kc, vc = _tp_step(
                        hp, packed, geom_tp, w, cache, tok, p,
                        mesh=mesh_tp, windows=tp_windows, interpret=interp)
                    logits = _softcap(logits, hp.final_logit_softcap)
                    nxt = sample(logits, cfg, jax.random.fold_in(key, p + 1))
                    cache = dataclasses.replace(cache, k=kc, v=vc)
                    return (cache, nxt, p + 1), nxt

                (cache, tok, p), toks = jax.lax.scan(
                    body, (cache, token, pos), None, length=decode_chunk)
                return toks, cache

            jit_tp = jax.jit(_decode_chunk_tp, donate_argnums=(2,))
            self._decode_chunk = (
                lambda w, cache, token, pos, key:
                jit_tp(packed_tp, w, cache, token, pos, key))

    def new_cache(self) -> KVCache:
        # serve caches are bf16 (Mosaic-native for flash decode); parity
        # keeps the reference's exact f16 stores (model.cpp:442-459).
        # Capacity engines keep the cache FLAT ([L, S, heads*dim], the
        # streamed megakernel's layout) — no per-step re-tiling.
        dtype = jnp.float16 if self.mode == "parity" else jnp.bfloat16
        return init_cache(
            self.hparams, self.max_seq,
            sharding=self._cache_sharding, stacked=self._stacked,
            flat=self._capacity, dtype=dtype,
        )

    def generate(
        self,
        prompt: str,
        *,
        n_predict: int = 100,
        apply_chat_template: bool = True,
        on_token: Optional[Callable[[int], None]] = None,
        stats: Optional[GenerationStats] = None,
    ) -> list[int]:
        """Greedy generation (reference main.cpp:160-234). Returns generated
        token ids (stop token excluded). ``on_token`` streams each id."""
        enc = self.tokenizer.encode(prompt, apply_chat_template)
        return self.generate_from_ids(
            enc.ids, n_predict=n_predict, on_token=on_token, stats=stats
        )

    def generate_from_ids(
        self,
        prompt_ids: list[int],
        *,
        n_predict: int = 100,
        on_token: Optional[Callable[[int], None]] = None,
        stats: Optional[GenerationStats] = None,
    ) -> list[int]:
        if len(prompt_ids) + n_predict + self.decode_chunk > self.max_seq:
            raise ValueError(
                f"prompt ({len(prompt_ids)}) + n_predict ({n_predict}) + chunk margin "
                f"exceeds max_seq {self.max_seq}"
            )
        t0 = time.perf_counter()
        bucket = prefill_bucket(len(prompt_ids))
        padded = np.zeros(bucket, dtype=np.int32)
        padded[: len(prompt_ids)] = prompt_ids
        if self._prefill_fresh is not None:
            next_tok, first_logits, cache = self._prefill_fresh(
                self._prefill_w, jnp.asarray(padded),
                jnp.int32(len(prompt_ids)), self._base_key,
            )
        else:
            cache = self.new_cache()
            next_tok, first_logits, cache = self._prefill(
                self._prefill_w, cache, jnp.asarray(padded),
                jnp.int32(0), jnp.int32(len(prompt_ids)), self._base_key,
            )
        first_id = int(next_tok)
        if stats is not None:
            # keep the DEVICE array: materializing the [vocab] f32 logits
            # here costs a second host round trip (~1 MB + tunnel latency,
            # measured ~45 ms of the 76.7 ms round-4 TTFT) inside the timed
            # prefill window. Consumers (-v top-10 dump) np-convert lazily.
            stats.first_logits = first_logits
        t1 = time.perf_counter()

        out: list[int] = []
        device_steps = 0
        pos = len(prompt_ids)
        pending = first_id
        done = self.tokenizer.is_stop(first_id)
        while not done and len(out) < n_predict:
            out.append(pending)
            if on_token:
                on_token(pending)
            if len(out) >= n_predict:
                break
            # device chunk: continues from `pending` at position `pos`
            toks, cache = self._decode_chunk(
                self.weights, cache, jnp.asarray(pending, dtype=jnp.int32), jnp.int32(pos),
                self._base_key,
            )
            toks = np.asarray(toks)
            device_steps += self.decode_chunk
            pos += self.decode_chunk
            for tid in toks[:-1]:
                tid = int(tid)
                if self.tokenizer.is_stop(tid) or len(out) >= n_predict:
                    done = True
                    break
                out.append(tid)
                if on_token:
                    on_token(tid)
            else:
                pending = int(toks[-1])
                done = self.tokenizer.is_stop(pending)
                continue
            break
        t2 = time.perf_counter()

        if stats is not None:
            stats.prompt_tokens = len(prompt_ids)
            stats.generated_tokens = len(out)
            stats.prefill_seconds = t1 - t0
            stats.decode_seconds = t2 - t1
            stats.decode_steps = device_steps
        return out

    def generate_text(self, prompt: str, **kw) -> str:
        """Generate and decode to display text."""
        return self.tokenizer.decode(self.generate(prompt, **kw))
