"""GGUF tensor-name → device-weight mapping.

The TPU analogue of the reference's ``map_tensors`` (reference
model.cpp:169-238): every GGUF tensor (including the gemma4 alias sets) is
repacked once at load time into device-resident planar quantized tensors
(quant/device.py) or native-dtype dense tensors, organized as a pytree so
the whole model state can flow through jit/pjit and be sharded with
jax.sharding annotations.

Norm weights are stored F32 in GGUF (the reference reads them as raw f32,
model.cpp:361-386) and loaded here as plain f32 vectors.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile, TensorInfo
from ..quant.device import DenseTensor, WeightTensor, from_gguf_bytes
from .hparams import HParams, load_hparams

_OPT = Optional
_W = Optional[WeightTensor]
_V = Optional[Array]

_LAYER_DATA = [
    "attn_norm", "wq", "wk", "wv", "wo", "q_norm", "k_norm",
    "post_attn_norm", "ffn_norm", "w_gate", "w_up", "w_down", "post_ffw_norm",
    "per_layer_inp_gate", "per_layer_proj", "per_layer_post_norm", "out_scale",
    "wqkv", "w_gate_up",  # load-time fusions (fuse_projections)
]


@partial(jax.tree_util.register_dataclass, data_fields=_LAYER_DATA, meta_fields=[])
@dataclasses.dataclass
class LayerWeights:
    attn_norm: _V = None
    wq: _W = None
    wk: _W = None
    wv: _W = None
    wo: _W = None
    q_norm: _V = None
    k_norm: _V = None
    post_attn_norm: _V = None
    ffn_norm: _V = None
    w_gate: _W = None
    w_up: _W = None
    w_down: _W = None
    post_ffw_norm: _V = None
    # gemma4 per-layer-input path (reference model.cpp:927-966)
    per_layer_inp_gate: _W = None
    per_layer_proj: _W = None
    per_layer_post_norm: _V = None
    out_scale: _V = None  # scalar
    # load-time row-concatenated fusions (fuse_projections); when set, the
    # corresponding unfused fields are None
    wqkv: _W = None
    w_gate_up: _W = None


_MODEL_DATA = [
    "token_embd", "output_norm", "layers",
    "token_embd_per_layer", "per_layer_model_proj", "per_layer_proj_norm",
]


@partial(jax.tree_util.register_dataclass, data_fields=_MODEL_DATA, meta_fields=[])
@dataclasses.dataclass
class ModelWeights:
    token_embd: WeightTensor
    output_norm: Array
    layers: tuple[LayerWeights, ...]
    token_embd_per_layer: _W = None
    per_layer_model_proj: _W = None
    per_layer_proj_norm: _V = None


# GGUF per-layer param name (incl. gemma4 aliases, reference model.cpp:193-236)
# -> LayerWeights field and kind ('w' = matmul weight, 'v' = f32 vector/scalar).
_LAYER_PARAMS = {
    "attn_norm.weight": ("attn_norm", "v"),
    "attn_q.weight": ("wq", "w"),
    "attn_k.weight": ("wk", "w"),
    "attn_v.weight": ("wv", "w"),
    "attn_output.weight": ("wo", "w"),
    "ffn_norm.weight": ("ffn_norm", "v"),
    "ffn_gate.weight": ("w_gate", "w"),
    "ffn_up.weight": ("w_up", "w"),
    "ffn_down.weight": ("w_down", "w"),
    "post_attention_norm.weight": ("post_attn_norm", "v"),
    "attn_post_norm.weight": ("post_attn_norm", "v"),
    "post_ffw_norm.weight": ("post_ffw_norm", "v"),
    "ffn_post_norm.weight": ("post_ffw_norm", "v"),
    "attn_k_norm.weight": ("k_norm", "v"),
    "attn_q_norm.weight": ("q_norm", "v"),
    "out_scale.weight": ("out_scale", "v"),
    "layer_output_scale.weight": ("out_scale", "v"),
    "per_layer_inp_gate.weight": ("per_layer_inp_gate", "w"),
    "inp_gate.weight": ("per_layer_inp_gate", "w"),
    "per_layer_proj.weight": ("per_layer_proj", "w"),
    "proj.weight": ("per_layer_proj", "w"),
    "per_layer_post_norm.weight": ("per_layer_post_norm", "v"),
    "post_norm.weight": ("per_layer_post_norm", "v"),
}


def _load_w(gguf: GGUFFile, info: TensorInfo, sharding=None, mode: str = "packed") -> WeightTensor:
    if mode == "packed-q4" and info.name.startswith("blk."):
        # serve-q4: lossless nibble-packing of 4-bit encodings (0.5 B/weight);
        # non-4-bit formats stay int8 planar, embeddings go bf16. Packing
        # happens on the host so only packed bytes cross to HBM.
        from ..quant.device import pack_q4_host

        if info.tensor_type in (GGMLType.Q4_0, GGMLType.Q4_K):
            q4 = pack_q4_host(
                gguf.tensor_bytes(info), info.tensor_type, info.n_rows,
                info.n_cols, sharding=sharding,
            )
            if q4 is not None:
                return q4
        w = from_gguf_bytes(
            gguf.tensor_bytes(info), info.tensor_type, info.n_rows, info.n_cols,
            sharding=sharding,
        )
        if not isinstance(w, DenseTensor):
            return w
        mode = "bf16"
    elif mode == "packed-q4":
        mode = "bf16"
    if mode == "rowq8":
        # serve-q8: every matmul weight becomes per-row int8. Layer weights
        # use the output-scaled fused Pallas kernel; the huge-vocab tied
        # embedding runs as one XLA int8 dot (ops/linear.py) — halves the
        # single biggest per-step read vs bf16.
        from ..quant.device import requantize_rowwise

        return requantize_rowwise(
            info.tensor_type, gguf.tensor_bytes(info), info.n_rows, info.n_cols,
            sharding=sharding,
        )
    if mode == "bf16":
        # serve mode: dequantize once on the host, ship bf16 to HBM —
        # one 2-byte stream per weight at matmul time, full MXU rate.
        import jax

        from .. import native
        from ..quant import layouts

        raw = gguf.tensor_bytes(info)
        words = native.dequant_bf16(raw, int(info.tensor_type), info.n_rows, info.n_cols)
        if words is not None:
            arr = jnp.asarray(words).view(jnp.bfloat16)
        else:
            w = layouts.dequantize(raw, info.tensor_type, info.n_rows, info.n_cols)
            arr = jnp.asarray(w, dtype=jnp.bfloat16)
        if sharding is not None:
            arr = jax.device_put(
                arr, sharding.for_array(arr) if hasattr(sharding, "for_array") else sharding
            )
        return DenseTensor(w=arr, fmt=GGMLType.BF16, rows=info.n_rows, cols=info.n_cols)
    w = from_gguf_bytes(
        gguf.tensor_bytes(info), info.tensor_type, info.n_rows, info.n_cols, sharding=sharding
    )
    if mode == "packed-serve" and isinstance(w, DenseTensor) and w.w.dtype == jnp.float16:
        # f16 matmuls are slow on the MXU; serve modes keep quantized
        # tensors packed but re-type dense (embedding) tensors to bf16.
        w = DenseTensor(w=w.w.astype(jnp.bfloat16), fmt=GGMLType.BF16,
                        rows=w.rows, cols=w.cols)
    return w


def _load_v(gguf: GGUFFile, info: TensorInfo) -> Array:
    if info.tensor_type != GGMLType.F32:
        raise ValueError(f"{info.name}: norm/scale weights must be F32, got {info.tensor_type}")
    return jnp.asarray(np.ascontiguousarray(gguf.tensor_bytes(info)).view(np.float32).copy())


def load_weights(
    gguf: GGUFFile,
    hparams: HParams | None = None,
    *,
    sharding_fn=None,
    mode: str = "packed",
) -> tuple[HParams, ModelWeights]:
    """Map + repack every model tensor onto device.

    ``sharding_fn(tensor_name, info) -> jax.sharding.Sharding | None`` lets
    the parallel layer choose per-tensor shardings (tensor parallelism);
    default is single-device placement by jax.device_put.

    ``mode``: "packed" keeps quantized weights as planar int8 + scales
    (exact reference numerics, minimum HBM); "packed-serve" additionally
    re-types dense f16 tensors to bf16 (MXU-native); "bf16" dequantizes
    everything at load into bf16 (serve mode: fastest XLA matmul path).
    """
    hp = hparams or load_hparams(gguf.metadata)
    layers = [dict() for _ in range(hp.block_count)]
    token_embd = output_norm = None
    token_embd_per_layer = per_layer_model_proj = per_layer_proj_norm = None

    for info in gguf.tensor_infos:
        name = info.name
        shard = sharding_fn(name, info) if sharding_fn else None
        if name == "token_embd.weight":
            token_embd = _load_w(gguf, info, shard, mode)
        elif name == "output_norm.weight":
            output_norm = _load_v(gguf, info)
        elif name in ("token_embd_per_layer.weight", "per_layer_token_embd.weight"):
            token_embd_per_layer = _load_w(gguf, info, shard, mode)
        elif name == "per_layer_model_proj.weight":
            per_layer_model_proj = _load_w(gguf, info, shard, mode)
        elif name == "per_layer_proj_norm.weight":
            per_layer_proj_norm = _load_v(gguf, info)
        elif name.startswith("blk."):
            _, idx, param = name.split(".", 2)
            i = int(idx)
            if i >= hp.block_count:
                continue
            entry = _LAYER_PARAMS.get(param)
            if entry is None:
                continue  # unknown per-layer tensors are ignored, as in the reference
            field, kind = entry
            layers[i][field] = _load_w(gguf, info, shard, mode) if kind == "w" else _load_v(gguf, info)

    if token_embd is None:
        raise ValueError("GGUF is missing token_embd.weight")
    if output_norm is None:
        raise ValueError("GGUF is missing output_norm.weight")

    model = ModelWeights(
        token_embd=token_embd,
        output_norm=output_norm,
        layers=tuple(LayerWeights(**lw) for lw in layers),
        token_embd_per_layer=token_embd_per_layer,
        per_layer_model_proj=per_layer_model_proj,
        per_layer_proj_norm=per_layer_proj_norm,
    )
    return hp, model


def layers_stackable(hp: HParams, layers: tuple[LayerWeights, ...]) -> bool:
    """Can the layer stack be scanned? Requires homogeneous layers: every
    layer owns its KV, identical tensor formats/shapes/field presence, and
    uniform head dims across the SWA pattern."""
    if hp.n_layer_kv_from_start >= 0:
        return False  # shared-KV (gemma4) layers are heterogeneous
    if hp.embedding_length_per_layer:
        return False  # per-layer-input epilogue kept on the unrolled path
    if hp.n_embd_head_k != hp.n_embd_head_k_swa or hp.n_embd_head_v != hp.n_embd_head_v_swa:
        return False
    if len(layers) < 2:
        return False

    def signature(lw: LayerWeights):
        sig = []
        for f in dataclasses.fields(lw):
            v = getattr(lw, f.name)
            if v is None:
                sig.append((f.name, None))
            else:
                leaves = jax.tree_util.tree_leaves(v)
                sig.append((f.name, tuple((x.shape, str(x.dtype)) for x in leaves)))
        return tuple(sig)

    first = signature(layers[0])
    return all(signature(lw) == first for lw in layers[1:])


def stack_layers(layers: tuple[LayerWeights, ...]) -> LayerWeights:
    """Stack homogeneous per-layer weights into one LayerWeights whose array
    leaves carry a leading [n_layers] axis — the operand of the
    scan-over-layers forward (models/gemma.py). One extra device copy at
    load time; steady-state HBM is unchanged."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def stack_layers_gemma4(hp: HParams, model: ModelWeights) -> Optional[ModelWeights]:
    """Stack a gemma4 (per-layer-input / shared-KV) model's layers for the
    whole-step decode megakernel (ops/pallas/fused_decode.py gemma4 path).

    Shared-KV layers (reference model.cpp:774-835) own no K/V projection
    weights, which makes the layer set heterogeneous; their fused QKV
    tensors are ZERO-FILLED here (zero int8 rows, zero row scales) so
    every layer carries the same [Rq, D] shape — the kernel computes
    k = v = 0 for them and never writes those rows to the cache (it reads
    hp.kv_source_layer's cache instead). Costs Hkv*(dk+dv)*D extra weight
    bytes per shared layer per step (~a few % of a layer).

    rowq8 (groups == 1 QuantTensor) layers only. Returns the stacked
    ModelWeights or None when the layer set is not stackable this way."""
    from ..quant.device import QuantTensor

    lw = model.layers
    if isinstance(lw, LayerWeights):
        return None  # already stacked
    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    if (hp.n_embd_head_k != hp.n_embd_head_k_swa
            or hp.n_embd_head_v != hp.n_embd_head_v_swa):
        return None
    rq = hp.n_head * dk
    rkv = hp.n_head_kv * (dk + dv)
    padded = []
    for i, layer in enumerate(lw):
        if hp.layer_has_kv(i):
            if layer.wqkv is None:  # K/V present but fusion didn't happen
                return None
            padded.append(layer)
            continue
        # shared-KV layer: Q-only projection -> zero-fill the K/V rows
        wq = layer.wq if layer.wqkv is None else layer.wqkv
        if not (isinstance(wq, QuantTensor) and wq.groups == 1
                and wq.rows == rq):
            return None
        D = wq.cols
        q_pad = jnp.concatenate(
            [wq.q, jnp.zeros((rkv, D), dtype=jnp.int8)], axis=0)
        s_pad = jnp.concatenate(
            [wq.scale, jnp.zeros((rkv,) + wq.scale.shape[1:],
                                 dtype=wq.scale.dtype)], axis=0)
        wqkv = QuantTensor(q=q_pad, scale=s_pad, offset=None, fmt=wq.fmt,
                           rows=rq + rkv, cols=D, group_size=wq.group_size)
        padded.append(dataclasses.replace(layer, wqkv=wqkv, wq=None,
                                          wk=None, wv=None))
    padded = tuple(padded)

    def signature(l: LayerWeights):
        sig = []
        for f in dataclasses.fields(l):
            v = getattr(l, f.name)
            if v is None:
                sig.append((f.name, None))
            else:
                leaves = jax.tree_util.tree_leaves(v)
                sig.append((f.name,
                            tuple((x.shape, str(x.dtype)) for x in leaves)))
        return tuple(sig)

    first = signature(padded[0])
    if not all(signature(l) == first for l in padded[1:]):
        return None
    return dataclasses.replace(model, layers=stack_layers(padded))


def maskdot_layers(model: ModelWeights, *, q4: bool = False,
                   shard: int = 1) -> Optional[ModelWeights]:
    """Repack a STACKED model's layer weights into the masked-dot
    transposed layout (quant/device.py TQuantTensor) consumed by the
    lossless whole-step decode megakernel (ops/pallas/fused_decode_q.py).
    One-time device transposes; exact values. Returns None when any of the
    four fused projections isn't convertible.

    ``q4=True`` (the serve-q4 capacity mode) additionally nibble-packs
    4-bit encodings to TQ4Tensor (0.5 B/weight, block-paired layout);
    non-4-bit parts (e.g. a Q6_K down-projection) stay TQuantTensor.

    ``shard``: TP way-count — the contraction-sharded parts (wo, w_down)
    pick a block size whose whole blocks divide a 1/shard slice
    (ops/pallas/fused_decode_q_tp.py shard_maskdot_for_tp)."""
    import dataclasses as _dc

    from ..quant.device import (
        Q4Tensor,
        QuantTensor,
        pack_maskdot_q4,
        transpose_for_maskdot,
        unpack_q4_to_quant,
    )

    lw = model.layers
    if not isinstance(lw, LayerWeights):
        return None
    parts = {}
    for f in ("wqkv", "wo", "w_gate_up", "w_down"):
        qt = getattr(lw, f)
        if isinstance(qt, Q4Tensor):  # serve-q4 load: unpack, re-pack paired
            qt = unpack_q4_to_quant(qt)
        if not isinstance(qt, QuantTensor) or qt.groups <= 1:
            return None
        # only wo/w_down get contraction-sharded under TP
        t = transpose_for_maskdot(
            qt, shard=shard if f in ("wo", "w_down") else 1)
        if t is None:
            return None
        if q4:
            t4 = pack_maskdot_q4(t)
            if t4 is not None:
                t = t4
        parts[f] = t
    return _dc.replace(model, layers=_dc.replace(lw, **parts))


def _concat_weights(parts: list) -> WeightTensor:
    """Concatenate row-parallel weights sharing cols/format into one tensor
    (exact: y rows are simply stacked, the contraction is unchanged)."""
    from ..quant.device import QuantTensor

    first = parts[0]
    rows = sum(p.rows for p in parts)
    if isinstance(first, DenseTensor):
        return DenseTensor(
            w=jnp.concatenate([p.w for p in parts], axis=0),
            fmt=first.fmt, rows=rows, cols=first.cols,
        )
    from ..quant.device import Q4Tensor

    if isinstance(first, Q4Tensor):  # nibble packing is per-row: rows concat
        offset = None
        if any(p.offset is not None for p in parts):
            offset = jnp.concatenate(
                [p.offset if p.offset is not None else jnp.zeros_like(p.scale) for p in parts],
                axis=0,
            )
        return Q4Tensor(
            packed=jnp.concatenate([p.packed for p in parts], axis=0),
            scale=jnp.concatenate([p.scale for p in parts], axis=0),
            offset=offset,
            fmt=first.fmt, rows=rows, cols=first.cols,
            group_size=first.group_size, centered=first.centered,
        )
    assert isinstance(first, QuantTensor)
    offset = None
    if any(p.offset is not None for p in parts):
        offset = jnp.concatenate(
            [p.offset if p.offset is not None else jnp.zeros_like(p.scale) for p in parts],
            axis=0,
        )
    return QuantTensor(
        q=jnp.concatenate([p.q for p in parts], axis=0),
        scale=jnp.concatenate([p.scale for p in parts], axis=0),
        offset=offset,
        fmt=first.fmt, rows=rows, cols=first.cols, group_size=first.group_size,
    )


def _fusable(parts: list) -> bool:
    if any(p is None for p in parts):
        return False
    first = parts[0]
    if not all(type(p) is type(first) and p.cols == first.cols and p.fmt == first.fmt
               for p in parts):
        return False
    return True


def fuse_projections(model: ModelWeights) -> ModelWeights:
    """Fuse each layer's Q/K/V and FFN gate/up projections into single
    matmuls (TPU: fewer kernel launches per decode step; results identical
    because row-concatenation commutes with the contraction). Layers whose
    parts differ in format/cols are left as-is."""
    new_layers = []
    for lw in model.layers:
        lw = dataclasses.replace(lw)
        if _fusable([lw.wq, lw.wk, lw.wv]):
            lw.wqkv = _concat_weights([lw.wq, lw.wk, lw.wv])
            lw.wq = lw.wk = lw.wv = None
        if _fusable([lw.w_gate, lw.w_up]):
            lw.w_gate_up = _concat_weights([lw.w_gate, lw.w_up])
            lw.w_gate = lw.w_up = None
        new_layers.append(lw)
    return dataclasses.replace(model, layers=tuple(new_layers))


def load_maskdot_stacked(
    gguf: GGUFFile, hparams: HParams | None = None, *, q4: bool = True,
    mesh=None, axis: str = "model", scale_f16: bool = False,
) -> Optional[tuple[HParams, ModelWeights]]:
    """Capacity-class load: build the STACKED masked-dot transposed layout
    (TQuantTensor / TQ4Tensor) host-side, straight from GGUF bytes.

    The small-model route (load_weights + stack_layers + maskdot_layers)
    round-trips full int8 planar tensors through device HBM — fine for a
    1B, impossible for a 12B on a 16 GB chip. Here each layer's fused
    projections (QKV rows, gate|up rows) are decoded, transposed,
    block-packed and concatenated in numpy (quant/device.py
    maskdot_host_parts), stacked over layers, and shipped once — HBM only
    ever holds the final 0.5-1 B/weight arrays. The streamed decode
    megakernel (ops/pallas/fused_decode_stream.py) consumes the result
    directly; prefill dequantizes per layer inside the scan forward.

    Returns (hparams, model) or None when the checkpoint isn't
    maskdot-loadable (heterogeneous formats, missing tensors, gemma4) —
    callers fall back to the standard loaders.

    ``mesh``: optional jax.sharding.Mesh for the TP capacity load (the
    27B-on-a-slice program, BASELINE north star): every maskdot weight
    leaf [L, C*, R] is sharded on its ROWS (output features, the last
    dim) over ``axis`` and the tied embedding on its vocab rows — each
    chip holds 1/n of every projection, decode reads 1/n of the weight
    bytes per chip, and GSPMD inserts only tiny activation all-gathers
    (output-feature sharding needs no contraction psum). Leaves whose
    row count doesn't divide the axis replicate (correct, undistributed).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..quant.device import TQ4Tensor, TQuantTensor, maskdot_host_parts

    hp = hparams or load_hparams(gguf.metadata)
    if hp.architecture == "gemma4" or hp.embedding_length_per_layer:
        return None
    infos = {i.name: i for i in gguf.tensor_infos}
    if "token_embd.weight" not in infos or "output_norm.weight" not in infos:
        return None

    fused_sets = {
        "wqkv": ("attn_q.weight", "attn_k.weight", "attn_v.weight"),
        "wo": ("attn_output.weight",),
        "w_gate_up": ("ffn_gate.weight", "ffn_up.weight"),
        "w_down": ("ffn_down.weight",),
    }
    # per fused field: lists (over layers) of merged numpy arrays
    acc: dict = {f: {"q": None, "s": None, "o": None, "meta": None} for f in fused_sets}
    vec_fields = ("attn_norm", "ffn_norm", "q_norm", "k_norm",
                  "post_attn_norm", "post_ffw_norm")
    vecs: dict = {f: [] for f in vec_fields}
    vec_names = {
        "attn_norm": ("attn_norm.weight",),
        "ffn_norm": ("ffn_norm.weight",),
        "q_norm": ("attn_q_norm.weight",),
        "k_norm": ("attn_k_norm.weight",),
        "post_attn_norm": ("post_attention_norm.weight", "attn_post_norm.weight"),
        "post_ffw_norm": ("post_ffw_norm.weight", "ffn_post_norm.weight"),
    }

    # Single-chip path: per-layer DONATED device updates (ONE dispatch per
    # layer covering every field — a per-ARRAY dispatch variant measured
    # 616 s vs 477 s for the host-assembly baseline on the 12B: ~430
    # tunnel-latency round trips ate the overlap) plus a one-worker
    # producer thread, so layer i+1's host repack (numpy/native, GIL-
    # releasing) overlaps layer i's tunnel transfer. The multi-GB host
    # staging array also disappears. The mesh (TP) path keeps the host
    # assembly: its leaves need a one-shot sharded placement.
    stream = mesh is None

    def _upd_all(bufs, rows, i):
        return [jax.lax.dynamic_update_slice(b, x[None], (i, 0, 0))
                for b, x in zip(bufs, rows)]

    upd_all = jax.jit(_upd_all, donate_argnums=(0,))

    def _merged(parts, key, fill_missing=False):
        rows = [
            (p[key] if p[key] is not None else np.zeros_like(p["sT"]))
            if fill_missing else p[key]
            for p in parts
        ]
        return rows[0] if len(rows) == 1 else np.concatenate(rows, axis=-1)

    def _layer_parts(i):
        """Host-side repack of ONE layer: {field: (q, s, o|None, meta)} +
        the layer's norm vectors, or None when ineligible."""
        out = {}
        for field, names in fused_sets.items():
            parts = []
            for n in names:
                info = infos.get(f"blk.{i}.{n}")
                if info is None:
                    return None
                parts.append(maskdot_host_parts(
                    gguf.tensor_bytes(info), info.tensor_type,
                    info.n_rows, info.n_cols, q4=q4, scale_f16=scale_f16,
                ))
            if any(p is None for p in parts):
                return None
            first = parts[0]
            key = "packedT" if first["packedT"] is not None else "qT"
            same = all(
                (p["packedT"] is not None) == (first["packedT"] is not None)
                and p["gs"] == first["gs"] and p["bg"] == first["bg"]
                and p["mp"] == first["mp"] and p["centered"] == first["centered"]
                and p[key].shape[0] == first[key].shape[0]
                for p in parts
            )
            if not same:
                return None
            o = (_merged(parts, "offT", fill_missing=True)
                 if any(p["offT"] is not None for p in parts) else None)
            out[field] = (_merged(parts, key), _merged(parts, "sT"), o, first)
        vec = {}
        for field in vec_fields:
            info = None
            for n in vec_names[field]:
                info = infos.get(f"blk.{i}.{n}")
                if info is not None:
                    break
            if info is not None and info.tensor_type != GGMLType.F32:
                return None  # norms must be F32 (_load_v's contract)
            vec[field] = (None if info is None else
                          np.ascontiguousarray(gguf.tensor_bytes(info))
                          .view(np.float32).copy())
        return out, vec

    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1) if stream else None
    fut = ex.submit(_layer_parts, 0) if stream else None
    try:
        for i in range(hp.block_count):
            res = fut.result() if stream else _layer_parts(i)
            if res is None:
                return None
            if stream and i + 1 < hp.block_count:
                fut = ex.submit(_layer_parts, i + 1)
            per_field, vec = res
            for field, (q, s, o, first) in per_field.items():
                slot = acc[field]
                if slot["meta"] is None:
                    slot["meta"] = first
                else:
                    # cross-LAYER consistency: llama.cpp checkpoints mix
                    # formats across layers (use_more_bits); a mismatched
                    # fmt, centering, or geometry must fall back to the
                    # standard loader rather than stack under layer-0's
                    # meta — a same-shape Q4_0/Q4_K mix would otherwise
                    # decode layer quants with the wrong centering,
                    # silently corrupting.
                    m0 = slot["meta"]
                    if (
                        m0["fmt"] != first["fmt"]
                        or (m0["packedT"] is None) != (first["packedT"] is None)
                        or m0["gs"] != first["gs"] or m0["bg"] != first["bg"]
                        or m0["mp"] != first["mp"]
                        or m0["centered"] != first["centered"]
                        or (m0["offT"] is None) != (first["offT"] is None)
                    ):
                        return None
                if slot["q"] is None:
                    L_ = hp.block_count
                    alloc = jnp.zeros if stream else np.empty
                    slot["q"] = alloc((L_,) + q.shape, dtype=q.dtype)
                    slot["s"] = alloc((L_,) + s.shape, dtype=s.dtype)
                    if o is not None:
                        slot["o"] = alloc((L_,) + o.shape, dtype=np.float32)
            if stream:
                bufs, rows, keys = [], [], []
                for field, (q, s, o, _) in per_field.items():
                    slot = acc[field]
                    for kname, arr in (("q", q), ("s", s), ("o", o)):
                        if arr is None:
                            continue
                        bufs.append(slot[kname])
                        rows.append(jnp.asarray(arr))
                        keys.append((field, kname))
                new = upd_all(bufs, rows, i)
                for (field, kname), b in zip(keys, new):
                    acc[field][kname] = b
            else:
                for field, (q, s, o, _) in per_field.items():
                    slot = acc[field]
                    slot["q"][i] = q
                    slot["s"][i] = s
                    if o is not None:
                        slot["o"][i] = o
            for field in vec_fields:
                vecs[field].append(vec[field])
    finally:
        if ex is not None:
            ex.shutdown(wait=False)

    def _put(arr: np.ndarray):
        if mesh is None:
            return jax.device_put(jnp.asarray(arr))
        n = mesh.shape[axis]
        spec = (P(None, None, axis) if arr.shape[-1] % n == 0 else P())
        return jax.device_put(arr, NamedSharding(mesh, spec))

    def _put_repl(arr):
        if mesh is None:
            return jax.device_put(jnp.asarray(arr))
        return jax.device_put(np.asarray(arr), NamedSharding(mesh, P()))

    def build(field: str, rows_cols):
        slot = acc[field]
        m = slot["meta"]
        packed = m["packedT"] is not None
        q = slot["q"] if stream else _put(slot["q"])
        s = slot["s"] if stream else _put(slot["s"])
        o = (None if slot["o"] is None
             else (slot["o"] if stream else _put(slot["o"])))
        rows, cols = rows_cols
        cls = TQ4Tensor if packed else TQuantTensor
        kw = dict(sT=s, offT=o, fmt=m["fmt"], rows=rows, cols=cols,
                  group_size=m["gs"], bg=m["bg"], mp=m["mp"])
        if packed:
            return cls(packedT=q, centered=m["centered"], **kw)
        return cls(qT=q, **kw)

    dk, dv = hp.n_embd_head_k, hp.n_embd_head_v
    D = hp.embedding_length
    Rq = hp.n_head * dk + hp.n_head_kv * (dk + dv)
    f_down = infos["blk.0.ffn_down.weight"]
    F = f_down.n_cols
    n_ff = infos["blk.0.ffn_gate.weight"].n_rows
    layers = LayerWeights(
        wqkv=build("wqkv", (Rq, D)),
        wo=build("wo", (D, infos["blk.0.attn_output.weight"].n_cols)),
        w_gate_up=build("w_gate_up", (2 * n_ff, D)),
        w_down=build("w_down", (f_down.n_rows, F)),
        **{
            f: (None if any(v is None for v in vecs[f])
                else _put_repl(np.stack(vecs[f])))
            for f in vec_fields
        },
    )
    emb_sharding = None
    if mesh is not None:
        from ..parallel.sharding import _LeafSharding

        if infos["token_embd.weight"].n_rows % mesh.shape[axis] == 0:
            emb_sharding = _LeafSharding(mesh, axis, dim=0)
        else:
            emb_sharding = NamedSharding(mesh, P())
    token_embd = _load_w(gguf, infos["token_embd.weight"], emb_sharding, "bf16")
    model = ModelWeights(
        token_embd=token_embd,
        output_norm=_put_repl(_load_v(gguf, infos["output_norm.weight"])),
        layers=layers,
    )
    return hp, model


def maskdot_layer_bytes_estimate(gguf: GGUFFile, *, q4: bool) -> Optional[int]:
    """Approximate ONE layer's maskdot weight+scale HBM bytes from the
    tensor directory alone (no data read) — lets the engine choose the
    whole-layer megakernel load vs the streamed capacity load BEFORE
    loading anything (the wrong choice either OOMs a 16 GB chip or wastes
    a full checkpoint read). None when a projection is missing or dense."""
    infos = {i.name: i for i in gguf.tensor_infos}
    total = 0
    for n in ("attn_q.weight", "attn_k.weight", "attn_v.weight",
              "attn_output.weight", "ffn_gate.weight", "ffn_up.weight",
              "ffn_down.weight"):
        info = infos.get(f"blk.0.{n}")
        if info is None:
            return None
        fmt = GGMLType(info.tensor_type)
        if fmt in (GGMLType.F16, GGMLType.BF16, GGMLType.F32):
            return None
        gs = 16 if fmt == GGMLType.Q6_K else 32
        nel = info.n_rows * info.n_cols
        wb = nel // 2 if (q4 and fmt in (GGMLType.Q4_0, GGMLType.Q4_K)) else nel
        sb = (nel // gs) * 4 * (2 if fmt == GGMLType.Q4_K else 1)
        total += wb + sb
    return total
