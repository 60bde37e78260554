"""Device-resident quantized weights: planar int8 + per-group f32 scales.

The reference keeps GGUF block bytes mmap'd and fuses dequantization into
every GEMV (reference ops.cpp:188-956). The TPU-native equivalent is a
*planar* layout engineered for the MXU and HBM:

    W[r, g*S + j] == scale[r, g] * q[r, g, j] - offset[r, g]     (exactly)

  - ``q``     int8  [rows, groups, group_size]  — the quantized integers,
              nibble-unpacked once at load time (host), contiguous in HBM.
  - ``scale`` f32   [rows, groups]  — exact products of the block's f16
              scale and integer sub-scales (e.g. Q4_K's d * sc are exact
              in f32), so dequantization reproduces the reference's f32
              values bit-for-bit.
  - ``offset`` f32  [rows, groups] or None — Q4_K's dmin * m min term.

This is what the Pallas fused dequant-matmul kernels consume directly, and
what the naive XLA path dequantizes in-graph. The group size is the
finest scale granularity of the format (32 for Q4_0/Q5_0/Q8_0/Q4_K, 16
for Q6_K), so one layout serves every encoding.

Each format's ``act_quant`` field records the reference's activation-
quantization contract for that weight encoding (reference ops.cpp:210,
627, 721, 800 / f16 downcast at :471-475 / none for Q5_0 at :840-893).
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
from . import layouts

# Activation contract per weight encoding (what the reference GEMV does to x).
ACT_QUANT = {
    GGMLType.Q4_0: "q8_0",
    GGMLType.Q8_0: "q8_0",
    GGMLType.Q4_K: "q8_k",
    GGMLType.Q6_K: "q8_k",
    GGMLType.Q5_0: "none",  # float dot, reference ops.cpp:840-893
    GGMLType.F16: "f16",  # x downcast to f16, reference ops.cpp:455-612
    GGMLType.BF16: "none",
    GGMLType.F32: "none",
}


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scale", "offset"],
    meta_fields=["fmt", "rows", "cols", "group_size"],
)
@dataclasses.dataclass
class QuantTensor:
    """Planar quantized 2-D weight, a pytree of device arrays.

    ``q`` is stored GROUP-STRIDED: device column ``s * groups + g`` holds
    logical weight element ``g * group_size + s`` (group g, lane s). This
    makes the per-group scale expansion inside the Pallas fused kernel a
    single lane-tiling ``pltpu.repeat`` — Mosaic supports no other cheap
    [rows, groups] -> [rows, cols] broadcast — while XLA-side consumers
    undo the permutation with a free reshape+transpose.
    """

    q: Array  # int8 [rows, cols], group-strided (see above)
    scale: Array  # f32 [rows, groups]
    offset: Optional[Array]  # f32 [rows, groups] or None
    fmt: GGMLType
    rows: int
    cols: int
    group_size: int

    @property
    def act_quant(self) -> str:
        return ACT_QUANT[self.fmt]

    @property
    def groups(self) -> int:
        return self.cols // self.group_size

    def q_grouped(self) -> Array:
        """Logical [rows, groups, group_size] view of the strided storage."""
        return self.q.reshape(self.rows, self.group_size, self.groups).transpose(0, 2, 1)

    def dequant(self, dtype=jnp.float32) -> Array:
        """In-graph dequantization to [rows, cols] (logical column order)."""
        w = self.q_grouped().astype(jnp.float32) * self.scale[..., None]
        if self.offset is not None:
            w = w - self.offset[..., None]
        return w.reshape(self.rows, self.cols).astype(dtype)

    def stride_activations(self, x: Array) -> Array:
        """Permute [..., cols] activations into this tensor's strided column
        order so x' @ q^T contracts matching elements."""
        shape = x.shape
        xg = x.reshape(shape[:-1] + (self.groups, self.group_size))
        return jnp.swapaxes(xg, -1, -2).reshape(shape)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["w"],
    meta_fields=["fmt", "rows", "cols"],
)
@dataclasses.dataclass
class DenseTensor:
    """Unquantized 2-D weight (F16/BF16/F32) stored in its native dtype."""

    w: Array  # [rows, cols] f16/bf16/f32
    fmt: GGMLType
    rows: int
    cols: int

    @property
    def act_quant(self) -> str:
        return ACT_QUANT[self.fmt]

    def dequant(self, dtype=jnp.float32) -> Array:
        return self.w.astype(dtype)


WeightTensor = "QuantTensor | DenseTensor | Q4Tensor"  # Q4Tensor defined below


# ---------------------------------------------------------------------------
# host-side repacking: raw GGUF block bytes -> planar numpy fields
# (vectorized numpy; cited layouts are bit-validated against the reference)


def _plan_q4_0(raw: np.ndarray, rows: int, cols: int):
    f = layouts.decode_q4_0(raw, rows, cols)
    qs = f["qs"].astype(np.int16)
    q = np.concatenate([qs & 0x0F, qs >> 4], axis=-1).astype(np.int8) - 8
    return q, f["d"].astype(np.float32), None, 32


def _plan_q8_0(raw: np.ndarray, rows: int, cols: int):
    f = layouts.decode_q8_0(raw, rows, cols)
    return f["qs"].copy(), f["d"].astype(np.float32), None, 32


def _plan_q5_0(raw: np.ndarray, rows: int, cols: int):
    f = layouts.decode_q5_0(raw, rows, cols)
    qs = f["qs"].astype(np.uint32)
    qh = f["qh"][..., None]
    bits = np.arange(32, dtype=np.uint32)
    high = ((qh >> bits) & 1) << 4
    low = np.concatenate([qs & 0x0F, qs >> 4], axis=-1)
    q = ((low | high).astype(np.int16) - 16).astype(np.int8)
    return q, f["d"].astype(np.float32), None, 32


def _plan_q4_k(raw: np.ndarray, rows: int, cols: int):
    f = layouts.decode_q4_k(raw, rows, cols)
    sc, m = layouts._q4k_scale_min(f["scales"])  # [R, NB, 8]
    q = layouts._q4k_expand(f["qs"]).astype(np.int8)  # [R, NB, 256] in 0..15
    d = f["d"].astype(np.float32)[..., None]
    dmin = f["dmin"].astype(np.float32)[..., None]
    scale = (d * sc.astype(np.float32)).reshape(rows, -1)  # per-32 group
    offset = (dmin * m.astype(np.float32)).reshape(rows, -1)
    return q.reshape(rows, -1, 32), scale, offset, 32


def _plan_q6_k(raw: np.ndarray, rows: int, cols: int):
    f = layouts.decode_q6_k(raw, rows, cols)
    q = layouts._q6k_expand(f["ql"], f["qh"]).astype(np.int8)  # centered
    d = f["d"].astype(np.float32)[..., None]
    scale = (d * f["scales"].astype(np.float32)).reshape(rows, -1)  # per-16
    return q.reshape(rows, -1, 16), scale, None, 16


_PLANAR = {
    GGMLType.Q4_0: _plan_q4_0,
    GGMLType.Q8_0: _plan_q8_0,
    GGMLType.Q5_0: _plan_q5_0,
    GGMLType.Q4_K: _plan_q4_k,
    GGMLType.Q6_K: _plan_q6_k,
}


def _native_repack(raw, fmt, rows, cols, group_size):
    """Try the C++ repack path (llm_inference_tpu.native); None -> numpy."""
    from .. import native

    return native.repack(np.asarray(raw), int(fmt), rows, cols, group_size)

_DENSE_DTYPE = {
    GGMLType.F16: jnp.float16,
    GGMLType.BF16: jnp.bfloat16,
    GGMLType.F32: jnp.float32,
}


def from_gguf_bytes(
    raw: np.ndarray,
    fmt: GGMLType,
    rows: int,
    cols: int,
    *,
    device=None,
    sharding=None,
) -> WeightTensor:
    """Repack raw GGUF tensor bytes into a device-resident weight.

    Quantized encodings become :class:`QuantTensor` (planar int8 + scales);
    float encodings become :class:`DenseTensor` in their native dtype.
    ``sharding`` (a jax.sharding.Sharding) wins over ``device``.
    """
    fmt = GGMLType(fmt)

    def put(x):
        x = jnp.asarray(x) if not isinstance(x, (np.ndarray, jnp.ndarray)) else x
        target = sharding if sharding is not None else device
        if target is None:
            return jax.device_put(x)
        if hasattr(target, "for_array"):  # parallel.sharding._LeafSharding factory
            return jax.device_put(x, target.for_array(x))
        return jax.device_put(x, target)
    if fmt in _DENSE_DTYPE:
        w = layouts.dequantize(raw, fmt, rows, cols)
        return DenseTensor(w=put(jnp.asarray(w, dtype=_DENSE_DTYPE[fmt])), fmt=fmt, rows=rows, cols=cols)
    plan = _PLANAR.get(fmt)
    if plan is None:
        raise ValueError(f"unsupported weight encoding {fmt!r}")
    gs = 16 if fmt == GGMLType.Q6_K else 32
    native_out = _native_repack(raw, fmt, rows, cols, gs)
    if native_out is not None:
        q, scale, offset = native_out
    else:
        q, scale, offset, gs = plan(raw, rows, cols)
    # group-strided 2-D storage: column s*G+g <- logical g*S+s (class docs)
    groups = cols // gs
    q = np.ascontiguousarray(
        np.asarray(q).reshape(rows, groups, gs).transpose(0, 2, 1).reshape(rows, cols)
    )
    return QuantTensor(
        q=put(jnp.asarray(q)),
        scale=put(jnp.asarray(scale)),
        offset=None if offset is None else put(jnp.asarray(offset)),
        fmt=fmt,
        rows=rows,
        cols=cols,
        group_size=gs,
    )


def requantize_rowwise(
    fmt: GGMLType, raw: np.ndarray, rows: int, cols: int, *, sharding=None
) -> QuantTensor:
    """Requantize any GGUF weight to per-ROW int8 (W8 per-channel, the
    standard weight-only int8 scheme): W[r, c] ~= row_scale[r] * q8[r, c].

    Serve-path representation for the fastest fused kernel: with one group
    per row the kernel applies scales to the [T, rows] OUTPUT instead of
    expanding them across all columns in VMEM (ops/pallas/qmatmul.py).
    Adds a bounded requantization error (<= 0.4% of each row's max) on top
    of the checkpoint's own quantization — a serve-mode trade, never used
    in parity mode.
    """
    from .. import native

    # native bf16 dequant is ~10x the numpy block decoders on big tensors;
    # the bf16 rounding detour is far inside the int8 requant error budget
    words = native.dequant_bf16(np.asarray(raw), int(fmt), rows, cols)
    if words is not None:
        w = (words.astype(np.uint32) << 16).view(np.float32)
    else:
        w = layouts.dequantize(raw, fmt, rows, cols)  # exact f32
    amax = np.abs(w).max(axis=1)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q8 = np.clip(np.rint(w / scale[:, None]), -127, 127).astype(np.int8)

    def put(x):
        if sharding is None:
            return jax.device_put(x)
        if hasattr(sharding, "for_array"):  # parallel.sharding._LeafSharding
            return jax.device_put(x, sharding.for_array(x))
        return jax.device_put(x, sharding)

    return QuantTensor(
        q=put(jnp.asarray(q8)),
        scale=put(jnp.asarray(scale[:, None])),
        offset=None,
        fmt=GGMLType(fmt),
        rows=rows,
        cols=cols,
        group_size=cols,  # one group per row => strided layout is identity
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "scale", "offset"],
    meta_fields=["fmt", "rows", "cols", "group_size", "centered"],
)
@dataclasses.dataclass
class Q4Tensor:
    """True 4-bit packed quantized weight: 0.5 bytes per weight in HBM.

    LOSSLESS repack of 4-bit GGUF encodings (Q4_0 centered quants, Q4_K
    unsigned quants + min offsets): the group scales/offsets are kept
    exactly, only the int8 planar storage is nibble-packed.

    Layout: device column c of the group-strided order (see QuantTensor)
    lives in the LOW nibble of ``packed[:, c]`` for c < cols/2 and in the
    HIGH nibble of ``packed[:, c - cols/2]`` otherwise. Because
    cols/2 = (group_size/2) * groups, columns c and c + cols/2 share the
    same group (c mod groups), so one lane-tiled scale expansion covers the
    unpacked [lo | hi] concatenation inside the kernel
    (ops/pallas/q4matmul.py).

    ``centered``: quants stored as q+8 with value (q-8)*scale (Q4_0);
    otherwise value q*scale - offset (Q4_K).
    """

    packed: Array  # int8 [rows, cols//2] (nibble pairs; int8 for Mosaic casts)
    scale: Array  # f32 [rows, groups]
    offset: Optional[Array]  # f32 [rows, groups] or None
    fmt: GGMLType
    rows: int
    cols: int
    group_size: int
    centered: bool

    @property
    def act_quant(self) -> str:
        return ACT_QUANT[self.fmt]

    @property
    def groups(self) -> int:
        return self.cols // self.group_size

    def stride_activations(self, x: Array) -> Array:
        shape = x.shape
        xg = x.reshape(shape[:-1] + (self.groups, self.group_size))
        return jnp.swapaxes(xg, -1, -2).reshape(shape)

    def dequant(self, dtype=jnp.float32) -> Array:
        lo = (self.packed & 0xF).astype(jnp.int32)
        hi = ((self.packed >> 4) & 0xF).astype(jnp.int32)
        q = jnp.concatenate([lo, hi], axis=1)  # device-strided column order
        if self.centered:
            q = q - 8
        qg = q.reshape(self.rows, self.group_size, self.groups).transpose(0, 2, 1)
        w = qg.astype(jnp.float32) * self.scale[..., None]
        if self.offset is not None:
            w = w - self.offset[..., None]
        return w.reshape(self.rows, self.cols).astype(dtype)


def maskdot_block_geom(cols: int, group_size: int,
                       shard: int = 1) -> Optional[tuple[int, int, int, int]]:
    """Contraction-block geometry for the masked-dot lossless matmul
    (ops/pallas/fused_decode_q.py): split the C columns into blocks of
    BG groups (BG*group_size columns each) so the per-block group-partial
    dot rides the MXU's A-operand sublane slot (M = BG <= 16).

    ``shard > 1``: pick the largest BG whose block ALSO divides a 1/shard
    contraction slice — the TP megakernel (fused_decode_q_tp.py) shards
    wo/w_down by whole contraction blocks, so the sign-hi scale folding
    (TQ4Tensor) survives the slice.

    Returns (BG, BC, n_blocks, Mp) — Mp is BG padded to the f32 sublane
    tile (8) so block slices of the padded transposed scale stay aligned —
    or None when no block size divides ``cols`` (and the shard slice).
    """
    for bg in (16, 12, 8, 4):
        bc = bg * group_size
        if cols % bc:
            continue
        if shard > 1 and (cols % shard or (cols // shard) % bc):
            continue
        mp = bg if bg % 8 == 0 else ((bg + 7) // 8) * 8
        return bg, bc, cols // bc, mp
    return None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qT", "sT", "offT"],
    meta_fields=["fmt", "rows", "cols", "group_size", "bg", "mp"],
)
@dataclasses.dataclass
class TQuantTensor:
    """Transposed planar quantized weight for the masked-dot megakernel.

    Same exact values as :class:`QuantTensor`, stored contraction-major:

      - ``qT``  int8 [..., cols, rows] — logical column order (NOT
        group-strided): qT[..., c, r] is the integer quant of W[r, c].
      - ``sT``  f32 [..., n_blocks*mp, rows] — per-group scales, transposed
        and block-padded: rows [b*mp, b*mp+bg) hold the scales of groups
        [b*bg, (b+1)*bg); padding rows are zero.
      - ``offT`` same layout for Q4_K's min offsets, or None.

    The leading ``...`` is the stacked [n_layers] axis (stack_layers).
    Every minor dim is 128-tile-friendly, so the megakernel DMAs per-layer
    slices directly; scales stay exact f32 end-to-end (better than the
    per-matmul fused kernel's bf16-rounded scales).
    """

    qT: Array
    sT: Array
    offT: Optional[Array]
    fmt: GGMLType
    rows: int
    cols: int
    group_size: int
    bg: int  # groups per contraction block
    mp: int  # sublane-padded rows per block in sT/offT

    @property
    def act_quant(self) -> str:
        return ACT_QUANT[self.fmt]

    @property
    def groups(self) -> int:
        return self.cols // self.group_size

    @property
    def n_blocks(self) -> int:
        return self.cols // (self.bg * self.group_size)

    def _scale_rg(self, t: Array) -> Array:
        """[..., n_blocks*mp, rows] padded-transposed -> [..., rows, groups]."""
        lead = t.shape[:-2]
        tb = t.reshape(lead + (self.n_blocks, self.mp, self.rows))
        tb = tb[..., : self.bg, :]  # strip padding rows
        s = tb.reshape(lead + (self.groups, self.rows))
        return jnp.swapaxes(s, -1, -2)

    def dequant(self, dtype=jnp.float32) -> Array:
        """[..., rows, cols] logical dequantization (XLA prefill path)."""
        q = jnp.swapaxes(self.qT, -1, -2).astype(jnp.float32)  # [..., R, C]
        lead = q.shape[:-2]
        qg = q.reshape(lead + (self.rows, self.groups, self.group_size))
        w = qg * self._scale_rg(self.sT)[..., None]
        if self.offT is not None:
            w = w - self._scale_rg(self.offT)[..., None]
        return w.reshape(lead + (self.rows, self.cols)).astype(dtype)


def transpose_for_maskdot(qt: QuantTensor,
                          shard: int = 1) -> Optional[TQuantTensor]:
    """One-time repack of a (stacked or single) QuantTensor into the
    masked-dot transposed layout. Returns None when no block geometry
    divides the columns. Exact: only device transposes/zero-padding.
    ``shard``: see maskdot_block_geom (TP whole-block slices)."""
    geom = maskdot_block_geom(qt.cols, qt.group_size, shard)
    if geom is None:
        return None
    bg, bc, nblk, mp = geom
    gs, G, R, C = qt.group_size, qt.groups, qt.rows, qt.cols
    q = qt.q
    lead = q.shape[:-2]
    # group-strided storage -> logical column order -> transpose
    ql = q.reshape(lead + (R, gs, G))
    ql = jnp.swapaxes(ql, -1, -2).reshape(lead + (R, C))
    qT = jnp.swapaxes(ql, -1, -2)  # [..., C, R]

    def pad_t(s: Array) -> Array:
        # [..., R, G] -> [..., nblk, mp, R] zero-padded -> [..., nblk*mp, R]
        st = jnp.swapaxes(s, -1, -2)  # [..., G, R]
        st = st.reshape(lead + (nblk, bg, R))
        pad = [(0, 0)] * (st.ndim - 2) + [(0, mp - bg), (0, 0)]
        st = jnp.pad(st, pad)
        return st.reshape(lead + (nblk * mp, R))

    return TQuantTensor(
        qT=jax.device_put(qT),
        sT=jax.device_put(pad_t(qt.scale)),
        offT=None if qt.offset is None else jax.device_put(pad_t(qt.offset)),
        fmt=qt.fmt,
        rows=R,
        cols=C,
        group_size=gs,
        bg=bg,
        mp=mp,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packedT", "sT", "offT"],
    meta_fields=["fmt", "rows", "cols", "group_size", "bg", "mp", "centered"],
)
@dataclasses.dataclass
class TQ4Tensor:
    """Nibble-packed variant of :class:`TQuantTensor`: 0.5 B/weight in HBM
    for 4-bit encodings, unpacked inside the masked-dot megakernel.

    Packing is BLOCK-PAIRED so each contraction block unpacks from a
    contiguous slice: within block b (rows [b*BC, (b+1)*BC) of the
    transposed [cols, rows] layout, BC = bg*group_size), row j < BC/2
    holds the LOW nibble and row j + BC/2 the HIGH nibble of
    ``packedT[b*BC/2 + j]``.

    SIGN-HI ("E") encoding — chosen so the in-kernel unpack needs ONLY
    int8 ANDs (Mosaic legalizes no sub-32-bit vector shifts/subs;
    tools/probe_q4_unpack.py measured the AND-only unpack at 1.65x the
    int32-widening one):

      - low nibble stores the RAW quant n_lo (0..15); ``B & 0x0F``
        recovers it, and its centering/offset rides the offset term;
      - high nibble stores ``n_hi ^ 8`` so ``B & 0xF0`` IS the int8 value
        ``16*(n_hi - 8)`` exactly — the /16 and the +8 rebias are folded
        into the stored scales/offsets below.

    Scale/offset folding (``sT``/``offT`` are NOT the plain per-group
    values): within each block, rows m < bg/2 (low-nibble groups) hold
    ``s`` and ``off``; rows m >= bg/2 (high-nibble groups) hold ``s/16``
    and ``off - 8*s``. ``centered`` (Q4_0, offT None): the kernel applies
    the low groups' implicit ``off = 8*s`` via a sublane mask; the high
    groups need no term (8s - 8s = 0).

    RAW-f16 scales (``sT.dtype == float16``, centered/offset-free
    formats only): sT holds the UNfolded per-group ``d`` exactly as the
    GGUF block stores it — f16 in, f16 kept, zero rounding — at HALF the
    HBM bytes of the folded f32 form (scales are ~20% of a Q4_0 stream).
    Consumers apply the sign-hi /16 on the high-group rows themselves in
    f32 (an exact exponent shift): the streamed capacity megakernel does
    (fused_decode_stream._tile_dot), and _true_scale_off below skips the
    unfold."""

    packedT: Array  # int8 [..., cols//2, rows]
    sT: Array  # f32 [..., n_blocks*mp, rows] (TQuantTensor layout)
    offT: Optional[Array]
    fmt: GGMLType
    rows: int
    cols: int
    group_size: int
    bg: int
    mp: int
    centered: bool

    @property
    def act_quant(self) -> str:
        return ACT_QUANT[self.fmt]

    @property
    def groups(self) -> int:
        return self.cols // self.group_size

    @property
    def n_blocks(self) -> int:
        return self.cols // (self.bg * self.group_size)

    def _unpacked_qT(self) -> Array:
        """[..., cols, rows] int32 logical transposed RAW quants (0..15;
        undoes the sign-hi XOR)."""
        lead = self.packedT.shape[:-2]
        bc = self.bg * self.group_size
        h = bc // 2
        p = self.packedT.reshape(lead + (self.n_blocks, h, self.rows))
        p32 = p.astype(jnp.int32) & 0xFF
        lo = p32 & 0xF
        hi = ((p32 >> 4) & 0xF) ^ 8  # sign-hi encoding
        q = jnp.concatenate([lo, hi], axis=-2)  # [..., nblk, bc, rows]
        if self.centered:
            q = q - 8
        return q.reshape(lead + (self.cols, self.rows))

    def _true_scale_off(self) -> tuple[Array, Optional[Array]]:
        """Undo the sign-hi folding: plain per-group [..., rows, groups]
        scales (and offsets, when present)."""
        lead = self.sT.shape[:-2]
        hg = self.bg // 2

        def blocks(t):
            tb = t.reshape(lead + (self.n_blocks, self.mp, self.rows))
            return tb[..., : self.bg, :]

        def rg(tb):
            s = tb.reshape(lead + (self.groups, self.rows))
            return jnp.swapaxes(s, -1, -2)

        if self.sT.dtype == jnp.float16:  # RAW-f16: nothing folded
            assert self.offT is None
            return rg(blocks(self.sT).astype(jnp.float32)), None

        sb = blocks(self.sT)
        s_true = sb.at[..., hg :, :].multiply(16.0)
        ob = None
        if self.offT is not None:
            ob = blocks(self.offT)
            ob = ob.at[..., hg :, :].add(8.0 * s_true[..., hg :, :])

        return rg(s_true), None if ob is None else rg(ob)

    def dequant(self, dtype=jnp.float32) -> Array:
        q = jnp.swapaxes(self._unpacked_qT(), -1, -2).astype(jnp.float32)
        lead = q.shape[:-2]
        qg = q.reshape(lead + (self.rows, self.groups, self.group_size))
        s_rg, off_rg = self._true_scale_off()
        w = qg * s_rg[..., None]
        if off_rg is not None:
            w = w - off_rg[..., None]
        return w.reshape(lead + (self.rows, self.cols)).astype(dtype)


def _fold_scales_signhi(sT, offT, *, nblk, bg, mp, xp=jnp):
    """Sign-hi scale/offset folding (TQ4Tensor docstring): high-nibble
    group rows get s/16 and off - 8*s. Works on jnp or np arrays."""
    lead = sT.shape[:-2]
    R = sT.shape[-1]
    hg = bg // 2
    sb = xp.asarray(sT, dtype=xp.float32).reshape(lead + (nblk, mp, R))
    ob = None
    if offT is not None:
        ob = xp.asarray(offT, dtype=xp.float32).reshape(lead + (nblk, mp, R))
        if xp is jnp:
            ob = ob.at[..., hg:bg, :].add(-8.0 * sb[..., hg:bg, :])
        else:
            ob = ob.copy()
            ob[..., hg:bg, :] -= 8.0 * sb[..., hg:bg, :]
        ob = ob.reshape(lead + (nblk * mp, R))
    if xp is jnp:
        sb = sb.at[..., hg:bg, :].multiply(1.0 / 16.0)
    else:
        sb = sb.copy()
        sb[..., hg:bg, :] *= 1.0 / 16.0
    return sb.reshape(lead + (nblk * mp, R)), ob


def pack_maskdot_q4(t: TQuantTensor) -> Optional[TQ4Tensor]:
    """Block-paired nibble packing of a 4-bit TQuantTensor (lossless,
    sign-hi encoding — see TQ4Tensor). None when the format's quants
    don't span 4 bits or BC is odd."""
    if t.fmt not in (GGMLType.Q4_0, GGMLType.Q4_K):
        return None
    bc = t.bg * t.group_size
    if bc % 2:
        return None
    centered = t.fmt == GGMLType.Q4_0
    lead = t.qT.shape[:-2]
    q = t.qT.astype(jnp.int32)
    if centered:
        q = q + 8  # [-8, 7] -> [0, 15]
    qb = q.reshape(lead + (t.n_blocks, bc, t.rows))
    h = bc // 2
    lo = qb[..., :h, :]
    hi = qb[..., h:, :] ^ 8  # sign-hi
    p = lo | (hi << 4)
    p8 = ((p + 128) % 256 - 128).astype(jnp.int8)
    sT_f, offT_f = _fold_scales_signhi(t.sT, t.offT, nblk=t.n_blocks,
                                       bg=t.bg, mp=t.mp)
    return TQ4Tensor(
        packedT=jax.device_put(p8.reshape(lead + (t.cols // 2, t.rows))),
        sT=jax.device_put(sT_f),
        offT=None if offT_f is None else jax.device_put(offT_f),
        fmt=t.fmt,
        rows=t.rows,
        cols=t.cols,
        group_size=t.group_size,
        bg=t.bg,
        mp=t.mp,
        centered=centered,
    )


def unpack_q4_to_quant(q4: Q4Tensor) -> QuantTensor:
    """Device unpack of a nibble-packed Q4Tensor back to planar int8
    (exact; the strided column order is preserved)."""
    p32 = q4.packed.astype(jnp.int32) & 0xFF
    lo = p32 & 0xF
    hi = (p32 >> 4) & 0xF
    q = jnp.concatenate([lo, hi], axis=-1)  # device-strided column order
    if q4.centered:
        q = q - 8
    return QuantTensor(
        q=q.astype(jnp.int8),
        scale=q4.scale,
        offset=q4.offset,
        fmt=q4.fmt,
        rows=q4.rows,
        cols=q4.cols,
        group_size=q4.group_size,
    )


def pack_q4_host(
    raw: np.ndarray, fmt: GGMLType, rows: int, cols: int, *, sharding=None
) -> Optional[Q4Tensor]:
    """Build a nibble-packed Q4Tensor straight from raw GGUF block bytes,
    packing on the HOST — only the 0.5 B/weight packed array (plus scales)
    ever crosses to the device. ``pack_q4`` by contrast round-trips the
    full int8 planar tensor through device memory (12 GB each way for a
    12B checkpoint over a tunnel-attached chip)."""
    fmt = GGMLType(fmt)
    if fmt not in (GGMLType.Q4_0, GGMLType.Q4_K):
        return None
    plan = _PLANAR[fmt]
    gs = 32
    native_out = _native_repack(raw, int(fmt), rows, cols, gs)
    if native_out is not None:
        q, scale, offset = native_out
    else:
        q, scale, offset, gs = plan(raw, rows, cols)
    groups = cols // gs
    if cols % 2 or (gs // 2) * groups != cols // 2:
        return None
    # group-strided column order (QuantTensor contract), then nibble-pack
    q = np.asarray(q).reshape(rows, groups, gs).transpose(0, 2, 1).reshape(rows, cols)
    centered = fmt == GGMLType.Q4_0
    u = (q + 8 if centered else q).astype(np.uint8)
    half = cols // 2
    packed = (u[:, :half] | (u[:, half:] << 4)).astype(np.uint8).view(np.int8)

    def put(x):
        x = jnp.asarray(x)
        if sharding is None:
            return jax.device_put(x)
        if hasattr(sharding, "for_array"):
            return jax.device_put(x, sharding.for_array(x))
        return jax.device_put(x, sharding)

    return Q4Tensor(
        packed=put(packed),
        scale=put(np.asarray(scale, dtype=np.float32)),
        offset=None if offset is None else put(np.asarray(offset, dtype=np.float32)),
        fmt=fmt,
        rows=rows,
        cols=cols,
        group_size=gs,
        centered=centered,
    )


def pack_q4(qt: QuantTensor) -> Optional[Q4Tensor]:
    """Losslessly nibble-pack a 4-bit-quant QuantTensor (Q4_0/Q4_K); None
    when the format's quants don't fit 4 bits or dims don't halve cleanly."""
    if qt.fmt not in (GGMLType.Q4_0, GGMLType.Q4_K):
        return None
    if qt.cols % 2 or (qt.group_size // 2) * qt.groups != qt.cols // 2:
        return None
    centered = qt.fmt == GGMLType.Q4_0
    q = np.asarray(qt.q)
    u = (q + 8 if centered else q).astype(np.uint8)  # 0..15
    half = qt.cols // 2
    # int8 storage: Mosaic has no uint8->bf16 cast (kernel re-masks nibbles)
    packed = (u[:, :half] | (u[:, half:] << 4)).astype(np.uint8).view(np.int8)
    return Q4Tensor(
        packed=jax.device_put(jnp.asarray(packed)),
        scale=qt.scale,
        offset=qt.offset,
        fmt=qt.fmt,
        rows=qt.rows,
        cols=qt.cols,
        group_size=qt.group_size,
        centered=centered,
    )


def maskdot_host_parts(
    raw: np.ndarray, fmt: GGMLType, rows: int, cols: int, *, q4: bool = True,
    scale_f16: bool = False,
) -> Optional[dict]:
    """Build the masked-dot transposed layout (TQuantTensor / TQ4Tensor
    arrays) straight from raw GGUF block bytes ON THE HOST.

    The device-side route (transpose_for_maskdot + pack_maskdot_q4) needs
    the full int8 planar tensor resident in HBM first — ~12 GB of
    transients for a 12B checkpoint, which cannot coexist with the final
    weights on a 16 GB chip. This builds the exact same arrays in numpy so
    only the final layout ever crosses to the device (the capacity-class
    load path, models/weights.py load_maskdot_stacked).

    Returns numpy arrays (no device_put — the caller stacks layers first):
    ``{'qT' | 'packedT', 'sT', 'offT', 'fmt', 'gs', 'bg', 'mp',
    'centered'}``; None when the format/geometry has no maskdot plan.
    """
    fmt = GGMLType(fmt)
    plan = _PLANAR.get(fmt)
    if plan is None:
        return None
    gs = 16 if fmt == GGMLType.Q6_K else 32
    native_out = _native_repack(np.asarray(raw), int(fmt), rows, cols, gs)
    if native_out is not None:
        q, scale, offset = native_out
    else:
        q, scale, offset, gs = plan(np.asarray(raw), rows, cols)
    geom = maskdot_block_geom(cols, gs)
    if geom is None:
        return None
    bg, bc, nblk, mp = geom
    q = np.asarray(q).reshape(rows, cols)  # logical column order
    from .. import native as _native

    qT = _native.transpose_i8(q)  # cache-blocked C++ (3x numpy strided)
    if qT is None:
        qT = np.ascontiguousarray(q.T)  # [C, R] int8

    def pad_t(s: np.ndarray) -> np.ndarray:
        # [R, G] -> [G, R] -> [nblk, bg, R] zero-padded to mp -> [nblk*mp, R]
        st = np.ascontiguousarray(np.asarray(s, dtype=np.float32).T)
        st = st.reshape(nblk, bg, rows)
        if mp != bg:
            st = np.pad(st, [(0, 0), (0, mp - bg), (0, 0)])
        return st.reshape(nblk * mp, rows)

    out = dict(
        qT=qT, packedT=None,
        sT=pad_t(scale),
        offT=None if offset is None else pad_t(offset),
        fmt=fmt, gs=gs, bg=bg, mp=mp, centered=False,
    )
    if q4 and fmt in (GGMLType.Q4_0, GGMLType.Q4_K) and bc % 2 == 0:
        # block-paired nibble packing (TQ4Tensor contract, sign-hi
        # encoding): within block b, transposed row j < bc/2 is the LOW
        # nibble, j + bc/2 the HIGH one XORed with 8; scales/offsets of
        # the high-nibble groups are folded (s/16, off - 8s)
        centered = fmt == GGMLType.Q4_0
        u = (qT + 8 if centered else qT).astype(np.uint8)
        ub = u.reshape(nblk, bc, rows)
        h = bc // 2
        packed = (ub[:, :h, :] | ((ub[:, h:, :] ^ 8) << 4)).astype(np.uint8)
        out["packedT"] = packed.view(np.int8).reshape(cols // 2, rows)
        out["qT"] = None
        out["centered"] = centered
        if scale_f16 and centered and out["offT"] is None:
            # RAW-f16 scales (TQ4Tensor docstring): keep the per-group d
            # EXACTLY as the checkpoint stores it — it was f16 in the
            # GGUF block, so f32 -> f16 here round-trips bit-exactly —
            # and let the kernel apply the sign-hi /16 in f32. Halves the
            # scale stream (~0.67 GB/step on the 12B). Offset formats
            # (Q4_K) keep folded f32: d*sc products exceed f16 mantissa.
            out["sT"] = out["sT"].astype(np.float16)
        else:
            out["sT"], offT_f = _fold_scales_signhi(
                out["sT"], out["offT"], nblk=nblk, bg=bg, mp=mp, xp=np)
            out["offT"] = offT_f
    return out
