"""TPU-target lowering smoke tests: export every Pallas megakernel to the
Mosaic TPU target WITHOUT hardware (jax.export platforms=['tpu']). This
runs the full Pallas->Mosaic-dialect lowering and verification — the
stage that catches unsupported ops, layout violations, and shape rule
breaks — so kernels that have only ever run in interpreter mode can't
reach the real chip with structural errors. (It does not run the final
Mosaic register/VMEM allocation; that still needs the device.)"""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
from jax import export

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import load_weights
from llm_inference_tpu.models.gemma import KVCache
from llm_inference_tpu.models.weights import fuse_projections, stack_layers

from fixtures import build_gemma3_gguf


def _rowq8_stacked(n_layers=3):
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=n_layers, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=True,
    )
    hp, w = load_weights(GGUFFile(buf), mode="rowq8")
    w = fuse_projections(w)
    return hp, dataclasses.replace(w, layers=stack_layers(w.layers))


def _lower_tpu(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exp.platforms == ("tpu",)
    return exp


def test_single_stream_megakernel_lowers():
    from llm_inference_tpu.ops.pallas.fused_decode import decode_step_megakernel

    hp, ws = _rowq8_stacked()
    cache = KVCache(k=jnp.zeros((3, 64, 2, 128), jnp.bfloat16),
                    v=jnp.zeros((3, 64, 2, 128), jnp.bfloat16))
    _lower_tpu(lambda w_, c_: decode_step_megakernel(
        hp, w_, c_, jnp.int32(9), jnp.int32(3)), ws, cache)


@pytest.mark.parametrize("kv_slots", [2, 1])
def test_batched_megakernel_lowers(monkeypatch, kv_slots):
    import llm_inference_tpu.ops.pallas.fused_decode_batch as fdb

    hp, ws = _rowq8_stacked()
    if kv_slots == 1:
        # budget that admits one cache slab but not two at these shapes
        monkeypatch.setattr(fdb, "_BUFFER_BUDGET", 2 * 1179648 + 450_000)
    B, S = 3, 64
    cache = KVCache(k=jnp.zeros((3, B, S, 2, 128), jnp.bfloat16),
                    v=jnp.zeros((3, B, S, 2, 128), jnp.bfloat16))
    toks = jnp.asarray([9, 12, 14], jnp.int32)
    pos = jnp.asarray([3, 2, 5], jnp.int32)
    _lower_tpu(lambda w_, c_, t_, p_: fdb.decode_step_megakernel_batch(
        hp, w_, c_, t_, p_), ws, cache, toks, pos)
    # in-kernel greedy argmax variant lowers too
    _lower_tpu(lambda w_, c_, t_, p_: fdb.decode_step_megakernel_batch(
        hp, w_, c_, t_, p_, greedy=True), ws, cache, toks, pos)


def _q4_struct(rows, cols):
    """TQ4Tensor of ShapeDtypeStructs at the given geometry (no data —
    lets the 12B kernel lower without building an 8 GB checkpoint)."""
    from llm_inference_tpu.quant.device import TQ4Tensor, maskdot_block_geom
    from llm_inference_tpu.gguf.constants import GGMLType

    L = 48
    gs = 32
    bg, bc, nblk, mp = maskdot_block_geom(cols, gs)
    sd = jax.ShapeDtypeStruct
    return TQ4Tensor(
        packedT=sd((L, cols // 2, rows), jnp.int8),
        sT=sd((L, nblk * mp, rows), jnp.float32),
        offT=None,
        fmt=GGMLType.Q4_0, rows=rows, cols=cols, group_size=gs,
        bg=bg, mp=mp, centered=True,
    )


def test_streamed_capacity_kernel_lowers_12b_geometry():
    """The streamed capacity kernel at the REAL Gemma-3-12B geometry
    (48 layers, d=3840, ffn=15360, 16/8 heads, head_dim 256, vocab
    262144, serve-q4) lowers to the Mosaic TPU target — multi-tile
    streaming, cross-part prefetch, adaptive TN, 386 unrolled dots."""
    from llm_inference_tpu.models.hparams import HParams
    from llm_inference_tpu.models.weights import LayerWeights, ModelWeights
    from llm_inference_tpu.ops.pallas.fused_decode_stream import (
        decode_step_megakernel_stream,
        megakernel_stream_supported,
    )
    from llm_inference_tpu.quant.device import DenseTensor

    L, D, F = 48, 3840, 15360
    H, Hkv, dk, dv = 16, 8, 256, 256
    V, S = 262144, 1024
    sd = jax.ShapeDtypeStruct
    vec = lambda n: sd((L, n), jnp.float32)
    layers = LayerWeights(
        wqkv=_q4_struct(H * dk + Hkv * (dk + dv), D),
        wo=_q4_struct(D, H * dv),
        w_gate_up=_q4_struct(2 * F, D),
        w_down=_q4_struct(D, F),
        attn_norm=vec(D), ffn_norm=vec(D),
        q_norm=vec(dk), k_norm=vec(dk),
        post_attn_norm=vec(D), post_ffw_norm=vec(D),
    )
    from llm_inference_tpu.gguf.constants import GGMLType

    w = ModelWeights(
        token_embd=DenseTensor(w=sd((V, D), jnp.bfloat16),
                               fmt=GGMLType.F16, rows=V, cols=D),
        output_norm=sd((D,), jnp.float32),
        layers=layers,
    )
    hp = HParams(
        architecture="gemma3", block_count=L, embedding_length=D,
        feed_forward_length=F, n_head=H, n_head_kv=Hkv,
        rms_eps=1e-6, rope_freq_base=1e6, rope_freq_scale=1.0,
        n_embd_head_k=dk, n_embd_head_v=dv,
        n_embd_head_k_swa=dk, n_embd_head_v_swa=dv,
        f_attention_scale=dk**-0.5, f_max_alibi_bias=0.0,
        attn_soft_cap=0.0, swa_layers=(), sliding_window=0,
        final_logit_softcap=0.0,
        embedding_length_per_layer=0, n_layer_kv_from_start=-1,
        vocab_size=V,
    )
    assert megakernel_stream_supported(hp, w, max_seq=S)
    cache = KVCache(
        k=sd((L, S, Hkv, dk), jnp.bfloat16),
        v=sd((L, S, Hkv, dv), jnp.bfloat16),
    )
    _lower_tpu(lambda w_, c_: decode_step_megakernel_stream(
        hp, w_, c_, jnp.int32(9), jnp.int32(3)), w, cache)


def test_flash_decode_with_starts_lowers():
    """The SWA 'starts' lower bound (flash + paged flash) must Mosaic-lower
    for the TPU target — the window path has only run in interpret mode."""
    from llm_inference_tpu.ops.pallas.flash_decode import (
        flash_decode,
        paged_flash_decode,
    )

    B, S, H, Hkv, dk, dv, page = 2, 512, 4, 2, 128, 128, 256
    q = jnp.zeros((B, H, dk), jnp.float32)
    k = jnp.zeros((B, S, Hkv, dk), jnp.bfloat16)
    v = jnp.zeros((B, S, Hkv, dv), jnp.bfloat16)
    lengths = jnp.asarray([300, 37], jnp.int32)
    starts = jnp.asarray([290, 0], jnp.int32)
    _lower_tpu(lambda q_, k_, v_, l_, s_: flash_decode(q_, k_, v_, l_, s_),
               q, k, v, lengths, starts)

    nb = S // page
    table = jnp.arange(B * nb, dtype=jnp.int32).reshape(B, nb)
    kp = jnp.zeros((B * nb, page, Hkv, dk), jnp.bfloat16)
    vp = jnp.zeros((B * nb, page, Hkv, dv), jnp.bfloat16)
    _lower_tpu(lambda q_, k_, v_, t_, l_, s_: paged_flash_decode(
        q_, k_, v_, t_, l_, s_), q, kp, vp, table, lengths, starts)
