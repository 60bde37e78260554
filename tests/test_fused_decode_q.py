"""Lossless whole-step decode megakernel (ops/pallas/fused_decode_q.py):
the masked-dot one-call-per-token path over transposed group-scaled
weights must match the XLA serve path on the same packed weights. Runs in
Pallas interpreter mode on the CPU backend."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# interpret-mode megakernel tests: minutes of CPU emulation; the fast
# CI gate (pytest -m 'not slow') skips them (VERDICT r2 weak #8)
pytestmark = pytest.mark.slow
from functools import partial

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.gguf.constants import GGMLType
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.gemma import _megakernel_q_enabled
from llm_inference_tpu.models.weights import (
    fuse_projections,
    maskdot_layers,
    stack_layers,
)
from llm_inference_tpu.ops.pallas.fused_decode_q import megakernel_q_supported
from llm_inference_tpu.quant.device import TQuantTensor

from fixtures import build_gemma3_gguf


def _model(with_post_norms=True, n_layers=3, weight_fmt=GGMLType.Q4_0):
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=n_layers, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=with_post_norms,
        weight_fmt=weight_fmt,
    )
    hp, w = load_weights(GGUFFile(buf), mode="packed-serve")
    return hp, fuse_projections(w)


@pytest.fixture()
def fused_env(monkeypatch):
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")


def test_transpose_roundtrip_exact():
    """TQuantTensor holds the SAME exact values as the strided QuantTensor."""
    hp, w = _model(n_layers=2)
    stacked = stack_layers(w.layers)
    for f in ("wqkv", "wo", "w_gate_up", "w_down"):
        qt = getattr(stacked, f)
        from llm_inference_tpu.quant.device import transpose_for_maskdot

        t = transpose_for_maskdot(qt)
        assert isinstance(t, TQuantTensor)
        got = np.asarray(t.dequant(jnp.float32))  # [L, R, C]
        for l, lw in enumerate(w.layers):
            want = np.asarray(getattr(lw, f).dequant(jnp.float32))
            np.testing.assert_array_equal(got[l], want, err_msg=f"{f}[{l}]")


@pytest.mark.parametrize("weight_fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
def test_megakernel_q_matches_xla_serve(fused_env, weight_fmt):
    """The masked-dot megakernel (incl. Q4_K's offset term) vs per-layer
    XLA serve on the same checkpoint."""
    hp, w = _model(weight_fmt=weight_fmt)
    stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert megakernel_q_supported(hp, stacked)
    wq = maskdot_layers(stacked)
    assert wq is not None
    assert megakernel_q_supported(hp, wq)
    assert _megakernel_q_enabled(hp, wq)
    if weight_fmt == GGMLType.Q4_K:
        assert wq.layers.wqkv.offT is not None

    cache_ref = init_cache(hp, 64, dtype=jnp.bfloat16)
    cache_fus = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
    fwd_ref = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    fwd_fus = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))

    toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    _, cache_ref = fwd_ref(w, cache_ref, toks, 0)
    _, cache_fus = fwd_fus(wq, cache_fus, toks, 0)

    pos = 3
    for step in range(3):
        tok = jnp.asarray([9 + step], dtype=jnp.int32)
        d_ref, cache_ref = fwd_ref(w, cache_ref, tok, pos)
        d_fus, cache_fus = fwd_fus(wq, cache_fus, tok, pos)
        pos += 1
        d_ref, d_fus = np.asarray(d_ref), np.asarray(d_fus)
        scale = max(1.0, np.abs(d_ref).max())
        # same exact weights; differences are bf16 rounding-order (the
        # megakernel applies scales in f32, the XLA path rounds the
        # dequantized matrix to bf16)
        np.testing.assert_allclose(d_fus, d_ref, atol=1.5e-2 * scale,
                                   err_msg=f"step {step}")
        assert d_ref.argmax() == d_fus.argmax()

    k_ref = np.stack([np.asarray(k, dtype=np.float32) for k in cache_ref.k])
    k_fus = np.asarray(cache_fus.k, dtype=np.float32)
    np.testing.assert_allclose(k_fus[:, :pos], k_ref[:, :pos], atol=4e-2)


def test_megakernel_q_applies_sliding_window(fused_env, monkeypatch):
    """Real SWA (LLMI_SWA_MASK=1) through the masked-dot megakernel: the
    per-layer window array must match the XLA windowed path and actually
    change the logits (VERDICT r4 item 6)."""
    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=2, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, sliding_window=8,
        swa_pattern=[True, False],
    )
    hp, w = load_weights(GGUFFile(buf), mode="packed-serve")
    w = fuse_projections(w)
    stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    wq = maskdot_layers(stacked)
    assert wq is not None
    from llm_inference_tpu.models.gemma import swa_active, window_array

    assert swa_active(hp)
    assert _megakernel_q_enabled(hp, wq)  # gate no longer trips on SWA

    cache_ref = init_cache(hp, 64, dtype=jnp.bfloat16)
    cache_fus = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
    fwd_ref = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    fwd_fus = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))

    # 12-token prompt > window 8: the mask must bite during decode
    toks = jnp.asarray([2, 7, 8, 9, 4, 5, 6, 3, 8, 7, 2, 9], dtype=jnp.int32)
    _, cache_ref = fwd_ref(w, cache_ref, toks, 0)
    _, cache_fus = fwd_fus(wq, cache_fus, toks, 0)

    pos = 12
    for step in range(2):
        tok = jnp.asarray([9 + step], dtype=jnp.int32)
        d_ref, cache_ref = fwd_ref(w, cache_ref, tok, pos)
        d_fus, cache_fus = fwd_fus(wq, cache_fus, tok, pos)
        pos += 1
        d_ref, d_fus = np.asarray(d_ref), np.asarray(d_fus)
        scale = max(1.0, np.abs(d_ref).max())
        np.testing.assert_allclose(d_fus, d_ref, atol=1.5e-2 * scale,
                                   err_msg=f"step {step}")
        assert d_ref.argmax() == d_fus.argmax()

    from llm_inference_tpu.ops.pallas.fused_decode_q import (
        decode_step_megakernel_q,
    )

    d_win, _, _ = decode_step_megakernel_q(
        hp, wq, cache_fus, jnp.int32(9), jnp.int32(pos),
        windows=window_array(hp), interpret=True)
    d_nowin, _, _ = decode_step_megakernel_q(
        hp, wq, cache_fus, jnp.int32(9), jnp.int32(pos),
        windows=None, interpret=True)
    assert np.abs(np.asarray(d_win) - np.asarray(d_nowin)).max() > 1e-4


@pytest.mark.parametrize("weight_fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
def test_megakernel_q4_packed_matches_xla_serve(fused_env, weight_fmt):
    """The nibble-packed (TQ4Tensor) megakernel variant: block-paired
    packing + in-kernel unpack must be value-identical to the int8 path."""
    from llm_inference_tpu.quant.device import TQ4Tensor

    hp, w = _model(weight_fmt=weight_fmt)
    stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    wq = maskdot_layers(stacked, q4=True)
    assert wq is not None
    assert isinstance(wq.layers.wqkv, TQ4Tensor)
    assert wq.layers.wqkv.centered == (weight_fmt == GGMLType.Q4_0)
    assert megakernel_q_supported(hp, wq)
    assert _megakernel_q_enabled(hp, wq)

    # packing is lossless: dequant identical to the int8 transposed form
    wq8 = maskdot_layers(stacked)
    np.testing.assert_array_equal(
        np.asarray(wq.layers.w_down.dequant(jnp.float32)),
        np.asarray(wq8.layers.w_down.dequant(jnp.float32)),
    )

    cache_ref = init_cache(hp, 64, dtype=jnp.bfloat16)
    cache_fus = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
    fwd_ref = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    fwd_fus = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))

    toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    _, cache_ref = fwd_ref(w, cache_ref, toks, 0)
    _, cache_fus = fwd_fus(wq, cache_fus, toks, 0)

    pos = 3
    for step in range(2):
        tok = jnp.asarray([9 + step], dtype=jnp.int32)
        d_ref, cache_ref = fwd_ref(w, cache_ref, tok, pos)
        d_fus, cache_fus = fwd_fus(wq, cache_fus, tok, pos)
        pos += 1
        d_ref, d_fus = np.asarray(d_ref), np.asarray(d_fus)
        scale = max(1.0, np.abs(d_ref).max())
        np.testing.assert_allclose(d_fus, d_ref, atol=1.5e-2 * scale,
                                   err_msg=f"step {step}")
        assert d_ref.argmax() == d_fus.argmax()


def test_maskdot_layers_from_q4tensor():
    """serve-q4 loads Q4Tensor leaves; maskdot_layers must unpack and
    re-pack them losslessly."""
    hp, w0 = _model(n_layers=2)
    # reload in packed-q4 mode to get Q4Tensor layer weights
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=2, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=True,
    )
    hp4, w4 = load_weights(GGUFFile(buf), mode="packed-q4")
    w4 = fuse_projections(w4)
    from llm_inference_tpu.quant.device import Q4Tensor

    assert isinstance(w4.layers[0].wqkv, Q4Tensor)
    stacked = dataclasses.replace(w4, layers=stack_layers(w4.layers))
    wq = maskdot_layers(stacked, q4=True)
    assert wq is not None
    got = np.asarray(wq.layers.wqkv.dequant(jnp.float32))
    for l, lw in enumerate(w0.layers):
        want = np.asarray(lw.wqkv.dequant(jnp.float32))
        np.testing.assert_array_equal(got[l], want, err_msg=f"layer {l}")


def test_megakernel_q_prefill_scan_path(fused_env):
    """Stacked TQuantTensor weights must also drive the scan-over-layers
    prefill (linear.py dequant branch): T>1 forward works and matches the
    unstacked XLA path."""
    hp, w = _model()
    wq = maskdot_layers(dataclasses.replace(w, layers=stack_layers(w.layers)))
    cache_a = init_cache(hp, 64, dtype=jnp.bfloat16)
    cache_b = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
    toks = jnp.asarray([2, 7, 8, 9], dtype=jnp.int32)
    la, _ = forward(hp, w, cache_a, toks, 0, exact=False, mm_impl="xla")
    lb, _ = forward(hp, wq, cache_b, toks, 0, exact=False, mm_impl="xla")
    la, lb = np.asarray(la), np.asarray(lb)
    scale = max(1.0, np.abs(la).max())
    np.testing.assert_allclose(lb, la, atol=1.5e-2 * scale)


def test_megakernel_q_ineligible_on_rowq8(fused_env):
    from llm_inference_tpu.models.gemma import _megakernel_enabled

    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=2, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab,
    )
    hp, w = load_weights(GGUFFile(buf), mode="rowq8")
    w = fuse_projections(w)
    stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert not megakernel_q_supported(hp, stacked)  # rowq8: groups == 1
    assert _megakernel_enabled(hp, stacked)  # the rowq8 kernel takes it
