"""Fused decode megakernel (ops/pallas/fused_decode.py): the one-call-per-
layer serve path must match the plain XLA serve path on the same rowq8
weights. Runs the kernel in Pallas interpreter mode on the CPU backend
(LLMI_FUSED_INTERPRET gates both eligibility and interpretation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from functools import partial

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.gemma import _fused_decode_supported
from llm_inference_tpu.models.weights import fuse_projections

from fixtures import build_gemma3_gguf


@pytest.fixture()
def fused_env(monkeypatch):
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")


def _model(with_post_norms=True, n_layers=2):
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=n_layers, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=64, vocab=vocab, with_post_norms=with_post_norms,
    )
    hp, w = load_weights(GGUFFile(buf), mode="rowq8")
    return hp, fuse_projections(w)


@pytest.mark.parametrize("with_post_norms", [True, False])
def test_fused_decode_matches_xla_serve(fused_env, with_post_norms):
    hp, w = _model(with_post_norms)
    assert _fused_decode_supported(hp, w)

    cache_ref = init_cache(hp, 128, dtype=jnp.bfloat16)
    cache_fus = init_cache(hp, 128, dtype=jnp.bfloat16)
    fwd_ref = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    fwd_fus = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))

    toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    _, cache_ref = fwd_ref(w, cache_ref, toks, 0)
    _, cache_fus = fwd_ref(w, cache_fus, toks, 0)

    pos = 3
    for step in range(3):
        tok = jnp.asarray([9 + step], dtype=jnp.int32)
        d_ref, cache_ref = fwd_ref(w, cache_ref, tok, pos)
        d_fus, cache_fus = fwd_fus(w, cache_fus, tok, pos)
        pos += 1
        d_ref, d_fus = np.asarray(d_ref), np.asarray(d_fus)
        scale = max(1.0, np.abs(d_ref).max())
        # same model, same weights; differences are bf16 rounding-order
        np.testing.assert_allclose(d_fus, d_ref, atol=1.2e-2 * scale,
                                   err_msg=f"step {step}")
        assert d_ref.argmax() == d_fus.argmax()

    # caches must agree too (bf16 rows written by kernel vs XLA path)
    for a, b in zip(cache_ref.k, cache_fus.k):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32),
            atol=4e-2,  # one bf16 ulp of rounding-order freedom in rope
        )


def test_fused_ineligible_on_grouped_weights(fused_env):
    vocab = [f"t{i}" for i in range(256)]
    buf = build_gemma3_gguf(n_layers=1, n_embd=256, n_ff=512, n_head=4,
                            n_head_kv=2, head_dim=64, vocab=vocab)
    hp, w = load_weights(GGUFFile(buf), mode="packed-serve")  # grouped int8
    w = fuse_projections(w)
    assert not _fused_decode_supported(hp, w)
