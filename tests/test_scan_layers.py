"""Scan-over-layers forward must match the unrolled forward exactly (same
math, one compiled body), and engines must pick it automatically."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from functools import partial

from llm_inference_tpu.gguf import GGUFFile, GGMLType
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.weights import layers_stackable, stack_layers

from fixtures import build_gemma3_gguf, build_gemma4_gguf


def test_stackable_detection():
    g3 = GGUFFile(build_gemma3_gguf(n_layers=3))
    hp, w = load_weights(g3)
    assert layers_stackable(hp, w.layers)

    g4 = GGUFFile(build_gemma4_gguf(n_layers=4, shared_kv_layers=1))
    hp4, w4 = load_weights(g4)
    assert not layers_stackable(hp4, w4.layers)  # shared KV is heterogeneous


@pytest.mark.parametrize("exact", [True, False])
def test_scan_matches_unrolled(exact):
    buf = build_gemma3_gguf(n_layers=3, seed=5)
    g = GGUFFile(buf)
    hp, w = load_weights(g)
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))

    fwd_u = jax.jit(partial(forward, hp, exact=exact))
    fwd_s = jax.jit(partial(forward, hp, exact=exact))

    cache_u = init_cache(hp, 32)
    cache_s = init_cache(hp, 32, stacked=True)

    tokens = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    lu, cache_u = fwd_u(w, cache_u, tokens, 0)
    ls, cache_s = fwd_s(w_stacked, cache_s, tokens, 0)
    np.testing.assert_allclose(np.asarray(lu), np.asarray(ls), atol=1e-5)

    # decode step exercising both cache layouts
    lu2, _ = fwd_u(w, cache_u, jnp.asarray([9], dtype=jnp.int32), 3)
    ls2, _ = fwd_s(w_stacked, cache_s, jnp.asarray([9], dtype=jnp.int32), 3)
    np.testing.assert_allclose(np.asarray(lu2), np.asarray(ls2), atol=1e-5)


def test_engine_uses_scan_path(monkeypatch):
    from llm_inference_tpu.engine import Engine

    buf = build_gemma3_gguf(n_layers=3, seed=5)
    monkeypatch.setenv("LLMI_SCAN_LAYERS", "1")
    serve = Engine(GGUFFile(buf), max_seq=64, mode="serve", decode_chunk=4)
    assert serve._stacked
    parity = Engine(GGUFFile(buf), max_seq=64, mode="parity", decode_chunk=4)
    assert not parity._stacked  # keeps the tappable unrolled path

    out = serve.generate_from_ids([2, 7, 8], n_predict=4)
    assert all(isinstance(t, int) for t in out)

    monkeypatch.setenv("LLMI_SCAN_LAYERS", "0")
    default = Engine(GGUFFile(buf), max_seq=64, mode="serve", decode_chunk=4)
    assert not default._stacked  # scan is opt-in
