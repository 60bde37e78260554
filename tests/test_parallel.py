"""Tensor-parallel sharding on the virtual 8-device CPU mesh: sharded
forward must produce the same logits as single-device, with weights
actually distributed (SURVEY.md §4's multi-chip-without-hardware recipe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from functools import partial

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.parallel import gemma_sharding_fn, kv_cache_sharding, make_mesh

from fixtures import build_gemma3_gguf

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def tp_setup():
    # head count == mesh size so heads, FFN rows, and quantized col-groups divide
    buf = build_gemma3_gguf(n_layers=2, n_embd=256, n_ff=512, n_head=8, n_head_kv=8, seed=3)
    mesh = make_mesh(model=8, data=1)
    return buf, mesh


def test_tp_weights_are_sharded(tp_setup):
    buf, mesh = tp_setup
    g = GGUFFile(buf)
    hp, w = load_weights(g, sharding_fn=gemma_sharding_fn(mesh))
    wq = w.layers[0].wq
    # row-parallel: 8 shards over rows
    assert len(wq.q.sharding.device_set) == 8
    down = w.layers[0].w_down
    assert len(down.q.sharding.device_set) == 8


def test_tp_logits_match_single_device(tp_setup):
    buf, mesh = tp_setup
    g = GGUFFile(buf)

    hp, w_single = load_weights(g)
    fwd = jax.jit(partial(forward, hp))
    cache = init_cache(hp, 32)
    tokens = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    golden, cache = fwd(w_single, cache, tokens, 0)
    golden2, _ = fwd(w_single, cache, jnp.asarray([9], dtype=jnp.int32), 3)

    hp, w_tp = load_weights(g, sharding_fn=gemma_sharding_fn(mesh))
    cache_tp = init_cache(hp, 32, sharding=kv_cache_sharding(mesh, hp.n_head_kv))
    fwd_tp = jax.jit(partial(forward, hp))
    got, cache_tp = fwd_tp(w_tp, cache_tp, tokens, 0)
    got2, _ = fwd_tp(w_tp, cache_tp, jnp.asarray([9], dtype=jnp.int32), 3)

    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(golden2), atol=2e-5)


def test_dp_replicated_batch_decode(tp_setup):
    """Data-parallel style: the batched server's vmapped decode also runs
    under a mesh with replicated weights (smoke: no resharding errors)."""
    buf, _ = tp_setup
    from llm_inference_tpu.serving import BatchedServer

    server = BatchedServer(GGUFFile(buf), max_seq=32, max_batch=2,
                           mode="parity", decode_chunk=2)
    outs = server.run([([2, 7], 3), ([2, 8], 3)])
    assert len(outs) == 2
