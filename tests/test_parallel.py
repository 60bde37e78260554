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


@pytest.mark.parametrize("mode", ["serve", "serve-q8"])
def test_tp_serve_engine_matches_single_device(tp_setup, mode):
    """Serve modes under TP (round-1 gap: TP was exact-path only): the
    sharded engine must emit the same greedy tokens as single-device."""
    from llm_inference_tpu.engine import Engine

    buf, mesh = tp_setup
    single = Engine(GGUFFile(buf), max_seq=64, mode=mode, decode_chunk=4)
    want = single.generate_from_ids([2, 7, 8], n_predict=6)

    tp = Engine(
        GGUFFile(buf), max_seq=64, mode=mode, decode_chunk=4,
        sharding_fn=gemma_sharding_fn(mesh),
        cache_sharding=kv_cache_sharding(mesh, single.hparams.n_head_kv),
    )
    got = tp.generate_from_ids([2, 7, 8], n_predict=6)
    assert got == want
    # weights really distributed (bf16 DenseTensor .w or rowq8 QuantTensor .q)
    wd = tp.weights.layers[0].w_down
    leaf = wd.w if hasattr(wd, "w") else wd.q
    assert len(leaf.sharding.device_set) == 8


def test_tp_batched_server(tp_setup):
    """BatchedServer with TP-sharded weights + cache lanes on the mesh."""
    from llm_inference_tpu.parallel import batched_kv_cache_sharding
    from llm_inference_tpu.serving import BatchedServer

    buf, mesh = tp_setup
    ref = BatchedServer(GGUFFile(buf), max_seq=64, max_batch=2,
                        mode="serve-q8", decode_chunk=4)
    want = ref.run([([2, 7, 8], 5), ([2, 12], 5)])

    g = GGUFFile(buf)
    srv = BatchedServer(
        g, max_seq=64, max_batch=2, mode="serve-q8", decode_chunk=4,
        sharding_fn=gemma_sharding_fn(mesh),
        cache_sharding=batched_kv_cache_sharding(mesh, ref.hparams.n_head_kv),
    )
    got = srv.run([([2, 7, 8], 5), ([2, 12], 5)])
    assert got == want


def test_dp_x_tp_batched_server():
    """Two-axis mesh: batch lanes sharded over 'data', weights and KV
    heads over 'model' — token parity with the single-device server."""
    from llm_inference_tpu.parallel import batched_kv_cache_sharding
    from llm_inference_tpu.serving import BatchedServer

    buf = build_gemma3_gguf(n_layers=2, n_embd=128, n_ff=256,
                            n_head=4, n_head_kv=4, seed=3)
    reqs = [([2, 7, 8], 4), ([2, 9], 4), ([2, 5, 6, 7], 4), ([2, 11], 4)]
    ref = BatchedServer(GGUFFile(buf), max_seq=32, max_batch=4,
                        mode="serve-q8", decode_chunk=4)
    want = ref.run(reqs)

    mesh = make_mesh(model=4, data=2)
    srv = BatchedServer(
        GGUFFile(buf), max_seq=32, max_batch=4, mode="serve-q8",
        decode_chunk=4,
        sharding_fn=gemma_sharding_fn(mesh),
        cache_sharding=batched_kv_cache_sharding(mesh, ref.hparams.n_head_kv),
    )
    got = srv.run(reqs)
    assert got == want
    cache_spec = srv._caches.k[0].sharding.spec
    assert cache_spec[0] == "data" and cache_spec[2] == "model"
