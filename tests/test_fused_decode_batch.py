"""Batched whole-step decode megakernel (ops/pallas/fused_decode_batch.py):
one Pallas call for B concurrent lanes must match forward_batched_decode
(the per-op XLA batched serving step) on the same rowq8 weights — ragged
positions, parked lanes, cache row writes. Interpreter mode on CPU."""

import dataclasses
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# interpret-mode megakernel tests: minutes of CPU emulation; the fast
# CI gate (pytest -m 'not slow') skips them (VERDICT r2 weak #8)
pytestmark = pytest.mark.slow

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.gemma import KVCache, forward_batched_decode
from llm_inference_tpu.models.weights import fuse_projections, stack_layers
from llm_inference_tpu.ops.pallas.fused_decode_batch import (
    decode_step_megakernel_batch,
    megakernel_batch_supported,
)

from fixtures import build_gemma3_gguf

S = 64


def _model(n_layers=3):
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=n_layers, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=True,
    )
    hp, w = load_weights(GGUFFile(buf), mode="rowq8")
    return hp, fuse_projections(w)


@pytest.fixture()
def fused_env(monkeypatch):
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")


def _prefill_lanes(hp, w, prompts):
    """Per-lane prefill with the reference forward; returns the batched
    per-layer cache tuples ([B, S, Hkv, d]) and per-lane positions."""
    B = len(prompts)
    fwd = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    ks = [np.zeros((B,) + (S, hp.n_head_kv, hp.n_embd_head_k), np.float32)
          for _ in range(hp.n_kv_layers)]
    vs = [np.zeros((B,) + (S, hp.n_head_kv, hp.n_embd_head_v), np.float32)
          for _ in range(hp.n_kv_layers)]
    pos = []
    for b, ids in enumerate(prompts):
        cache = init_cache(hp, S, dtype=jnp.bfloat16)
        _, cache = fwd(w, cache, jnp.asarray(ids, dtype=jnp.int32), 0)
        for i in range(hp.n_kv_layers):
            ks[i][b] = np.asarray(cache.k[i], np.float32)
            vs[i][b] = np.asarray(cache.v[i], np.float32)
        pos.append(len(ids))
    k = tuple(jnp.asarray(k_, jnp.bfloat16) for k_ in ks)
    v = tuple(jnp.asarray(v_, jnp.bfloat16) for v_ in vs)
    return KVCache(k=k, v=v), np.asarray(pos, np.int32)


def test_batched_megakernel_matches_batched_xla(fused_env):
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert megakernel_batch_supported(hp, w_stacked, batch=3, max_seq=S)

    prompts = [[2, 7, 8], [2, 9], [2, 5, 6, 7, 11]]
    B = len(prompts)
    cache_ref, pos = _prefill_lanes(hp, w, prompts)
    cache_fus = KVCache(
        k=jnp.stack(cache_ref.k), v=jnp.stack(cache_ref.v))

    fwd_ref = jax.jit(partial(forward_batched_decode, hp))
    tokens = np.asarray([9, 12, 14], np.int32)
    for step in range(3):
        toks = jnp.asarray(tokens, jnp.int32)
        p = jnp.asarray(pos, jnp.int32)
        l_ref, cache_ref = fwd_ref(w, cache_ref, toks, p)
        l_fus, kc, vc = decode_step_megakernel_batch(
            hp, w_stacked, cache_fus, toks, p, interpret=True)
        cache_fus = KVCache(k=kc, v=vc)
        l_ref, l_fus = np.asarray(l_ref), np.asarray(l_fus)
        for b in range(B):
            scale = max(1.0, np.abs(l_ref[b]).max())
            np.testing.assert_allclose(
                l_fus[b], l_ref[b], atol=1.5e-2 * scale,
                err_msg=f"step {step} lane {b}")
            assert l_ref[b].argmax() == l_fus[b].argmax(), (step, b)
        tokens = l_ref.argmax(axis=1).astype(np.int32)
        pos = pos + 1

    # per-lane cache rows written in-kernel must match the XLA scatter
    k_ref = np.stack([np.asarray(k, np.float32) for k in cache_ref.k])
    k_fus = np.asarray(cache_fus.k, np.float32)
    for b in range(B):
        np.testing.assert_allclose(
            k_fus[:, b, : pos[b]], k_ref[:, b, : pos[b]], atol=4e-2,
            err_msg=f"lane {b}")


def test_batched_megakernel_single_kv_slab(fused_env, monkeypatch):
    """When only ONE cache slab fits VMEM (the batch-32 / 4k-context
    regime), the kernel single-buffers it — next layer's copy issued
    after attention — with identical results."""
    import llm_inference_tpu.ops.pallas.fused_decode_batch as fdb

    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    # budget between fixed+1*kv and fixed+2*kv at these shapes -> slots=1
    D, F, Rq = 256, 512, 1024
    layer_bytes = Rq * D + D * 512 + 2 * F * D + D * F
    kv_one = 3 * S * hp.n_head_kv * 256 * 2
    budget = None
    fixed_probe = fdb._kv_slots(hp, batch=3, max_seq=S,
                                layer_bytes=layer_bytes, tn=256,
                                D=D, F=F, Rq=Rq)
    assert fixed_probe == 2  # sanity: default budget double-buffers
    monkeypatch.setattr(fdb, "_BUFFER_BUDGET",
                        2 * layer_bytes + 450_000)
    assert fdb._kv_slots(hp, batch=3, max_seq=S, layer_bytes=layer_bytes,
                         tn=256, D=D, F=F, Rq=Rq) == 1

    prompts = [[2, 7, 8], [2, 9], [2, 5, 6, 7, 11]]
    cache_ref, pos = _prefill_lanes(hp, w, prompts)
    cache_fus = KVCache(k=jnp.stack(cache_ref.k), v=jnp.stack(cache_ref.v))
    fwd_ref = jax.jit(partial(forward_batched_decode, hp))
    toks = jnp.asarray([9, 12, 14], jnp.int32)
    p = jnp.asarray(pos, jnp.int32)
    l_ref, _ = fwd_ref(w, cache_ref, toks, p)
    l_fus, _, _ = decode_step_megakernel_batch(
        hp, w_stacked, cache_fus, toks, p, interpret=True)
    l_ref, l_fus = np.asarray(l_ref), np.asarray(l_fus)
    for b in range(3):
        scale = max(1.0, np.abs(l_ref[b]).max())
        np.testing.assert_allclose(l_fus[b], l_ref[b], atol=1.5e-2 * scale)
        assert l_ref[b].argmax() == l_fus[b].argmax()


def test_batched_megakernel_greedy_in_kernel(fused_env):
    """greedy=True returns the same tokens as argmax over the full
    logits output (tie-break: lowest id, jnp.argmax semantics)."""
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    prompts = [[2, 7, 8], [2, 9], [2, 5, 6, 7, 11]]
    cache_ref, pos = _prefill_lanes(hp, w, prompts)
    cache = KVCache(k=jnp.stack(cache_ref.k), v=jnp.stack(cache_ref.v))
    toks = jnp.asarray([9, 12, 14], jnp.int32)
    p = jnp.asarray(pos, jnp.int32)
    logits, _, _ = decode_step_megakernel_batch(
        hp, w_stacked, cache, toks, p, interpret=True)
    tokens, kc, vc = decode_step_megakernel_batch(
        hp, w_stacked, cache, toks, p, greedy=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(tokens), np.asarray(logits).argmax(axis=1))
    # cache writes identical in both modes
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(
        decode_step_megakernel_batch(hp, w_stacked, cache, toks, p,
                                     interpret=True)[1]))


def test_batched_megakernel_parked_lane(fused_env):
    """A parked lane (pos >= S) must not disturb live lanes, and its
    clamped row write stays in bounds."""
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))

    prompts = [[2, 7, 8], [2, 9]]
    cache_ref, pos = _prefill_lanes(hp, w, prompts)
    cache_fus = KVCache(k=jnp.stack(cache_ref.k), v=jnp.stack(cache_ref.v))

    toks = jnp.asarray([9, 12], jnp.int32)
    p_live = jnp.asarray(pos, jnp.int32)
    l_live, _, _ = decode_step_megakernel_batch(
        hp, w_stacked, cache_fus, toks, p_live, interpret=True)

    # park lane 1 (pos = S); lane 0 must produce identical logits
    p_park = jnp.asarray([pos[0], S], jnp.int32)
    l_park, kc, vc = decode_step_megakernel_batch(
        hp, w_stacked, cache_fus, toks, p_park, interpret=True)
    np.testing.assert_array_equal(np.asarray(l_park[0]), np.asarray(l_live[0]))
    # the parked lane clamps to row 0: only row 0 changes (the rest of
    # its aligned window is written back with the DMA'd originals), and
    # a re-admitted slot's prefill always rewrites row 0
    orig = np.asarray(jnp.stack(cache_ref.k), np.float32)
    got = np.asarray(kc, np.float32)
    np.testing.assert_array_equal(got[:, 1, 1:], orig[:, 1, 1:])


def test_batched_megakernel_prefix_chunk_bound(fused_env):
    """Ragged lanes spanning cache-DMA chunk boundaries (S=64 -> 16-row
    chunks): a lane near S forces the full prefix while small-pos lanes
    ride along; logits must match the per-op batched path for every
    lane."""
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))

    rng = np.random.default_rng(7)
    prompts = [
        rng.integers(4, 250, size=50).tolist(),   # nch = 4 (full prefix)
        [2, 9],                                    # rides in chunk 0
        rng.integers(4, 250, size=17).tolist(),    # crosses chunk 0/1 edge
    ]
    prompts[0][0] = prompts[2][0] = 2
    cache_ref, pos = _prefill_lanes(hp, w, prompts)
    cache_fus = KVCache(k=jnp.stack(cache_ref.k), v=jnp.stack(cache_ref.v))

    fwd_ref = jax.jit(partial(forward_batched_decode, hp))
    toks = jnp.asarray([9, 12, 14], jnp.int32)
    p = jnp.asarray(pos, jnp.int32)
    l_ref, _ = fwd_ref(w, cache_ref, toks, p)
    l_fus, _, _ = decode_step_megakernel_batch(
        hp, w_stacked, cache_fus, toks, p, interpret=True)
    l_ref, l_fus = np.asarray(l_ref), np.asarray(l_fus)
    for b in range(3):
        scale = max(1.0, np.abs(l_ref[b]).max())
        np.testing.assert_allclose(l_fus[b], l_ref[b], atol=1.5e-2 * scale,
                                   err_msg=f"lane {b}")
        assert l_ref[b].argmax() == l_fus[b].argmax(), b


def test_batched_server_megakernel_token_parity(fused_env, monkeypatch, tmp_path):
    """BatchedServer(mode='serve-q8') takes the batched megakernel chunk
    when eligible and reproduces the per-op batched path's streams."""
    from llm_inference_tpu.serving import BatchedServer

    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=3, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=True,
    )
    path = tmp_path / "m.gguf"
    path.write_bytes(buf)
    reqs = [([2, 7, 8], 5), ([2, 9], 5), ([2, 5, 6], 5)]

    monkeypatch.setenv("LLMI_NO_FUSED_DECODE", "1")
    ref = BatchedServer(str(path), max_seq=S, max_batch=3, mode="serve-q8",
                        decode_chunk=4)
    assert not ref._mega_batch
    want = ref.run(reqs)

    monkeypatch.delenv("LLMI_NO_FUSED_DECODE")
    srv = BatchedServer(str(path), max_seq=S, max_batch=3, mode="serve-q8",
                        decode_chunk=4)
    assert srv._mega_batch
    got = srv.run(reqs)
    assert got == want


def test_batched_server_megakernel_slot_reuse(fused_env, monkeypatch, tmp_path):
    """More requests than slots: retirement parks a lane (clamped row
    writes) and re-admission reuses it — streams must still match the
    per-op path (validates the parked-lane garbage-row reasoning)."""
    from llm_inference_tpu.serving import BatchedServer

    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=2, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=True,
    )
    path = tmp_path / "m.gguf"
    path.write_bytes(buf)
    # 5 requests through 2 slots with mismatched lengths: lanes park and
    # re-admit repeatedly across chunks
    reqs = [([2, 7, 8], 9), ([2, 9], 3), ([2, 5, 6], 6), ([2, 11], 8),
            ([2, 4, 13, 7], 5)]

    monkeypatch.setenv("LLMI_NO_FUSED_DECODE", "1")
    ref = BatchedServer(str(path), max_seq=S, max_batch=2, mode="serve-q8",
                        decode_chunk=3)
    want = ref.run(reqs)

    monkeypatch.delenv("LLMI_NO_FUSED_DECODE")
    srv = BatchedServer(str(path), max_seq=S, max_batch=2, mode="serve-q8",
                        decode_chunk=3)
    assert srv._mega_batch
    got = srv.run(reqs)
    assert got == want


def test_batch_eligibility_bounds():
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert megakernel_batch_supported(hp, w_stacked, batch=4, max_seq=S)
    # the double-buffered batched cache slabs must fit VMEM
    assert not megakernel_batch_supported(
        hp, w_stacked, batch=4096, max_seq=4096)
    # grouped (non-rowq8) weights are ineligible
    hp2, w2 = None, None
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=2, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab)
    hp2, w2 = load_weights(GGUFFile(buf), mode="packed-serve")
    w2 = fuse_projections(w2)
    w2s = dataclasses.replace(w2, layers=stack_layers(w2.layers))
    assert not megakernel_batch_supported(hp2, w2s, batch=4, max_seq=S)
