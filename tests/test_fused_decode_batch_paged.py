"""Paged batched whole-step decode megakernel
(ops/pallas/fused_decode_batch_paged.py): one Pallas call for B lanes
over a shared page pool must match forward_batched_decode_paged (the
per-op XLA paged serving step) on the same rowq8 weights — ragged
positions, page-table indirection, parked lanes writing the trash page,
pool row writebacks. Interpreter mode on CPU."""

import dataclasses
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# interpret-mode megakernel tests: minutes of CPU emulation; the fast
# CI gate (pytest -m 'not slow') skips them
pytestmark = pytest.mark.slow

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.gemma import (
    KVCache,
    forward_batched_decode_paged,
)
from llm_inference_tpu.models.weights import fuse_projections, stack_layers
from llm_inference_tpu.ops.pallas.fused_decode_batch_paged import (
    decode_step_megakernel_batch_paged,
    megakernel_batch_paged_supported,
)

from fixtures import build_gemma3_gguf

PAGE = 32
NB = 2  # blocks per lane -> logical max_seq 64
N_PAGES = 5  # shared pool (plus one trash row in the kernel pools)
S = NB * PAGE


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
    # the paged whole-step kernel is correctness-complete but measured
    # SLOWER than the per-op paged path on hardware (serving.py gate
    # comment) — tests opt in explicitly
    monkeypatch.setenv("LLMI_PAGED_MEGAKERNEL", "1")


def _prefill_pools(hp, w, prompts, tables):
    """Per-lane dense prefill scattered into shared page pools (one trash
    row at index N_PAGES). Returns (pools KVCache of per-layer arrays
    [N_PAGES+1, PAGE, Hkv, d], per-lane positions)."""
    fwd = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    nkv = hp.n_kv_layers
    kp = [np.zeros((N_PAGES + 1, PAGE, hp.n_head_kv, hp.n_embd_head_k),
                   np.float32) for _ in range(nkv)]
    vp = [np.zeros((N_PAGES + 1, PAGE, hp.n_head_kv, hp.n_embd_head_v),
                   np.float32) for _ in range(nkv)]
    pos = []
    for b, ids in enumerate(prompts):
        cache = init_cache(hp, S, dtype=jnp.bfloat16)
        _, cache = fwd(w, cache, jnp.asarray(ids, dtype=jnp.int32), 0)
        for i in range(nkv):
            karr = np.asarray(cache.k[i], np.float32)
            varr = np.asarray(cache.v[i], np.float32)
            for j in range(NB):
                row = tables[b][j]
                if row >= N_PAGES:
                    continue
                kp[i][row] = karr[j * PAGE : (j + 1) * PAGE]
                vp[i][row] = varr[j * PAGE : (j + 1) * PAGE]
        pos.append(len(ids))
    k = tuple(jnp.asarray(k_, jnp.bfloat16) for k_ in kp)
    v = tuple(jnp.asarray(v_, jnp.bfloat16) for v_ in vp)
    return KVCache(k=k, v=v), np.asarray(pos, np.int32)


def _stacked_pools(pools):
    return jnp.stack(pools.k), jnp.stack(pools.v)


def _unstack(kp, vp, nkv):
    return KVCache(k=tuple(kp[i] for i in range(nkv)),
                   v=tuple(vp[i] for i in range(nkv)))


def test_paged_megakernel_matches_paged_xla(fused_env):
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert megakernel_batch_paged_supported(
        hp, w_stacked, batch=3, nb=NB, page=PAGE)

    # lane 0 spans both its pages (pos 33 after 33-token prompt); the
    # sentinel N_PAGES marks unallocated blocks (= the trash row)
    rng = np.random.default_rng(3)
    prompts = [
        [2] + rng.integers(4, 250, size=32).tolist(),  # 33 -> 2 pages
        [2, 9],
        [2, 5, 6, 7, 11],
    ]
    tables = np.asarray(
        [[0, 1], [2, N_PAGES], [3, N_PAGES]], np.int32)
    pools, pos = _prefill_pools(hp, w, prompts, tables)
    kp, vp = _stacked_pools(pools)

    fwd_ref = jax.jit(partial(forward_batched_decode_paged, hp))
    tokens = np.asarray([9, 12, 14], np.int32)
    pools_ref = pools
    for step in range(3):
        toks = jnp.asarray(tokens, jnp.int32)
        p = jnp.asarray(pos, jnp.int32)
        l_ref, pools_ref = fwd_ref(w, pools_ref, jnp.asarray(tables),
                                   toks, p)
        l_fus, kp, vp = decode_step_megakernel_batch_paged(
            hp, w_stacked, kp, vp, jnp.asarray(tables), toks, p,
            interpret=True)
        l_ref, l_fus = np.asarray(l_ref), np.asarray(l_fus)
        for b in range(3):
            scale = max(1.0, np.abs(l_ref[b]).max())
            np.testing.assert_allclose(
                l_fus[b], l_ref[b], atol=1.5e-2 * scale,
                err_msg=f"step {step} lane {b}")
            assert l_ref[b].argmax() == l_fus[b].argmax(), (step, b)
        tokens = l_ref.argmax(axis=1).astype(np.int32)
        pos = pos + 1

    # pool rows written in-kernel must match the XLA scatter path —
    # check each lane's live rows through its table
    k_ref = np.stack([np.asarray(k, np.float32) for k in pools_ref.k])
    k_fus = np.asarray(kp, np.float32)
    for b in range(3):
        for j in range(NB):
            row = tables[b][j]
            if row >= N_PAGES:
                continue
            live = min(max(int(pos[b]) - j * PAGE, 0), PAGE)
            if live == 0:
                continue
            np.testing.assert_allclose(
                k_fus[:, row, :live], k_ref[:, row, :live], atol=4e-2,
                err_msg=f"lane {b} block {j}")


def test_paged_megakernel_greedy_in_kernel(fused_env):
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    prompts = [[2, 7, 8], [2, 9], [2, 5, 6, 7, 11]]
    tables = np.asarray([[0, N_PAGES], [1, N_PAGES], [2, N_PAGES]], np.int32)
    pools, pos = _prefill_pools(hp, w, prompts, tables)
    kp, vp = _stacked_pools(pools)
    toks = jnp.asarray([9, 12, 14], jnp.int32)
    p = jnp.asarray(pos, jnp.int32)
    logits, _, _ = decode_step_megakernel_batch_paged(
        hp, w_stacked, kp, vp, jnp.asarray(tables), toks, p, interpret=True)
    tokens, kc, vc = decode_step_megakernel_batch_paged(
        hp, w_stacked, kp, vp, jnp.asarray(tables), toks, p,
        greedy=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(tokens), np.asarray(logits).argmax(axis=1))
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(
        decode_step_megakernel_batch_paged(
            hp, w_stacked, kp, vp, jnp.asarray(tables), toks, p,
            interpret=True)[1]))


def test_paged_megakernel_parked_lane(fused_env):
    """A parked lane (pos >= NB*PAGE, table = all-sentinel) writes only
    the trash page; live lanes and live pages are untouched."""
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))

    prompts = [[2, 7, 8], [2, 9]]
    tables = np.asarray([[0, N_PAGES], [1, N_PAGES]], np.int32)
    pools, pos = _prefill_pools(hp, w, prompts, tables)
    kp, vp = _stacked_pools(pools)

    toks = jnp.asarray([9, 12], jnp.int32)
    p_live = jnp.asarray(pos, jnp.int32)
    l_live, _, _ = decode_step_megakernel_batch_paged(
        hp, w_stacked, kp, vp, jnp.asarray(tables), toks, p_live,
        interpret=True)

    # park lane 1 (pos = S, table rows -> sentinel)
    tables_p = tables.copy()
    tables_p[1, :] = N_PAGES
    p_park = jnp.asarray([pos[0], S], jnp.int32)
    l_park, kc, vc = decode_step_megakernel_batch_paged(
        hp, w_stacked, kp, vp, jnp.asarray(tables_p), toks, p_park,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(l_park[0]), np.asarray(l_live[0]))
    # every non-trash pool row is bit-identical except lane 0's own write
    orig = np.asarray(kp, np.float32)
    got = np.asarray(kc, np.float32)
    live_row = tables[0][int(pos[0]) // PAGE]
    for row in range(N_PAGES):
        if row == live_row:
            continue
        np.testing.assert_array_equal(got[:, row], orig[:, row])


def test_paged_server_megakernel_token_parity(fused_env, monkeypatch, tmp_path):
    """BatchedServer(mode='serve-q8', kv_pages=...) takes the paged
    megakernel chunk when eligible and reproduces the per-op paged
    path's streams, including slot/page reuse across retirements."""
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
    # serving's PAGE is 256 -> max_seq 512, 2 blocks/lane; 5 requests
    # through 2 slots and a 5-page pool force page reuse
    reqs = [([2, 7, 8], 9), ([2, 9], 3), ([2, 5, 6], 6), ([2, 11], 8),
            ([2, 4, 13, 7], 5)]

    monkeypatch.setenv("LLMI_NO_FUSED_DECODE", "1")
    ref = BatchedServer(str(path), max_seq=512, max_batch=2, mode="serve-q8",
                        decode_chunk=3, kv_pages=5)
    assert not ref._mega_paged
    want = ref.run(reqs)

    monkeypatch.delenv("LLMI_NO_FUSED_DECODE")
    srv = BatchedServer(str(path), max_seq=512, max_batch=2, mode="serve-q8",
                        decode_chunk=3, kv_pages=5)
    assert srv._mega_paged
    got = srv.run(reqs)
    assert got == want


def test_paged_eligibility_bounds():
    hp, w = _model()
    w_stacked = dataclasses.replace(w, layers=stack_layers(w.layers))
    assert megakernel_batch_paged_supported(
        hp, w_stacked, batch=4, nb=NB, page=PAGE)
    # the per-lane buffers must fit the lane-parity VMEM double buffer
    assert not megakernel_batch_paged_supported(
        hp, w_stacked, batch=4, nb=4096, page=256)
    # page sizes the 16-row writeback window can't tile are ineligible
    assert not megakernel_batch_paged_supported(
        hp, w_stacked, batch=4, nb=NB, page=24)
    # grouped (non-rowq8) weights are ineligible
    buf = build_gemma3_gguf(
        n_layers=2, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=[f"t{i}" for i in range(256)])
    hp2, w2 = load_weights(GGUFFile(buf), mode="packed-serve")
    w2 = fuse_projections(w2)
    w2s = dataclasses.replace(w2, layers=stack_layers(w2.layers))
    assert not megakernel_batch_paged_supported(
        hp2, w2s, batch=4, nb=NB, page=PAGE)
