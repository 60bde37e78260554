"""Real sliding-window attention behind LLMI_SWA_MASK=1 (SURVEY §5).

The DEFAULT reproduces the reference's behavior: the SWA pattern is parsed
but no window is ever applied (reference model.cpp:727-748) — required for
greedy parity vs the reference engine. The flag turns on real windowing on
SWA layers: global layers must be bit-identical, local layers must only
attend to the last ``sliding_window`` keys, and every decode path (XLA
masked softmax, scan-over-layers, batched, paged, flash kernels) must
agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.gemma import (
    _attention,
    forward_batched_decode,
    swa_active,
)
from llm_inference_tpu.models.hparams import load_hparams

from fixtures import build_gemma3_gguf

WINDOW = 8


@pytest.fixture(scope="module")
def swa_buf():
    # layer 0 local (windowed), layer 1 global
    return build_gemma3_gguf(n_layers=2, seed=7, sliding_window=WINDOW,
                             swa_pattern=[True, False])


@pytest.fixture(scope="module")
def global_buf():
    # same geometry, window recorded but NO local layers
    return build_gemma3_gguf(n_layers=2, seed=7, sliding_window=WINDOW,
                             swa_pattern=[False, False])


def _prefill_logits(buf, *, max_seq=64,
                    prompt=(2, 7, 8, 9, 4, 5, 6, 3, 8, 7, 2, 9)):
    """Logits after a prompt LONGER than the window (masking must bite)."""
    hp = load_hparams(GGUFFile(buf).metadata)
    _, w = load_weights(GGUFFile(buf), mode="bf16")
    cache = init_cache(hp, max_seq)
    toks = jnp.asarray(list(prompt), dtype=jnp.int32)
    logits, _ = forward(hp, w, cache, toks, 0, len(prompt), exact=False)
    return np.asarray(logits)


def test_swa_active_requires_flag_window_and_local_layers(
        swa_buf, global_buf, monkeypatch):
    hp = load_hparams(GGUFFile(swa_buf).metadata)
    assert hp.sliding_window == WINDOW
    assert hp.swa_window(0) == WINDOW and hp.swa_window(1) == 0
    assert not swa_active(hp)  # flag off -> parity default
    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    assert swa_active(hp)
    assert not swa_active(load_hparams(GGUFFile(global_buf).metadata))


def test_windowed_attention_matches_truncated_cache(rng):
    """_attention with window=w == attention over a cache whose keys older
    than the window are physically absent — the definition of SWA."""
    S, H, Hkv, dk, dv = 32, 2, 1, 8, 8
    pos = 20  # decode at position 20: window covers keys [13, 20]
    q = jnp.asarray(rng.standard_normal((1, H, dk)), dtype=jnp.float32)
    k = rng.standard_normal((S, Hkv, dk)).astype(np.float32)
    v = rng.standard_normal((S, Hkv, dv)).astype(np.float32)
    k[pos + 1:] = 99.0  # poison unreachable slots
    v[pos + 1:] = 99.0

    # hp only supplies attn_soft_cap / alibi to _attention; geometry unused
    hp = load_hparams(GGUFFile(build_gemma3_gguf(n_layers=1, seed=3)).metadata)
    got = _attention(q, jnp.asarray(k), jnp.asarray(v), pos=jnp.int32(pos),
                     hp=hp, exact=False, window=WINDOW)

    # truncated-cache oracle: only the last WINDOW keys, re-based
    lo = pos - WINDOW + 1
    kt = np.full_like(k, 77.0)
    vt = np.full_like(v, 77.0)
    kt[: pos - lo + 1] = k[lo : pos + 1]
    vt[: pos - lo + 1] = v[lo : pos + 1]
    want = _attention(q, jnp.asarray(kt), jnp.asarray(vt),
                      pos=jnp.int32(pos - lo), hp=hp, exact=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flag_changes_local_layers_only(swa_buf, global_buf, monkeypatch):
    """With a prompt crossing the window, the flag must change the logits
    of the SWA model but NOT of the all-global model."""
    base_swa = _prefill_logits(swa_buf)
    base_glob = _prefill_logits(global_buf)
    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    win_swa = _prefill_logits(swa_buf)
    win_glob = _prefill_logits(global_buf)
    np.testing.assert_array_equal(win_glob, base_glob)  # global: identical
    assert np.abs(win_swa - base_swa).max() > 1e-4  # 12 tokens > window 8


def test_scan_path_matches_unrolled_under_flag(swa_buf, monkeypatch):
    """The scan-over-layers forward (stacked weights) must apply the same
    per-layer windows as the unrolled loop."""
    import dataclasses

    from llm_inference_tpu.models.weights import stack_layers

    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    hp = load_hparams(GGUFFile(swa_buf).metadata)
    _, w = load_weights(GGUFFile(swa_buf), mode="bf16")
    prompt = jnp.asarray([2, 7, 8, 9, 4, 5, 6, 3, 8, 7, 2, 9], dtype=jnp.int32)
    cache = init_cache(hp, 64)
    logits_u, _ = forward(hp, w, cache, prompt, 0, 12, exact=False)
    ws = dataclasses.replace(w, layers=stack_layers(w.layers))
    cache = init_cache(hp, 64, stacked=True)
    logits_s, _ = forward(hp, ws, cache, prompt, 0, 12, exact=False)
    np.testing.assert_allclose(np.asarray(logits_u), np.asarray(logits_s),
                               rtol=2e-2, atol=2e-2)


def test_batched_decode_matches_single_under_flag(swa_buf, monkeypatch):
    """forward_batched_decode must window exactly like the single-sequence
    forward once past the window."""
    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    hp = load_hparams(GGUFFile(swa_buf).metadata)
    _, w = load_weights(GGUFFile(swa_buf), mode="bf16")
    from llm_inference_tpu.models.weights import fuse_projections

    w = fuse_projections(w)
    prompt = [2, 7, 8, 9, 4, 5, 6, 3, 8, 7, 2]
    S = 64
    cache = init_cache(hp, S)
    logits, cache = forward(hp, w, cache,
                            jnp.asarray(prompt, dtype=jnp.int32), 0,
                            len(prompt), exact=False)
    tok = int(jnp.argmax(logits))
    want, cache = forward(hp, w, cache, jnp.asarray([tok], dtype=jnp.int32),
                          len(prompt), exact=False)

    # same state, batched layout (B=2; lane 1 parked)
    cache_b = init_cache(hp, S)
    _, cache_b = forward(hp, w, cache_b, jnp.asarray(prompt, dtype=jnp.int32),
                         0, len(prompt), exact=False)
    caches = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (2,) + a.shape).copy(), cache_b)
    got, _ = forward_batched_decode(
        hp, w, caches, jnp.asarray([tok, 0], dtype=jnp.int32),
        jnp.asarray([len(prompt), S], dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_paged_server_matches_dense_under_flag(swa_buf, monkeypatch):
    """End-to-end: paged serving under the flag == dense serving under the
    flag (both windowed), and != the unflagged stream."""
    from llm_inference_tpu.serving import BatchedServer

    reqs = [([2, 7, 8, 9, 4, 5, 6, 3, 8, 7, 2], 6), ([2, 12, 9, 4, 5], 6)]
    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    srv = BatchedServer(GGUFFile(swa_buf), max_seq=256, max_batch=2,
                        mode="serve", decode_chunk=4)
    assert swa_active(srv.hparams)  # the flag reaches the serving config
    dense = srv.run(list(reqs))
    psrv = BatchedServer(GGUFFile(swa_buf), max_seq=256, max_batch=2,
                         mode="serve", decode_chunk=4, kv_pages=6)
    # the windowed layer's pool SHRINKS to a per-lane ring of
    # ceil(8/256)+1 = 2 pages (max_batch*2 = 4 rows < kv_pages 6); the
    # global layer keeps the full pool
    assert psrv._caches.k[0].shape[0] == 4
    assert psrv._caches.k[1].shape[0] == 6
    paged = psrv.run(list(reqs))
    # both windowed paths agree token-for-token (the numeric window
    # coverage is test_batched_decode_matches_single_under_flag and the
    # flash-kernel starts tests; greedy argmax on this degenerate random
    # fixture is window-insensitive, so token-level != checks don't bite)
    assert paged == dense


def test_ring_wrap_matches_dense(swa_buf, monkeypatch, rng):
    """With a prompt past ring*PAGE tokens the SWA ring has WRAPPED
    (block 2 reuses block 0's row); windowed paged serving must still
    match windowed dense serving."""
    from llm_inference_tpu.serving import BatchedServer

    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    prompt = [2] + rng.integers(4, 200, size=529).tolist()  # 530 > 2*256
    reqs = [(prompt, 6)]
    dense = BatchedServer(GGUFFile(swa_buf), max_seq=1024, max_batch=1,
                          mode="serve", decode_chunk=4).run(list(reqs))
    psrv = BatchedServer(GGUFFile(swa_buf), max_seq=1024, max_batch=1,
                         mode="serve", decode_chunk=4, kv_pages=4)
    assert psrv._caches.k[0].shape[0] == 2  # ring of 2 pages, one lane
    paged = psrv.run(list(reqs))
    assert paged == dense


@pytest.mark.parametrize("paged", [False, True])
def test_flash_kernel_starts_matches_xla(paged, rng):
    """The flash kernels' ``starts`` lower bound (interpret mode) must
    reproduce the XLA masked softmax with the same window."""
    from llm_inference_tpu.ops.pallas.flash_decode import (
        flash_decode,
        paged_flash_decode,
    )

    B, S, H, Hkv, dk, dv, page = 2, 512, 4, 2, 128, 128, 256
    q = jnp.asarray(rng.standard_normal((B, H, dk)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, dk)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, dv)), dtype=jnp.float32)
    lengths = jnp.asarray([300, 37], dtype=jnp.int32)
    starts = jnp.asarray([290, 0], dtype=jnp.int32)  # lane 0 windowed

    if paged:
        nb = S // page
        # identity table: page j of lane b = b*nb + j
        table = jnp.arange(B * nb, dtype=jnp.int32).reshape(B, nb)
        kp = k.reshape(B * nb, page, Hkv, dk)
        vp = v.reshape(B * nb, page, Hkv, dv)
        got = paged_flash_decode(q, kp, vp, table, lengths, starts,
                                 interpret=True)
    else:
        got = flash_decode(q, k, v, lengths, starts, interpret=True)

    # XLA oracle
    group = H // Hkv
    for b in range(B):
        qs = np.asarray(q[b]).reshape(Hkv, group, dk)
        ks, vs = np.asarray(k[b]), np.asarray(v[b])
        L0, s0 = int(lengths[b]), int(starts[b])
        s = np.einsum("kgd,skd->kgs", qs, ks[:S])
        mask = (np.arange(S) < L0) & (np.arange(S) >= s0)
        s = np.where(mask[None, None, :], s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("kgs,skd->kgd", p, vs).reshape(H, dv)
        np.testing.assert_allclose(np.asarray(got[b]), want,
                                   rtol=1e-5, atol=1e-5)
