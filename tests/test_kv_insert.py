"""In-place KV row insertion kernel (ops/pallas/kv_insert.py): must
reproduce the XLA scatter semantics it replaces (``.at[idx].set(rows,
mode="drop")``), including dropped out-of-range rows, and the batched /
paged serving paths must emit identical streams with it enabled."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_inference_tpu.ops.pallas.kv_insert import insert_rows


def test_insert_rows_matches_scatter():
    rng = np.random.default_rng(0)
    R, H, C, B = 48, 2, 256, 5
    dst = jnp.asarray(rng.normal(size=(R, H, C)), jnp.bfloat16)
    rows = jnp.asarray(rng.normal(size=(B, H, C)), jnp.bfloat16)
    # in-range, duplicate-free; one dropped (== R). Negative indices are
    # excluded here: XLA's .at wraps them before the drop check, while
    # the kernel drops them (covered by test_insert_rows_all_dropped) —
    # the serving paths never produce negatives.
    idx = jnp.asarray([3, 17, R, 47, R + 9], jnp.int32)

    want = dst.at[idx].set(rows, mode="drop")
    got = insert_rows(dst, rows, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_insert_rows_all_dropped():
    R, H, C, B = 16, 1, 128, 3
    dst = jnp.zeros((R, H, C), jnp.bfloat16) + 2.0
    rows = jnp.ones((B, H, C), jnp.bfloat16)
    idx = jnp.asarray([R, R + 5, -2], jnp.int32)
    got = insert_rows(dst, rows, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.full((R, H, C), 2.0, np.float32))


def test_insert_rows_dtype_mismatch():
    with pytest.raises(ValueError):
        insert_rows(jnp.zeros((4, 1, 8), jnp.bfloat16),
                    jnp.zeros((2, 1, 8), jnp.float32),
                    jnp.asarray([0, 1], jnp.int32), interpret=True)


def test_insert_rows_degenerate_layout_reviews():
    """A [rows, 1, 256] destination (Gemma-1B: n_head_kv=1, head_dim 256)
    must re-view to [rows, 2, 128] and still match the scatter. Interpret
    mode skips the re-view, so force the non-interpret branch shape check
    via layout_supported + explicit reshape equivalence."""
    from llm_inference_tpu.ops.pallas.kv_insert import layout_supported

    assert layout_supported(1, 256)       # re-views to [2, 128]
    assert layout_supported(2, 128)
    assert layout_supported(8, 256)
    assert not layout_supported(1, 128)   # single 128-lane row: no view
    assert not layout_supported(1, 96)    # not a multiple of 128

    rng = np.random.default_rng(1)
    R, B = 32, 4
    dst = jnp.asarray(rng.normal(size=(R, 1, 256)), jnp.bfloat16)
    rows = jnp.asarray(rng.normal(size=(B, 1, 256)), jnp.bfloat16)
    idx = jnp.asarray([5, R, 0, 31], jnp.int32)
    want = dst.at[idx].set(rows, mode="drop")
    got = insert_rows(dst, rows, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.slow
def test_batched_decode_inplace_insert_matches_scatter(monkeypatch):
    """forward_batched_decode with the in-place kernel (interpret) must
    match the scatter path bit-for-bit — logits and cache."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import build_gemma3_gguf

    from llm_inference_tpu.gguf import GGUFFile
    from llm_inference_tpu.models import init_cache, load_weights
    from llm_inference_tpu.models.gemma import KVCache, forward_batched_decode

    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(n_layers=2, n_embd=256, n_ff=512, n_head=4,
                            n_head_kv=2, head_dim=128, vocab=vocab)
    hp, w = load_weights(GGUFFile(buf), mode="rowq8")
    B, S = 3, 32
    cache = KVCache(
        k=tuple(jnp.zeros((B, S, hp.n_head_kv, hp.n_embd_head_k), jnp.bfloat16)
                for _ in range(hp.n_kv_layers)),
        v=tuple(jnp.zeros((B, S, hp.n_head_kv, hp.n_embd_head_v), jnp.bfloat16)
                for _ in range(hp.n_kv_layers)),
    )
    toks = jnp.asarray([9, 12, 14], jnp.int32)
    pos = jnp.asarray([4, 1, S], jnp.int32)  # lane 2 parked

    monkeypatch.delenv("LLMI_FUSED_INTERPRET", raising=False)
    l_ref, c_ref = forward_batched_decode(hp, w, cache, toks, pos)
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")
    l_got, c_got = forward_batched_decode(hp, w, cache, toks, pos)

    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_got))
    for i in range(hp.n_kv_layers):
        np.testing.assert_array_equal(
            np.asarray(c_ref.k[i], np.float32), np.asarray(c_got.k[i], np.float32))
        np.testing.assert_array_equal(
            np.asarray(c_ref.v[i], np.float32), np.asarray(c_got.v[i], np.float32))


@pytest.mark.slow
def test_paged_decode_inplace_insert_matches_scatter(monkeypatch):
    """forward_batched_decode_paged with the in-place kernel (interpret)
    must match the scatter path bit-for-bit — logits and pools — covering
    a parked lane and a wrapped per-lane SWA ring layer."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import build_gemma3_gguf

    from llm_inference_tpu.gguf import GGUFFile
    from llm_inference_tpu.models import load_weights
    from llm_inference_tpu.models.gemma import (
        KVCache,
        forward_batched_decode_paged,
    )

    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    # layer 0 windowed (per-lane ring pool), layer 1 global; the
    # degenerate Gemma-1B trailing layout [Hkv=1, d=256]
    buf = build_gemma3_gguf(n_layers=2, n_embd=256, n_ff=512, n_head=2,
                            n_head_kv=1, head_dim=256, vocab=vocab,
                            sliding_window=8, swa_pattern=[True, False])
    monkeypatch.setenv("LLMI_SWA_MASK", "1")
    hp, w = load_weights(GGUFFile(buf), mode="rowq8")

    B, PAGE, max_blocks, n_pages = 3, 4, 4, 16
    win = hp.swa_window(0)
    assert win == 8
    ring = -(-win // PAGE) + 1  # 3 pages per lane
    rng = np.random.default_rng(0)

    def pool(rows, d):
        return jnp.asarray(rng.normal(size=(rows, PAGE, hp.n_head_kv, d)),
                           jnp.bfloat16)

    pools = KVCache(
        k=(pool(B * ring, hp.n_embd_head_k), pool(n_pages, hp.n_embd_head_k)),
        v=(pool(B * ring, hp.n_embd_head_v), pool(n_pages, hp.n_embd_head_v)),
    )
    table = jnp.asarray(
        rng.permutation(n_pages)[: B * max_blocks].reshape(B, max_blocks),
        jnp.int32)
    toks = jnp.asarray([9, 12, 14], jnp.int32)
    # lane 0: blk 2 -> ring row wraps (2 % 3); lane 1 mid-page; lane 2
    # parked (pos >= max_blocks*PAGE drops the write on both paths)
    pos = jnp.asarray([9, 5, max_blocks * PAGE], jnp.int32)

    monkeypatch.delenv("LLMI_FUSED_INTERPRET", raising=False)
    monkeypatch.delenv("LLMI_INPLACE_INSERT", raising=False)
    l_ref, p_ref = forward_batched_decode_paged(
        hp, w, pools, table, toks, pos, ring_layers=(0,))
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")
    l_got, p_got = forward_batched_decode_paged(
        hp, w, pools, table, toks, pos, ring_layers=(0,))

    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_got))
    for i in range(hp.n_kv_layers):
        np.testing.assert_array_equal(
            np.asarray(p_ref.k[i], np.float32), np.asarray(p_got.k[i], np.float32))
        np.testing.assert_array_equal(
            np.asarray(p_ref.v[i], np.float32), np.asarray(p_got.v[i], np.float32))
