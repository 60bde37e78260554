"""Ragged flash-decode kernel vs the XLA masked-softmax golden path."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_inference_tpu.ops.pallas.flash_decode import flash_decode


def _golden(q, k, v, lengths):
    """Full masked softmax per request (the models/gemma.py formulation)."""
    B, H, Dk = q.shape
    _, S, Hkv, Dv = v.shape
    group = H // Hkv
    out = np.zeros((B, H, Dv), dtype=np.float32)
    for b in range(B):
        for h in range(H):
            hkv = h // group
            s = (q[b, h].astype(np.float32) @ k[b, :, hkv, :].astype(np.float32).T)
            mask = np.arange(S) < lengths[b]
            s = np.where(mask, s, -np.inf)
            m = s.max()
            if not np.isfinite(m):
                continue
            p = np.exp(s - m)
            p = p / p.sum()
            out[b, h] = p @ v[b, :, hkv, :].astype(np.float32)
    return out


@pytest.mark.parametrize("hkv,group", [(1, 4), (2, 2)])
def test_flash_decode_matches_golden(hkv, group, rng):
    B, S, Dk, Dv = 3, 512, 128, 128
    H = hkv * group
    q = rng.standard_normal((B, H, Dk)).astype(np.float32)
    k = rng.standard_normal((B, S, hkv, Dk)).astype(np.float16)
    v = rng.standard_normal((B, S, hkv, Dv)).astype(np.float16)
    lengths = np.array([1, 130, 512], dtype=np.int32)

    got = np.asarray(flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        block=128, interpret=True,
    ))
    want = _golden(q, k, v, lengths)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_decode_softcap(rng):
    B, S, hkv, group, Dk = 1, 256, 1, 2, 128
    H = hkv * group
    q = rng.standard_normal((B, H, Dk)).astype(np.float32) * 3
    k = rng.standard_normal((B, S, hkv, Dk)).astype(np.float16)
    v = rng.standard_normal((B, S, hkv, Dk)).astype(np.float16)
    lengths = np.array([200], dtype=np.int32)

    got = np.asarray(flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        block=128, softcap=30.0, interpret=True,
    ))

    # golden with softcap
    s = np.einsum("hd,skd->hsk", q[0].astype(np.float32), k[0].astype(np.float32))[:, :, 0]
    s = 30.0 * np.tanh(s / 30.0)
    s = np.where(np.arange(S) < 200, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = p @ v[0, :, 0, :].astype(np.float32)
    np.testing.assert_allclose(got[0], want, rtol=2e-3, atol=2e-3)


def test_flash_decode_zero_length(rng):
    """A parked slot (length 0) must produce zeros, not NaN."""
    B, S, hkv, group, D = 2, 256, 1, 2, 128
    q = rng.standard_normal((B, hkv * group, D)).astype(np.float32)
    k = rng.standard_normal((B, S, hkv, D)).astype(np.float16)
    v = rng.standard_normal((B, S, hkv, D)).astype(np.float16)
    lengths = np.array([0, 50], dtype=np.int32)
    got = np.asarray(flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        block=128, interpret=True,
    ))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[0], 0.0)


@pytest.mark.parametrize("hkv,group", [(1, 4), (2, 2)])
def test_paged_flash_decode_matches_dense(hkv, group, rng):
    """Paged pool + scrambled page table == dense ragged flash decode."""
    from llm_inference_tpu.ops.pallas.flash_decode import paged_flash_decode

    B, S, Dk, Dv, page = 3, 512, 128, 128, 128
    H = hkv * group
    nb = S // page
    q = rng.standard_normal((B, H, Dk)).astype(np.float32)
    k = rng.standard_normal((B, S, hkv, Dk)).astype(np.float16)
    v = rng.standard_normal((B, S, hkv, Dv)).astype(np.float16)
    lengths = np.array([1, 130, 512], dtype=np.int32)

    # scatter the dense caches into a shared pool at scrambled page ids
    n_pages = B * nb + 3
    perm = rng.permutation(n_pages)[: B * nb]
    table = perm.reshape(B, nb).astype(np.int32)
    k_pool = np.zeros((n_pages, page, hkv, Dk), np.float16)
    v_pool = np.zeros((n_pages, page, hkv, Dv), np.float16)
    for b in range(B):
        for j in range(nb):
            k_pool[table[b, j]] = k[b, j * page : (j + 1) * page]
            v_pool[table[b, j]] = v[b, j * page : (j + 1) * page]

    got = np.asarray(paged_flash_decode(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(table), jnp.asarray(lengths), interpret=True,
    ))
    want = _golden(q, k, v, lengths)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_paged_flash_decode_dsplit_matches_plain(rng):
    """dsplit=True over [N, PAGE, m, 128] pools == the plain kernel over
    the same bytes viewed [N, PAGE, 1, m*128] (one real KV head)."""
    from llm_inference_tpu.ops.pallas.flash_decode import paged_flash_decode

    B, S, D, page, m = 3, 512, 256, 128, 2
    H = 4  # GQA group of 4 over the single KV head
    nb = S // page
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    lengths = np.array([1, 200, 512], dtype=np.int32)
    n_pages = B * nb + 2
    table = rng.permutation(n_pages)[: B * nb].reshape(B, nb).astype(np.int32)
    k_pool = rng.standard_normal((n_pages, page, 1, D)).astype(np.float16)
    v_pool = rng.standard_normal((n_pages, page, 1, D)).astype(np.float16)

    want = np.asarray(paged_flash_decode(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(table), jnp.asarray(lengths), interpret=True))
    got = np.asarray(paged_flash_decode(
        jnp.asarray(q),
        jnp.asarray(k_pool.reshape(n_pages, page, m, 128)),
        jnp.asarray(v_pool.reshape(n_pages, page, m, 128)),
        jnp.asarray(table), jnp.asarray(lengths), interpret=True,
        dsplit=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_paged_flash_decode_dsplit_swa_starts(rng):
    """dsplit path honors the SWA starts window like the plain path."""
    from llm_inference_tpu.ops.pallas.flash_decode import paged_flash_decode

    B, S, D, page, m = 2, 512, 256, 128, 2
    H = 2
    nb = S // page
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    lengths = np.array([300, 512], dtype=np.int32)
    starts = np.maximum(lengths - 160, 0).astype(np.int32)
    n_pages = B * nb
    table = np.arange(n_pages, dtype=np.int32).reshape(B, nb)
    k_pool = rng.standard_normal((n_pages, page, 1, D)).astype(np.float16)
    v_pool = rng.standard_normal((n_pages, page, 1, D)).astype(np.float16)

    want = np.asarray(paged_flash_decode(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(table), jnp.asarray(lengths), jnp.asarray(starts),
        interpret=True))
    got = np.asarray(paged_flash_decode(
        jnp.asarray(q),
        jnp.asarray(k_pool.reshape(n_pages, page, m, 128)),
        jnp.asarray(v_pool.reshape(n_pages, page, m, 128)),
        jnp.asarray(table), jnp.asarray(lengths), jnp.asarray(starts),
        interpret=True, dsplit=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_paged_flash_decode_nb_cap_matches_uncapped(rng):
    """A grid cap covering the deepest lane's live blocks is exact: the
    capped grid must produce bit-identical output to the full-table grid
    (the cap only removes blocks the index-map clamp already elided)."""
    from llm_inference_tpu.ops.pallas.flash_decode import paged_flash_decode

    B, S, Dk, page, hkv, group = 3, 1024, 128, 128, 2, 2
    H = hkv * group
    nb = S // page
    q = rng.standard_normal((B, H, Dk)).astype(np.float32)
    lengths = np.array([1, 130, 300], dtype=np.int32)  # deepest: 3 blocks
    n_pages = B * nb + 2
    table = rng.permutation(n_pages)[: B * nb].reshape(B, nb).astype(np.int32)
    k_pool = rng.standard_normal((n_pages, page, hkv, Dk)).astype(np.float16)
    v_pool = rng.standard_normal((n_pages, page, hkv, Dk)).astype(np.float16)

    args = (jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(table), jnp.asarray(lengths))
    want = np.asarray(paged_flash_decode(*args, interpret=True))
    for cap in (3, 4, nb + 7):  # exact bound, bucketed, over-shoot clamps
        got = np.asarray(paged_flash_decode(*args, interpret=True, nb_cap=cap))
        np.testing.assert_array_equal(got, want)


def test_serving_paged_nb_cap_end_to_end(tmp_path, rng):
    """BatchedServer's bucketed nb_cap (step()) produces the same tokens
    as an uncapped run at a depth that exercises several buckets."""
    import sys
    sys.path.insert(0, "tests")
    from fixtures import build_gemma3_gguf
    from llm_inference_tpu.serving import BatchedServer

    path = tmp_path / "m.gguf"
    path.write_bytes(bytes(build_gemma3_gguf(n_layers=2, seed=5)))
    outs = []
    for cap_off in (False, True):
        server = BatchedServer(str(path), max_seq=1024, max_batch=2,
                               mode="serve-q8", decode_chunk=4, kv_pages=10)
        server.tokenizer.eos_id = -1
        server.tokenizer.end_of_turn_id = -1
        if cap_off:
            # force the full grid: monkeypatch the bucket to max blocks
            orig = server._chunk_paged
            server._chunk_paged = (
                lambda w, c, t, tok, p, nb_cap=None:
                orig(w, c, t, tok, p, nb_cap=1024 // server.page))
        outs.append(server.run([([2, 7, 8], 12), ([2, 12, 9, 4], 9)]))
    assert outs[0] == outs[1]
