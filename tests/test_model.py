"""Model-level tests: hparams/tensor wiring, and the golden-logit
cross-engine regression — the TPU forward pass vs the reference engine's
full ``Model::forward`` on the same synthesized checkpoint, including a
chained second call exercising the KV cache (the reference's own test
strategy, model_test.cpp:409-460, tolerance 3e-3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_inference_tpu.gguf import GGMLType, GGUFFile
from llm_inference_tpu.models import forward, init_cache, load_hparams, load_weights

from fixtures import build_gemma3_gguf, DEFAULT_VOCAB
from oracle_harness import oracle_available

TOL = 3e-3  # the reference's own golden-logit tolerance (model_test.cpp:456)


def test_hparams_wiring():
    buf = build_gemma3_gguf()
    g = GGUFFile(buf)
    hp = load_hparams(g.metadata)
    assert hp.architecture == "gemma3"
    assert hp.block_count == 1
    assert hp.embedding_length == 32
    assert hp.n_head == 2 and hp.n_head_kv == 1
    assert hp.n_embd_head_k == 16
    assert hp.f_attention_scale == pytest.approx(1.0 / 4.0)
    assert hp.vocab_size == len(DEFAULT_VOCAB)
    assert hp.is_swa_layer(0)  # default 5:1 pattern
    assert hp.rope_base_for_layer(0) == 10000.0


def test_weights_wiring():
    buf = build_gemma3_gguf(n_layers=2)
    g = GGUFFile(buf)
    hp, w = load_weights(g)
    assert len(w.layers) == 2
    for layer in w.layers:
        assert layer.wq is not None and layer.wq.rows == 32 and layer.wq.cols == 32
        assert layer.wk.rows == 16
        assert layer.w_down.cols == 64
        assert layer.attn_norm.shape == (32,)
        assert layer.q_norm.shape == (16,)
    assert w.token_embd.rows == len(DEFAULT_VOCAB)


def _run_forward_chain(buf, token_chains, max_seq=64):
    """Run chained forward calls through our engine, returning logits list."""
    import jax
    from functools import partial

    g = GGUFFile(buf)
    hp, w = load_weights(g)
    fwd = jax.jit(partial(forward, hp))
    cache = init_cache(hp, max_seq)
    out = []
    pos = 0
    for tokens in token_chains:
        logits, cache = fwd(w, cache, jnp.asarray(tokens, dtype=jnp.int32), pos)
        out.append(np.asarray(logits))
        pos += len(tokens)
    return out


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
@pytest.mark.parametrize(
    "fmt,n_embd,n_ff",
    [
        # Every format holds the reference's own golden bar (3e-3,
        # model_test.cpp:456) now that exact mode runs the reference-
        # faithful online-softmax attention (measured max rel err <=1.1e-4,
        # most formats ~1e-7 — the XLA-vs-glibc accumulation-order floor).
        (GGMLType.Q4_0, 32, 64),
        (GGMLType.Q8_0, 32, 64),
        (GGMLType.Q5_0, 32, 64),
        (GGMLType.BF16, 32, 64),
        # F16 layer weights omitted: the reference dispatcher has no F16
        # GEMV (ops.cpp:933-956 throws); F16 is embedding-only there.
        (GGMLType.Q4_K, 256, 512),
        (GGMLType.Q6_K, 256, 512),
    ],
)
def test_golden_logits_vs_reference(fmt, n_embd, n_ff, tol=TOL):
    """Prefill + chained decode: logits must match the reference engine."""
    from oracle_harness import OracleModel

    buf = build_gemma3_gguf(n_layers=2, n_embd=n_embd, n_ff=n_ff, weight_fmt=fmt)
    vocab_size = len(DEFAULT_VOCAB)

    chains = [[2, 7, 8], [9]]  # 3-token prefill, then 1-token decode
    ref = OracleModel(buf)
    ref_logits = []
    pos = 0
    for tokens in chains:
        ref_logits.append(ref.forward(tokens, pos, vocab_size))
        pos += len(tokens)
    ref.close()

    ours = _run_forward_chain(buf, chains)
    for step, (a, b) in enumerate(zip(ours, ref_logits)):
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(
            a, b, atol=tol * scale, err_msg=f"{fmt.name} step {step}"
        )


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_golden_logits_with_post_norms():
    from oracle_harness import OracleModel

    buf = build_gemma3_gguf(n_layers=1, with_post_norms=True)
    ref = OracleModel(buf)
    ref_logits = ref.forward([2, 7], 0, len(DEFAULT_VOCAB))
    ref.close()
    ours = _run_forward_chain(buf, [[2, 7]])[0]
    scale = max(1.0, np.abs(ref_logits).max())
    np.testing.assert_allclose(ours, ref_logits, atol=TOL * scale)


def test_padded_prefill_matches_unpadded():
    """Bucketed prefill: padding tokens must not change logits or cache."""
    import jax
    from functools import partial

    buf = build_gemma3_gguf(n_layers=2)
    g = GGUFFile(buf)
    hp, w = load_weights(g)
    fwd = jax.jit(partial(forward, hp))

    cache_a = init_cache(hp, 32)
    logits_a, cache_a = fwd(w, cache_a, jnp.asarray([2, 7, 8], dtype=jnp.int32), 0)

    cache_b = init_cache(hp, 32)
    padded = jnp.asarray([2, 7, 8, 0, 0, 0, 0, 0], dtype=jnp.int32)
    logits_b, cache_b = fwd(w, cache_b, padded, 0, n_valid=3)

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), atol=1e-6)

    # decode after padded prefill continues identically
    da, _ = fwd(w, cache_a, jnp.asarray([9], dtype=jnp.int32), 3)
    db, _ = fwd(w, cache_b, jnp.asarray([9], dtype=jnp.int32), 3)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-6)
