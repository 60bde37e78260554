"""Engine tests: greedy decode chain parity vs the reference engine, prompt
bucketing, stop tokens, and stats."""

import numpy as np
import pytest

from llm_inference_tpu.engine import Engine, GenerationStats, prefill_bucket
from llm_inference_tpu.gguf import GGUFFile

from fixtures import build_gemma3_gguf, DEFAULT_VOCAB
from oracle_harness import oracle_available


def test_prefill_bucket():
    assert prefill_bucket(1) == 32
    assert prefill_bucket(32) == 32
    assert prefill_bucket(33) == 64
    assert prefill_bucket(100) == 128


def test_generate_greedy_chain_matches_manual_forward():
    """Engine must reproduce a manual argmax decode over forward()."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from llm_inference_tpu.models import forward, init_cache, load_weights

    buf = build_gemma3_gguf(n_layers=2)
    engine = Engine(GGUFFile(buf), max_seq=64, mode="parity", decode_chunk=4)
    prompt_ids = engine.tokenizer.encode("ab", apply_chat_template=False).ids
    got = engine.generate_from_ids(prompt_ids, n_predict=6)

    g = GGUFFile(buf)
    hp, w = load_weights(g)
    fwd = jax.jit(partial(forward, hp))
    cache = init_cache(hp, 64)
    logits, cache = fwd(w, cache, jnp.asarray(prompt_ids, dtype=jnp.int32), 0)
    want = []
    pos = len(prompt_ids)
    for _ in range(6):
        nxt = int(np.asarray(logits).argmax())
        if engine.tokenizer.is_stop(nxt):
            break
        want.append(nxt)
        logits, cache = fwd(w, cache, jnp.asarray([nxt], dtype=jnp.int32), pos)
        pos += 1
    assert got == want


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_greedy_decode_parity_vs_reference():
    """Token-for-token greedy output must match the reference engine
    (the BASELINE correctness bar: temperature-0 output parity)."""
    from oracle_harness import OracleModel

    buf = build_gemma3_gguf(n_layers=2, seed=7)
    vocab_size = len(DEFAULT_VOCAB)

    ref = OracleModel(buf)
    prompt_ids = ref.tokenize("ab", False)
    ref_out = []
    logits = ref.forward(prompt_ids, 0, vocab_size)
    pos = len(prompt_ids)
    for _ in range(8):
        nxt = int(np.argmax(logits))
        ref_out.append(nxt)
        logits = ref.forward([nxt], pos, vocab_size)
        pos += 1
    ref.close()

    engine = Engine(GGUFFile(buf), max_seq=64, mode="parity", decode_chunk=4)
    stats = GenerationStats()
    got = engine.generate_from_ids(prompt_ids, n_predict=8, stats=stats)
    # engine stops at stop tokens; compare the prefix it produced
    assert len(got) > 0
    assert got == [t for t in ref_out[: len(got)]]
    assert stats.prompt_tokens == len(prompt_ids)
    assert stats.generated_tokens == len(got)


def test_serve_mode_generates():
    """bf16 serve mode: runs end-to-end, respects n_predict and vocab."""
    buf = build_gemma3_gguf(n_layers=2)
    engine = Engine(GGUFFile(buf), max_seq=64, mode="serve", decode_chunk=4)
    stats = GenerationStats()
    got = engine.generate_from_ids([2, 7, 8], n_predict=6, stats=stats)
    assert len(got) <= 6
    assert all(0 <= t < len(DEFAULT_VOCAB) for t in got)
    assert stats.decode_steps >= len(got) - 1
