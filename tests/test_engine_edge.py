"""Engine edge cases: prompts crossing prefill buckets, decode far past the
prompt, gemma4 through the serve engine (heterogeneous layers), and stop
handling at chunk boundaries."""

import numpy as np
import pytest

from llm_inference_tpu.engine import Engine, GenerationStats
from llm_inference_tpu.gguf import GGUFFile

from fixtures import build_gemma3_gguf, build_gemma4_gguf, DEFAULT_VOCAB


def test_multi_bucket_prompt_consistency():
    """A 40-token prompt (bucket 64) must continue exactly like the same
    tokens fed as prompt+decode with a 32-bucket prompt."""
    buf = build_gemma3_gguf(n_layers=2, seed=11)
    engine = Engine(GGUFFile(buf), max_seq=128, mode="parity", decode_chunk=4)

    rng = np.random.default_rng(0)
    long_prompt = [2] + rng.integers(7, 14, size=39).tolist()  # 40 tokens
    out_long = engine.generate_from_ids(long_prompt, n_predict=5)

    # same prefix, shorter prompt: generate more and align
    short = long_prompt[:30]
    stats = GenerationStats()
    out_short = engine.generate_from_ids(short, n_predict=20, stats=stats)
    # If the greedy continuation of the short prompt reproduces the long
    # prompt's tail, the subsequent tokens must agree.
    tail = long_prompt[30:]
    if out_short[: len(tail)] == tail:
        assert out_short[len(tail) : len(tail) + len(out_long)] == out_long


def test_decode_far_past_prompt():
    buf = build_gemma3_gguf(n_layers=2, seed=13)
    engine = Engine(GGUFFile(buf), max_seq=256, mode="serve", decode_chunk=16)
    engine.tokenizer.eos_id = -1
    engine.tokenizer.end_of_turn_id = -1
    stats = GenerationStats()
    out = engine.generate_from_ids([2, 7, 8], n_predict=150, stats=stats)
    assert len(out) == 150
    assert all(0 <= t < len(DEFAULT_VOCAB) for t in out)


def test_gemma4_serve_engine_runs():
    """gemma4 (shared KV, per-layer inputs) through the serve (bf16) path."""
    buf = build_gemma4_gguf(n_layers=4, shared_kv_layers=1)
    engine = Engine(GGUFFile(buf), max_seq=64, mode="serve", decode_chunk=4)
    assert not engine._stacked  # heterogeneous layers stay unrolled
    engine.tokenizer.eos_id = -1
    engine.tokenizer.end_of_turn_id = -1
    out = engine.generate_from_ids([2, 7, 8], n_predict=6)
    assert len(out) == 6


def test_stop_token_respected_mid_chunk():
    """If the model emits <eos> mid-chunk, generation must stop there."""
    buf = build_gemma3_gguf(n_layers=2, seed=17)
    engine = Engine(GGUFFile(buf), max_seq=64, mode="parity", decode_chunk=8)
    # force every token to be a stop token
    all_out = engine.generate_from_ids([2, 7], n_predict=10)
    engine.tokenizer.eos_id = all_out[2] if len(all_out) > 2 else all_out[-1]
    clipped = engine.generate_from_ids([2, 7], n_predict=10)
    assert len(clipped) < len(all_out)
    assert engine.tokenizer.eos_id not in clipped


@pytest.mark.slow  # interpret-mode megakernel: see pytest.ini fast gate
@pytest.mark.parametrize("mode,leaf", [("serve-q", "TQuantTensor"),
                                       ("serve-q4", "TQ4Tensor")])
def test_engine_megakernel_q_mode_activation(monkeypatch, mode, leaf):
    """Engine(mode=serve-q/serve-q4) on an eligible checkpoint repacks the
    stacked projections into the masked-dot layout and generates through
    the whole-step kernel (interpret mode on CPU), matching mode=serve."""
    import llm_inference_tpu.quant.device as qd

    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    buf = build_gemma3_gguf(
        n_layers=2, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, seed=31,
    )
    eng = Engine(GGUFFile(buf), max_seq=64, mode=mode, decode_chunk=4)
    assert isinstance(eng.weights.layers.wqkv, getattr(qd, leaf))
    eng.tokenizer.eos_id = -1
    eng.tokenizer.end_of_turn_id = -1
    out = eng.generate_from_ids([2, 7, 8], n_predict=6)

    ref = Engine(GGUFFile(buf), max_seq=64, mode="serve", decode_chunk=4)
    ref.tokenizer.eos_id = -1
    ref.tokenizer.end_of_turn_id = -1
    assert out == ref.generate_from_ids([2, 7, 8], n_predict=6)
