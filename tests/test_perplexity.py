"""Perplexity tool (tools/perplexity.py): teacher-forced NLL over the
decode path. BASELINE.md's correctness clause includes "perplexity at the
same bit-width"; the reference engine itself has no such tool."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from fixtures import build_gemma3_gguf

from llm_inference_tpu.engine import Engine
from llm_inference_tpu.gguf import GGUFFile


@pytest.fixture(scope="module")
def eng_pair(tmp_path_factory):
    buf = build_gemma3_gguf(n_layers=2, seed=33, weight_std=0.05)
    p = tmp_path_factory.mktemp("ppl") / "m.gguf"
    p.write_bytes(bytes(buf))
    bf16 = Engine(str(p), max_seq=128, mode="serve", decode_chunk=8)
    q8 = Engine(str(p), max_seq=128, mode="serve-q8", decode_chunk=8)
    return bf16, q8


def test_perplexity_own_stream_beats_shuffled(eng_pair):
    from perplexity import perplexity

    eng, _ = eng_pair
    eng.tokenizer.eos_id = -1
    eng.tokenizer.end_of_turn_id = -1
    # the model's own greedy continuation is (near-)minimal-surprise text
    prompt = [2, 7, 8]
    stream = prompt + eng.generate_from_ids(list(prompt), n_predict=24)
    ppl_own, _, n = perplexity(eng, stream, chunk=8)
    assert n == len(stream) - 1

    rng = np.random.default_rng(0)
    shuffled = [2] + rng.integers(4, 20, size=len(stream) - 1).tolist()
    ppl_rand, _, _ = perplexity(eng, shuffled, chunk=8)
    assert ppl_own < ppl_rand, (ppl_own, ppl_rand)


def test_perplexity_bitwidths_agree(eng_pair):
    """serve (bf16 dequant) and serve-q8 (rowq8 requant) score the same
    stream within a few percent — the cross-bit-width comparison the tool
    exists for."""
    from perplexity import perplexity

    bf16, q8 = eng_pair
    rng = np.random.default_rng(1)
    ids = [2] + rng.integers(4, 25, size=40).tolist()
    p1, nll1, _ = perplexity(bf16, ids, chunk=8)
    p2, nll2, _ = perplexity(q8, ids, chunk=8)
    assert abs(nll1 - nll2) / max(nll1, 1e-6) < 0.05, (p1, p2)
