"""At-scale greedy parity (SURVEY.md §7.3 acceptance): the exact-contract
engine must reproduce the reference binary's greedy stream token-for-token
on the real Gemma-3-1B geometry.

Opt-in (LLMI_SLOW_TESTS=1): builds/loads the ~700 MB benchmark checkpoint
and runs both engines for dozens of tokens — minutes, not CI-seconds.
The full 100-token sweep across every serve mode is tools/greedy_parity.py
(results recorded in PARITY_1B.md)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from oracle_harness import oracle_available

pytestmark = [
    pytest.mark.skipif(os.environ.get("LLMI_SLOW_TESTS", "0") != "1",
                       reason="slow: set LLMI_SLOW_TESTS=1"),
    pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable"),
]

STEPS = 24


def test_greedy_stream_parity_1b_geometry():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from llm_inference_tpu.engine import Engine
    from oracle_harness import OracleModel

    if not bench.CACHE.exists():
        bench.build_checkpoint()
    buf = bench.CACHE.read_bytes()

    rng = np.random.default_rng(0)
    prompt = [2] + rng.integers(10, 10000, size=bench.PREFILL_LEN - 1).tolist()

    ref = OracleModel(buf)
    logits = ref.forward(prompt, 0, bench.VOCAB_SIZE)
    golden = []
    pos = len(prompt)
    for _ in range(STEPS):
        nxt = int(logits.argmax())
        golden.append(nxt)
        logits = ref.forward([nxt], pos, bench.VOCAB_SIZE)
        pos += 1
    ref.close()

    eng = Engine(str(bench.CACHE), max_seq=256, mode="parity", decode_chunk=8)
    eng.tokenizer.eos_id = -1
    eng.tokenizer.end_of_turn_id = -1
    got = eng.generate_from_ids(prompt, n_predict=STEPS)
    assert got == golden
