"""At-scale greedy parity (SURVEY.md §7.3 acceptance): the engine must
reproduce the reference binary's greedy stream token-for-token on the real
Gemma-3-1B geometry.

Runs on the TAME checkpoint (weight std 2e-2): a contractive random stack,
like a trained model, holds a pinned greedy stream for 100+ tokens. The
std-0.1 bench checkpoint is expansive — it amplifies irreducible ~1e-7
float-ordering noise ~3x/layer, so NO pair of bit-different engines (the
reference vs itself at a different ISA included; see
tools/oracle_divergence.py + PARITY_1B.md) can hold a long stream on it,
which makes it useless as a parity acceptance target.

Opt-in (LLMI_SLOW_TESTS=1): builds/loads the ~700 MB checkpoint and runs
the engine modes for STEPS tokens against the BAKED oracle stream
(tests/golden/parity_1b_tame.json, produced by a trusted run of
tools/bake_golden_parity.py — the reference's own golden-regression
pattern, model_test.cpp:409-460). Baked, one serve mode verifies in
~7 min on CPU all-in (load+compile+decode of the 1B; the oracle leg —
the previously unbounded part — costs nothing); without the bake the
oracle stream is recomputed (~30 s with the compiled AVX2 oracle). CI
runs the serve-q8 mode as its own job. The full five-mode 100-step
sweep is tools/greedy_parity.py (results recorded in PARITY_1B.md)."""

import json
import os
import sys

import numpy as np
import pytest

from oracle_harness import oracle_available

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "parity_1b_tame.json")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(os.environ.get("LLMI_SLOW_TESTS", "0") != "1",
                       reason="slow: set LLMI_SLOW_TESTS=1"),
    pytest.mark.skipif(
        not (os.path.exists(GOLDEN_PATH) or oracle_available()),
        reason="no baked golden stream and reference oracle unavailable"),
]

STEPS = 64

_golden = None


def _baked_stream(prompt):
    """The committed oracle stream, if its recorded config matches."""
    if not os.path.exists(GOLDEN_PATH):
        return None
    import bench

    with open(GOLDEN_PATH) as f:
        rec = json.load(f)
    ok = (rec["checkpoint"]["seed"] == 20260816
          and rec["checkpoint"]["weight_std"] == 0.02
          and rec["checkpoint"]["geometry"] == bench.GEOM_1B
          and rec["checkpoint"]["vocab_size"] == bench.VOCAB_SIZE
          and rec["prompt"] == list(prompt)
          and rec["steps"] >= STEPS)
    return rec["tokens"][:STEPS] if ok else None


def _golden_stream(prompt):
    """Oracle greedy stream: the baked file when fresh, else recomputed
    once (shared across mode params)."""
    global _golden
    if _golden is None:
        _golden = _baked_stream(prompt)
    if _golden is None:
        import bench
        from oracle_harness import OracleModel

        buf = bench.build_tame_checkpoint().read_bytes()
        ref = OracleModel(buf)
        logits = ref.forward(prompt, 0, bench.VOCAB_SIZE)
        out = []
        pos = len(prompt)
        for _ in range(STEPS):
            nxt = int(logits.argmax())
            out.append(nxt)
            logits = ref.forward([nxt], pos, bench.VOCAB_SIZE)
            pos += 1
        ref.close()
        _golden = out
    return _golden


@pytest.mark.parametrize("mode",
                         ["parity", "serve", "serve-q", "serve-q8", "serve-q4"])
def test_greedy_stream_parity_1b_geometry(mode):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from llm_inference_tpu.engine import Engine

    ckpt = bench.build_tame_checkpoint()

    rng = np.random.default_rng(0)
    prompt = [2] + rng.integers(10, 10000, size=31).tolist()  # pinned 32
    golden = _golden_stream(prompt)

    eng = Engine(str(ckpt), max_seq=256, mode=mode, decode_chunk=16)
    eng.tokenizer.eos_id = -1
    eng.tokenizer.end_of_turn_id = -1
    got = eng.generate_from_ids(list(prompt), n_predict=STEPS)
    matched = 0
    for a, b in zip(got, golden):
        if a != b:
            break
        matched += 1
    assert matched == STEPS, (
        f"{mode}: matched {matched}/{STEPS}, first divergence at step "
        f"{matched}: ref {golden[matched]} vs "
        f"{got[matched] if matched < len(got) else 'EOS'}"
    )
