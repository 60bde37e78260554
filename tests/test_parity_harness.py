"""Activation-parity harness test: capture the reference engine's verbose
named-tensor dump, run our forward with tracing, and assert the per-tensor
checksums line up — the working C16-equivalent cross-engine harness."""

import ctypes
import os
import sys
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from llm_inference_tpu import parity, trace
from llm_inference_tpu.gguf import GGUFFile, GGMLType
from llm_inference_tpu.models import forward, init_cache, load_weights

from fixtures import build_gemma3_gguf, build_gemma4_gguf, DEFAULT_VOCAB, GEMMA4_VOCAB
from oracle_harness import oracle_available


def _capture_reference_dump(buf, tokens, pos=0, vocab_size=None):
    from oracle_harness import OracleModel, get_oracle

    lib = get_oracle()
    lib.oracle_set_verbose.argtypes = [ctypes.c_int]
    ref = OracleModel(buf)
    lib.oracle_set_verbose(1)
    with tempfile.NamedTemporaryFile(mode="w+") as tf:
        saved = os.dup(1)
        os.dup2(tf.fileno(), 1)
        try:
            ref.forward(tokens, pos, vocab_size or len(DEFAULT_VOCAB))
        finally:
            sys.stdout.flush()
            os.dup2(saved, 1)
            os.close(saved)
        tf.seek(0)
        text = tf.read()
    lib.oracle_set_verbose(0)
    ref.close()
    return text


def test_parse_reference_dump_shapes():
    text = "foo-0 = {4, 2, 1, 1}\n      [   1.0000,    2.0000],\n    sum = 3.000000\n"
    recs = parity.parse_reference_dump(text)
    assert len(recs) == 1
    assert recs[0].name == "foo-0"
    assert recs[0].shape == (4, 2, 1, 1)
    assert recs[0].total == pytest.approx(3.0)


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_activation_checksums_match_reference():
    buf = build_gemma3_gguf(n_layers=2, weight_fmt=GGMLType.Q4_0)
    tokens = [2, 7, 8]

    dump = _capture_reference_dump(buf, tokens)
    ref_records = parity.parse_reference_dump(dump)
    assert len(ref_records) > 20

    g = GGUFFile(buf)
    hp, w = load_weights(g)
    session = trace.enable_trace("/tmp/llmi_trace_test.npz")
    try:
        cache = init_cache(hp, 32)
        # eager forward: taps record synchronously in graph order
        forward(hp, w, cache, jnp.asarray(tokens, dtype=jnp.int32), 0)
    finally:
        trace.disable_trace()

    assert len(session.records) > 20
    divergences = parity.compare_sums(ref_records, session.records, rel_tol=2e-3)
    assert divergences == [], "\n".join(
        f"{d.name}: ref={d.ref_sum} ours={d.our_sum} rel={d.rel_diff:.2e}" for d in divergences
    )


def test_corner_sample_matches_printer_pattern():
    """corner_sample must reproduce the reference printer's first-3/last-3
    per-axis sampling in print order (tensor.h:48-70)."""
    a = np.arange(8 * 10, dtype=np.float64).reshape(8, 10)
    got = parity.corner_sample(a)
    rows = [0, 1, 2, 5, 6, 7]
    cols = [0, 1, 2, 7, 8, 9]
    want = np.array([a[r, c] for r in rows for c in cols])
    np.testing.assert_array_equal(got, want)
    # small axes emit everything
    np.testing.assert_array_equal(parity.corner_sample(np.arange(5.0)), np.arange(5.0))


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_value_mse_vs_reference():
    """The compare_tensors.py-grade metric: per-tensor corner-value MSE
    against the reference dump must sit at the printer's 4-decimal
    quantization floor for the exact path."""
    buf = build_gemma3_gguf(n_layers=2, weight_fmt=GGMLType.Q4_0)
    tokens = [2, 7, 8]
    dump = _capture_reference_dump(buf, tokens)
    ref_records = parity.parse_reference_dump(dump)

    g = GGUFFile(buf)
    hp, w = load_weights(g)
    session = trace.enable_trace("/tmp/llmi_trace_mse.npz")
    try:
        cache = init_cache(hp, 32)
        forward(hp, w, cache, jnp.asarray(tokens, dtype=jnp.int32), 0)
    finally:
        trace.disable_trace()

    comps = parity.compare_values(ref_records, session.records)
    assert len(comps) > 20
    assert all(c.n_values > 0 for c in comps)
    # %.4f print quantization floor is ~8.3e-10 mean-square; give 100x slack
    worst = max(c.value_mse for c in comps)
    assert worst < 1e-7, parity.format_comparison_report(comps)
    report = parity.format_comparison_report(comps)
    assert "OVERALL AVG MSE" in report and "Top 5 Value MSEs" in report


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_gemma4_activation_checksums_match_reference():
    """The gemma4 path (per-layer inputs, shared KV, out_scale): every named
    tensor through l_out of the last layer stays within the noise floor."""
    buf = build_gemma4_gguf(n_layers=4, shared_kv_layers=1)
    tokens = [2, 7, 8]

    dump = _capture_reference_dump(buf, tokens, vocab_size=len(GEMMA4_VOCAB))
    ref_records = parity.parse_reference_dump(dump)
    assert any(r.name.startswith("per_layer_embd_out") for r in ref_records)

    g = GGUFFile(buf)
    hp, w = load_weights(g)
    session = trace.enable_trace("/tmp/llmi_trace_g4.npz")
    try:
        cache = init_cache(hp, 32)
        forward(hp, w, cache, jnp.asarray(tokens, dtype=jnp.int32), 0)
    finally:
        trace.disable_trace()

    # per-layer tensors hold a tight bar; the final logits' noise behavior
    # is asserted separately (test_gemma4.py golden-logit tolerances)
    layer_records = [r for r in ref_records if not r.name.startswith("result_")]
    divergences = parity.compare_sums(layer_records, session.records, rel_tol=1e-2)
    assert divergences == [], "\n".join(
        f"{d.name}: ref={d.ref_sum} ours={d.our_sum} rel={d.rel_diff:.2e}" for d in divergences
    )


def test_parse_eval_callback_dump():
    """llama.cpp llama-eval-callback format (the reference's golden leg,
    diff_with_llama_cpp.sh): prefix stripping, ROPE header rename,
    corner values, sum."""
    dump = """\
ggml_debug:                 inp_embd = (f32)  GET_ROWS(token_embd.weight{32, 10, 1, 1}, inp_tokens}) = {32, 3, 1, 1}
ggml_debug:                              [
ggml_debug:                               [
ggml_debug:                                [  0.1000,   0.2000,   0.3000, ...,  -0.5000],
ggml_debug:                               ],
ggml_debug:                              ]
ggml_debug:                              sum = 1.234500
common_debug_cb_eval:       Qcur-0 = (f32)     ROPE(Qcur-0 (reshaped){8, 2, 3, 1}, inp_pos}) = {8, 2, 3, 1}
common_debug_cb_eval:                        [
common_debug_cb_eval:                         [
common_debug_cb_eval:                          [  1.5000,  -2.2500],
common_debug_cb_eval:                         ],
common_debug_cb_eval:                        ]
common_debug_cb_eval:                        sum = -0.750000
"""
    recs = parity.parse_eval_callback_dump(dump)
    assert [r.name for r in recs] == ["inp_embd", "Qcur-0 (post rope)"]
    assert recs[0].shape == (32, 3, 1, 1)
    assert recs[0].total == 1.2345
    assert recs[0].corners == [0.1, 0.2, 0.3, -0.5]
    assert recs[1].total == -0.75
    assert recs[1].corners == [1.5, -2.25]

    # the records align with our trace names through compare_values
    ours = [("inp_embd", np.array([[0.1, 0.2, 0.3, -0.5]])),
            ("Qcur-0 (post rope)", np.array([1.5, -2.25]))]
    comps = parity.compare_values(recs, ours)
    assert len(comps) == 2
    assert all(c.value_mse < 1e-12 for c in comps)


def test_mse_logplot_renders():
    comps = [
        parity.TensorComparison(name=f"t{i}", index=i, sum_diff=0.0,
                                value_mse=10.0 ** (-8 + i % 5), n_values=6)
        for i in range(40)
    ]
    plot = parity.mse_logplot(comps)
    assert "log10 value-MSE" in plot and "*" in plot
