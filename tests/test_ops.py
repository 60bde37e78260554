"""Ops-layer tests: analytic golden values (the reference ops_test.cpp
strategy) plus cross-engine parity of activation quantizers and quantized
matmuls against the compiled reference engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_inference_tpu.gguf import GGMLType, GGUFWriter
from llm_inference_tpu.ops import (
    gelu_tanh,
    quantize_q8_0,
    quantize_q8_k,
    rms_norm,
    rope,
    softcap,
)
from llm_inference_tpu.ops.linear import matmul, embed_rows
from llm_inference_tpu.quant import layouts
from llm_inference_tpu.quant.device import from_gguf_bytes

from oracle_harness import oracle_available

QUANT_FORMATS = [GGMLType.Q4_0, GGMLType.Q5_0, GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q6_K]


# -- analytic checks (reference ops_test.cpp:17-93) ---------------------------


def test_rms_norm_analytic():
    # reference ops_test.cpp:17-28: x=[1,2,3,4], eps=1e-5
    x = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    out = np.asarray(rms_norm(jnp.asarray(x), 1e-5))
    mean_sq = np.mean(x**2)
    np.testing.assert_allclose(out, x / np.sqrt(mean_sq + 1e-5), rtol=1e-6)


def test_rope_pos0_identity():
    x = np.random.default_rng(0).standard_normal((1, 2, 8)).astype(np.float32)
    out = np.asarray(rope(jnp.asarray(x), n_rot=8, freq_base=10000.0, freq_scale=1.0, pos=jnp.array([0])))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_rope_pos1_golden():
    # pair (i, i+n_rot/2) rotates by theta = base^(-2i/n_rot) at pos 1
    n_rot = 4
    x = np.array([[[1.0, 2.0, 3.0, 4.0]]], dtype=np.float32)  # [T=1, H=1, D=4]
    out = np.asarray(rope(jnp.asarray(x), n_rot=n_rot, freq_base=10000.0, freq_scale=1.0, pos=jnp.array([1])))
    for i in range(2):
        theta = 1.0 / (10000.0 ** (2.0 * i / n_rot))
        c, s = np.cos(theta), np.sin(theta)
        v0, v1 = x[0, 0, i], x[0, 0, i + 2]
        np.testing.assert_allclose(out[0, 0, i], v0 * c - v1 * s, rtol=1e-5)
        np.testing.assert_allclose(out[0, 0, i + 2], v0 * s + v1 * c, rtol=1e-5)


def test_gelu_tanh_golden():
    x = jnp.asarray([0.0, 1.0, -1.0], dtype=jnp.float32)
    out = np.asarray(gelu_tanh(x))
    np.testing.assert_allclose(out, [0.0, 0.841192, -0.158808], atol=1e-5)


def test_softcap():
    x = jnp.asarray([0.0, 100.0, -100.0], dtype=jnp.float32)
    out = np.asarray(softcap(x, 50.0))
    np.testing.assert_allclose(out, [0.0, 50.0 * np.tanh(2.0), -50.0 * np.tanh(2.0)], rtol=1e-4)
    assert softcap(x, 0.0) is x


# -- activation quantizer parity vs reference ---------------------------------


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_quantize_q8_0_bit_parity(rng):
    from oracle_harness import oracle_quantize_q8_0

    x = (rng.standard_normal(256) * 5.0).astype(np.float32)
    ref_d, ref_q = oracle_quantize_q8_0(x)
    d, q = quantize_q8_0(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(d), ref_d.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(q), ref_q.astype(np.int32))


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_quantize_q8_k_bit_parity(rng):
    from oracle_harness import oracle_quantize_q8_k

    x = (rng.standard_normal(512) * 3.0).astype(np.float32)
    ref_d, ref_q, ref_bsums = oracle_quantize_q8_k(x)
    d, q, bsums = quantize_q8_k(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(d), ref_d)
    np.testing.assert_array_equal(np.asarray(q), ref_q.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(bsums), ref_bsums.astype(np.int32))


# -- planar repack correctness -------------------------------------------------


@pytest.mark.parametrize("fmt", QUANT_FORMATS)
def test_planar_dequant_matches_layouts(fmt, rng):
    """QuantTensor.dequant must reproduce layouts.dequantize bit-for-bit."""
    rows, cols = 6, 512
    w = (rng.standard_normal((rows, cols)) * 2.0).astype(np.float32)
    raw = layouts.encode(w, fmt)
    golden = layouts.dequantize(raw, fmt, rows, cols)
    qt = from_gguf_bytes(raw, fmt, rows, cols)
    np.testing.assert_array_equal(np.asarray(qt.dequant()), golden, err_msg=fmt.name)


# -- quantized matmul parity vs the reference GEMVs ----------------------------


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
@pytest.mark.parametrize("fmt", QUANT_FORMATS + [GGMLType.F16, GGMLType.BF16])
def test_matmul_parity_vs_reference_gemv(fmt, rng):
    from oracle_harness import OracleGGUF

    rows, cols = 48, 512
    w = (rng.standard_normal((rows, cols)) * 0.5).astype(np.float32)
    x = (rng.standard_normal(cols) * 1.5).astype(np.float32)
    raw = layouts.encode(w, fmt)

    writer = GGUFWriter()
    writer.add_tensor("t", raw, fmt, shape=(cols, rows), raw=True)
    ref = OracleGGUF(writer.build())
    golden = ref.matvec("t", x, rows)
    ref.close()

    qt = from_gguf_bytes(raw, fmt, rows, cols)
    ours = np.asarray(matmul(qt, jnp.asarray(x)))
    # Same quantized operands, different accumulation order -> tiny fp drift.
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4, err_msg=fmt.name)


def test_embed_rows_matches_dequant(rng):
    rows, cols = 12, 256
    w = rng.standard_normal((rows, cols)).astype(np.float32)
    raw = layouts.encode(w, GGMLType.Q6_K)
    qt = from_gguf_bytes(raw, GGMLType.Q6_K, rows, cols)
    ids = jnp.asarray([3, 0, 11])
    out = np.asarray(embed_rows(qt, ids))
    golden = np.asarray(qt.dequant())[[3, 0, 11]]
    np.testing.assert_array_equal(out, golden)
