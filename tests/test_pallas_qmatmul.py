"""Fused dequant-matmul kernel vs the XLA dequant-then-matmul golden path.

Runs in Pallas interpret mode on the CPU backend (the TPU-hardware numbers
come from bench.py); correctness here is exact f32 equivalence with
QuantTensor.dequant + dot.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_inference_tpu.gguf import GGMLType
from llm_inference_tpu.ops.pallas import quant_matmul, supports_pallas
from llm_inference_tpu.quant import layouts
from llm_inference_tpu.quant.device import from_gguf_bytes

FORMATS = [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q5_0, GGMLType.Q4_K, GGMLType.Q6_K]


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("t", [1, 8])
def test_fused_matches_dequant_matmul(fmt, t, rng):
    rows, cols = 64, 512
    w = (rng.standard_normal((rows, cols)) * 0.3).astype(np.float32)
    raw = layouts.encode(w, fmt)
    qt = from_gguf_bytes(raw, fmt, rows, cols)

    x = jnp.asarray(rng.standard_normal((t, cols)).astype(np.float32))
    golden = np.asarray(jnp.matmul(x, qt.dequant().T, preferred_element_type=jnp.float32))
    got = np.asarray(quant_matmul(qt, x, interpret=True))
    # the kernel dequantizes/contracts in bf16 (serve-mode precision)
    scale = np.abs(golden).max() + 1e-6
    np.testing.assert_allclose(got, golden, atol=2e-2 * scale, err_msg=fmt.name)


def test_row_tiling_multiple_programs(rng):
    rows, cols = 1024, 256  # forces a multi-step grid (tile 512)
    w = (rng.standard_normal((rows, cols)) * 0.3).astype(np.float32)
    raw = layouts.encode(w, GGMLType.Q4_0)
    qt = from_gguf_bytes(raw, GGMLType.Q4_0, rows, cols)
    x = jnp.asarray(rng.standard_normal((2, cols)).astype(np.float32))
    golden = np.asarray(jnp.matmul(x, qt.dequant().T))
    got = np.asarray(quant_matmul(qt, x, interpret=True))
    scale = np.abs(golden).max() + 1e-6
    np.testing.assert_allclose(got, golden, atol=2e-2 * scale)


def test_supports_pallas_bounds(rng):
    raw = layouts.encode(np.zeros((64, 512), np.float32), GGMLType.Q4_0)
    qt = from_gguf_bytes(raw, GGMLType.Q4_0, 64, 512)
    assert supports_pallas(qt, 1)
    assert not supports_pallas(qt, 128)  # prefill goes to the XLA path


def test_pack_q4_lossless(rng):
    """Nibble packing must reproduce the planar dequant bit-for-bit."""
    from llm_inference_tpu.quant.device import pack_q4

    for fmt, cols in [(GGMLType.Q4_0, 512), (GGMLType.Q4_K, 512)]:
        w = (rng.standard_normal((16, cols)) * 0.3).astype(np.float32)
        raw = layouts.encode(w, fmt)
        qt = from_gguf_bytes(raw, fmt, 16, cols)
        q4 = pack_q4(qt)
        assert q4 is not None, fmt.name
        np.testing.assert_array_equal(
            np.asarray(q4.dequant()), np.asarray(qt.dequant()), err_msg=fmt.name
        )
    # non-4-bit formats refuse
    raw6 = layouts.encode(np.zeros((4, 512), np.float32), GGMLType.Q6_K)
    assert pack_q4(from_gguf_bytes(raw6, GGMLType.Q6_K, 4, 512)) is None


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
def test_q4_matmul_matches_dequant(fmt, rng):
    from llm_inference_tpu.quant.device import pack_q4
    from llm_inference_tpu.ops.pallas import q4_matmul

    rows, cols = 64, 512
    w = (rng.standard_normal((rows, cols)) * 0.3).astype(np.float32)
    raw = layouts.encode(w, fmt)
    q4 = pack_q4(from_gguf_bytes(raw, fmt, rows, cols))
    x = jnp.asarray(rng.standard_normal((2, cols)).astype(np.float32))
    golden = np.asarray(jnp.matmul(x, q4.dequant().T, preferred_element_type=jnp.float32))
    got = np.asarray(q4_matmul(q4, x, interpret=True))
    scale = np.abs(golden).max() + 1e-6
    np.testing.assert_allclose(got, golden, atol=2e-2 * scale, err_msg=fmt.name)
