"""Native C++ data-path parity: every native codec must be bit-identical to
the numpy reference implementations in quant/layouts.py (which are
themselves bit-validated against the reference engine)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_inference_tpu import native
from llm_inference_tpu.gguf import GGMLType
from llm_inference_tpu.quant import layouts
from llm_inference_tpu.quant.device import _PLANAR

FORMATS = [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q5_0, GGMLType.Q4_K, GGMLType.Q6_K]

pytestmark = pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")


@pytest.mark.parametrize("fmt", FORMATS)
def test_repack_parity(fmt, rng):
    rows, cols = 5, 512
    w = (rng.standard_normal((rows, cols)) * 2.0).astype(np.float32)
    raw = layouts.encode(w, fmt)
    gs = 16 if fmt == GGMLType.Q6_K else 32
    got = native.repack(raw, int(fmt), rows, cols, gs)
    assert got is not None
    q_n, scale_n, offset_n = got
    q_p, scale_p, offset_p, gs_p = _PLANAR[fmt](raw, rows, cols)
    assert gs == gs_p
    np.testing.assert_array_equal(q_n, np.asarray(q_p).reshape(q_n.shape))
    np.testing.assert_array_equal(scale_n, scale_p.reshape(scale_n.shape))
    if offset_p is None:
        assert offset_n is None
    else:
        np.testing.assert_array_equal(offset_n, offset_p.reshape(offset_n.shape))


@pytest.mark.parametrize("fmt", FORMATS + [GGMLType.F16, GGMLType.BF16, GGMLType.F32])
def test_dequant_bf16_parity(fmt, rng):
    rows, cols = 4, 512
    w = (rng.standard_normal((rows, cols)) * 2.0).astype(np.float32)
    raw = layouts.encode(w, fmt)
    got = native.dequant_bf16(raw, int(fmt), rows, cols)
    assert got is not None
    want = np.asarray(jnp.asarray(layouts.dequantize(raw, fmt, rows, cols), dtype=jnp.bfloat16))
    np.testing.assert_array_equal(got, want.view(np.uint16))


def test_encode_q4_0_parity(rng):
    w = (rng.standard_normal((6, 256)) * 1.5).astype(np.float32)
    got = native.encode_q4_0(w)
    assert got is not None
    np.testing.assert_array_equal(got, layouts.encode(w, GGMLType.Q4_0))


def test_encode_f16_parity(rng):
    w = (rng.standard_normal((3, 128)) * 10).astype(np.float32)
    got = native.encode_f16(w)
    assert got is not None
    np.testing.assert_array_equal(got, layouts.encode(w, GGMLType.F16))


def test_encode_f16_subnormals(rng):
    """f16-subnormal-range inputs (2^-25 .. 2^-14) must match np.float16
    bit-for-bit — regression for the shift bug flagged in round-1 review
    (3.05e-5 must encode as 0x0200, not a garbage negative value)."""
    specials = np.array(
        [3.05e-5, 5.96e-8, 2 ** -25, np.nextafter(np.float32(2 ** -25), np.float32(1)),
         2 ** -24, 6.1e-5, -3.05e-5, 1e-30, 0.0, -0.0, 2 ** -14, np.nextafter(
             np.float32(2 ** -14), np.float32(0))],
        dtype=np.float32,
    )
    mags = np.exp(rng.uniform(np.log(1e-9), np.log(1e-4), size=500)).astype(np.float32)
    w = np.concatenate([specials, mags * rng.choice([-1, 1], size=500)]).reshape(1, -1)
    got = native.encode_f16(w)
    assert got is not None
    want = w.astype(np.float16).view(np.uint16).ravel()
    np.testing.assert_array_equal(got.view(np.uint16).ravel(), want)


def test_transpose_i8_matches_numpy():
    """Cache-blocked native transpose (capacity-loader hot copy),
    including ragged edge tiles."""
    from llm_inference_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for shape in ((128, 256), (130, 257), (1, 5), (300, 128)):
        a = rng.integers(-128, 128, size=shape, dtype=np.int8)
        got = native.transpose_i8(a)
        np.testing.assert_array_equal(got, np.ascontiguousarray(a.T))
