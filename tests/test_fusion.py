"""Load-time projection fusion (QKV, gate+up) must be exactly equivalent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from functools import partial

from llm_inference_tpu.gguf import GGUFFile, GGMLType
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.weights import fuse_projections
from llm_inference_tpu.sampling import SamplingConfig, sample

from fixtures import build_gemma3_gguf


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
def test_fused_forward_identical(fmt, rng):
    n = 256 if fmt == GGMLType.Q4_K else 32
    buf = build_gemma3_gguf(n_layers=2, n_embd=n, n_ff=2 * n, weight_fmt=fmt)
    g = GGUFFile(buf)
    hp, w = load_weights(g)
    w_fused = fuse_projections(w)
    assert w_fused.layers[0].wqkv is not None
    assert w_fused.layers[0].w_gate_up is not None
    assert w_fused.layers[0].wq is None

    fwd = jax.jit(partial(forward, hp))
    tokens = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    la, _ = fwd(w, init_cache(hp, 32), tokens, 0)
    lb, _ = fwd(w_fused, init_cache(hp, 32), tokens, 0)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_sampling_greedy_and_stochastic():
    logits = jnp.asarray([0.1, 5.0, -1.0, 4.9], dtype=jnp.float32)
    assert int(sample(logits, SamplingConfig())) == 1
    key = jax.random.PRNGKey(0)
    cfg = SamplingConfig(temperature=0.7, top_k=2)
    tid = int(sample(logits, cfg, key))
    assert tid in (1, 3)  # top-2 only
    cfg_p = SamplingConfig(temperature=1.0, top_p=0.5)
    tid = int(sample(logits, cfg_p, key))
    assert tid == 1  # p(1) ~ 0.52 covers the 0.5 nucleus alone


def test_rowwise_requant_close(rng):
    """serve-q8's per-row int8 requant: bounded error vs exact dequant."""
    from llm_inference_tpu.quant import layouts
    from llm_inference_tpu.quant.device import from_gguf_bytes, requantize_rowwise
    from llm_inference_tpu.ops.pallas import quant_matmul

    rows, cols = 64, 512
    w = (rng.standard_normal((rows, cols)) * 0.3).astype(np.float32)
    raw = layouts.encode(w, GGMLType.Q4_0)
    qt = from_gguf_bytes(raw, GGMLType.Q4_0, rows, cols)
    q8 = requantize_rowwise(GGMLType.Q4_0, raw, rows, cols)
    assert q8.group_size == cols and q8.groups == 1

    exact = np.asarray(qt.dequant())
    approx = np.asarray(q8.dequant())
    err = np.abs(approx - exact).max(axis=1) / (np.abs(exact).max(axis=1) + 1e-9)
    assert err.max() < 0.01  # <= 1/127 of each row's max

    x = jnp.asarray(rng.standard_normal((2, cols)).astype(np.float32))
    golden = np.asarray(jnp.matmul(x, jnp.asarray(approx).T))
    got = np.asarray(quant_matmul(q8, x, interpret=True))
    scale = np.abs(golden).max() + 1e-6
    np.testing.assert_allclose(got, golden, atol=2e-2 * scale)


def test_int8_rowwise_matmul_close(rng):
    """The W8A8 XLA path (serve-q8 logits matmul) vs dequant golden."""
    from llm_inference_tpu.ops.linear import int8_rowwise_matmul
    from llm_inference_tpu.quant.device import requantize_rowwise
    from llm_inference_tpu.quant import layouts

    rows, cols = 128, 512
    w = (rng.standard_normal((rows, cols)) * 0.3).astype(np.float32)
    raw = layouts.encode(w, GGMLType.Q4_0)
    q8 = requantize_rowwise(GGMLType.Q4_0, raw, rows, cols)
    x = jnp.asarray(rng.standard_normal((2, cols)).astype(np.float32))
    golden = np.asarray(jnp.matmul(x, q8.dequant().T))
    got = np.asarray(int8_rowwise_matmul(q8, x))
    scale = np.abs(golden).max() + 1e-6
    np.testing.assert_allclose(got, golden, atol=2.5e-2 * scale)
