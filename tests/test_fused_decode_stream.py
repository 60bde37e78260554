"""Streamed capacity decode megakernel (ops/pallas/fused_decode_stream.py)
and the host-side maskdot load (models/weights.py load_maskdot_stacked):
the row-tiled one-call-per-token path must match the XLA serve path on the
same packed weights, with multi-tile streaming forced via a tiny tile
target. Runs in Pallas interpreter mode on the CPU backend."""

import dataclasses
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# interpret-mode megakernel tests: minutes of CPU emulation; the fast
# CI gate (pytest -m 'not slow') skips them (VERDICT r2 weak #8)
pytestmark = pytest.mark.slow

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.gguf.constants import GGMLType
from llm_inference_tpu.models import forward, init_cache, load_weights
from llm_inference_tpu.models.gemma import _megakernel_stream_enabled
from llm_inference_tpu.models.weights import (
    fuse_projections,
    load_maskdot_stacked,
    maskdot_layer_bytes_estimate,
    maskdot_layers,
    stack_layers,
)
from llm_inference_tpu.ops.pallas import fused_decode_stream as fds
from llm_inference_tpu.quant.device import TQ4Tensor, TQuantTensor

from fixtures import build_gemma3_gguf


def _buf(weight_fmt=GGMLType.Q4_0, n_layers=3):
    vocab = [f"t{i}" for i in range(256)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    return build_gemma3_gguf(
        n_layers=n_layers, n_embd=256, n_ff=512, n_head=4, n_head_kv=2,
        head_dim=128, vocab=vocab, with_post_norms=True,
        weight_fmt=weight_fmt,
    )


@pytest.fixture()
def stream_env(monkeypatch):
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")
    # force multi-tile streaming at test shapes (prod target is 6 MB);
    # must stay >= the TR=128 slot of the biggest part (C=512 int8: 72 KB)
    monkeypatch.setattr(fds, "_TILE_TARGET", 80 * 1024)


@pytest.mark.parametrize("weight_fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
@pytest.mark.parametrize("q4", [False, True])
def test_host_load_matches_device_transform(weight_fmt, q4):
    """load_maskdot_stacked must build bit-identical arrays to the
    device-side stack_layers + maskdot_layers route."""
    buf = _buf(weight_fmt)
    hp, w = load_weights(GGUFFile(buf), mode="packed-serve")
    w = fuse_projections(w)
    want = maskdot_layers(
        dataclasses.replace(w, layers=stack_layers(w.layers)), q4=q4
    )
    got = load_maskdot_stacked(GGUFFile(buf), q4=q4)
    assert got is not None
    hp2, w2 = got
    assert hp2.block_count == hp.block_count
    for f in ("wqkv", "wo", "w_gate_up", "w_down"):
        a = getattr(want.layers, f)
        b = getattr(w2.layers, f)
        assert type(a) is type(b), f
        if isinstance(a, TQ4Tensor):
            np.testing.assert_array_equal(
                np.asarray(a.packedT), np.asarray(b.packedT), err_msg=f)
        else:
            np.testing.assert_array_equal(
                np.asarray(a.qT), np.asarray(b.qT), err_msg=f)
        np.testing.assert_array_equal(
            np.asarray(a.sT), np.asarray(b.sT), err_msg=f)
        assert (a.offT is None) == (b.offT is None)
        if a.offT is not None:
            np.testing.assert_array_equal(
                np.asarray(a.offT), np.asarray(b.offT), err_msg=f)
    for f in ("attn_norm", "ffn_norm", "q_norm", "k_norm",
              "post_attn_norm", "post_ffw_norm"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want.layers, f)),
            np.asarray(getattr(w2.layers, f)), err_msg=f)
    assert w2.token_embd.w.dtype == jnp.bfloat16


@pytest.mark.parametrize("weight_fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
@pytest.mark.parametrize("q4", [False, True])
def test_stream_kernel_matches_xla_serve(stream_env, monkeypatch, weight_fmt, q4):
    """The streamed megakernel (multi-tile, cross-part prefetch, Q4_K
    offsets) vs per-layer XLA serve on the same checkpoint — dispatched
    through forward() with the whole-layer kernel made ineligible."""
    from llm_inference_tpu.ops.pallas import fused_decode_q as fdq

    monkeypatch.setattr(fdq, "_BUFFER_BUDGET", 0)  # capacity-class layers

    buf = _buf(weight_fmt)
    hp, w = load_weights(GGUFFile(buf), mode="packed-serve")
    w = fuse_projections(w)
    _, ws = load_maskdot_stacked(GGUFFile(buf), q4=q4)
    assert isinstance(
        ws.layers.wqkv,
        TQ4Tensor if (q4 and weight_fmt in (GGMLType.Q4_0, GGMLType.Q4_K))
        else TQuantTensor,
    )
    assert _megakernel_stream_enabled(hp, ws, max_seq=64)
    # multi-tile plans at these shapes (the point of the test)
    plans = fds._plan([ws.layers.wqkv, ws.layers.wo,
                       ws.layers.w_gate_up, ws.layers.w_down])
    assert max(m["nt"] for m in plans) > 1

    cache_ref = init_cache(hp, 64, dtype=jnp.bfloat16)
    cache_fus = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
    fwd_ref = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    fwd_fus = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))

    toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    _, cache_ref = fwd_ref(w, cache_ref, toks, 0)
    _, cache_fus = fwd_fus(ws, cache_fus, toks, 0)

    pos = 3
    for step in range(3):
        tok = jnp.asarray([9 + step], dtype=jnp.int32)
        d_ref, cache_ref = fwd_ref(w, cache_ref, tok, pos)
        d_fus, cache_fus = fwd_fus(ws, cache_fus, tok, pos)
        pos += 1
        d_ref, d_fus = np.asarray(d_ref), np.asarray(d_fus)
        scale = max(1.0, np.abs(d_ref).max())
        # same exact weights; differences are bf16 rounding-order (the
        # kernel applies scales in f32, the XLA path rounds the
        # dequantized matrix to bf16)
        np.testing.assert_allclose(d_fus, d_ref, atol=1.5e-2 * scale,
                                   err_msg=f"step {step}")
        assert d_ref.argmax() == d_fus.argmax()

    k_ref = np.stack([np.asarray(k, dtype=np.float32) for k in cache_ref.k])
    k_fus = np.asarray(cache_fus.k, dtype=np.float32)
    np.testing.assert_allclose(k_fus[:, :pos], k_ref[:, :pos], atol=4e-2)


def test_stream_eligibility_bounds(stream_env):
    """max_seq drives the KV VMEM term; absurd sequences are rejected."""
    buf = _buf()
    _, ws = load_maskdot_stacked(GGUFFile(buf), q4=True)
    hp, _ = load_weights(GGUFFile(buf), mode="packed-serve")
    assert fds.megakernel_stream_supported(hp, ws, max_seq=64)
    assert not fds.megakernel_stream_supported(hp, ws, max_seq=1 << 24)


@pytest.mark.parametrize("weight_fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
@pytest.mark.parametrize("q4", [False, True])
def test_directory_precheck_agrees_with_postload(stream_env, weight_fmt, q4):
    """The directory-only structural precheck (no tensor reads) must agree
    with the post-load eligibility on loadable checkpoints."""
    buf = _buf(weight_fmt)
    gguf = GGUFFile(buf)
    hp, _ = load_weights(gguf, mode="packed-serve")
    pre = fds.stream_supported_from_directory(gguf, hp, q4=q4, max_seq=64)
    _, ws = load_maskdot_stacked(GGUFFile(buf), q4=q4)
    post = fds.megakernel_stream_supported(hp, ws, max_seq=64)
    assert pre == post == True  # noqa: E712
    # absurd max_seq rejected by both
    assert not fds.stream_supported_from_directory(
        gguf, hp, q4=q4, max_seq=1 << 24)


def test_layer_bytes_estimate():
    buf = _buf()
    gguf = GGUFFile(buf)
    est = maskdot_layer_bytes_estimate(gguf, q4=True)
    # one layer: qkv 1024x256/2 + wo 256x512/2 + gate_up 1024x256/2 +
    # down 256x512/2 nibbles + f32 scales per 32
    hp, w = load_weights(gguf, mode="packed-serve")
    lw = fuse_projections(w).layers[0]
    want = 0
    for f in ("wqkv", "wo", "w_gate_up", "w_down"):
        p = getattr(lw, f)
        want += p.rows * p.cols // 2 + (p.rows * p.cols // 32) * 4
    assert est == want


def test_capacity_tp_sharded_load_matches_unsharded():
    """load_maskdot_stacked(mesh=...) must row-shard every maskdot weight
    leaf over 'model' (the 27B-on-a-slice capacity program) and produce
    logits matching the unsharded load through the prefill/scan forward."""
    from functools import partial

    from llm_inference_tpu.parallel import make_mesh

    buf = _buf()
    hp, w_ref = load_maskdot_stacked(GGUFFile(buf), q4=True)
    mesh = make_mesh(model=8, data=1)
    hp2, w_tp = load_maskdot_stacked(GGUFFile(buf), q4=True, mesh=mesh)
    # every projection's rows (last dim) sharded over the 8 devices
    for f in ("wqkv", "wo", "w_gate_up", "w_down"):
        p = getattr(w_tp.layers, f)
        leaf = p.packedT if isinstance(p, TQ4Tensor) else p.qT
        assert len(leaf.sharding.device_set) == 8, f
        assert leaf.sharding.spec[-1] == "model", f
        assert p.sT.sharding.spec[-1] == "model", f
    assert w_tp.token_embd.w.sharding.spec[0] == "model"

    cache_a = init_cache(hp, 32, stacked=True, dtype=jnp.bfloat16)
    cache_b = init_cache(hp2, 32, stacked=True, dtype=jnp.bfloat16)
    fwd = jax.jit(partial(forward, hp, exact=False, mm_impl="xla"))
    toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
    la, _ = fwd(w_ref, cache_a, toks, 0)
    lb, _ = fwd(w_tp, cache_b, toks, 0)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), atol=2e-5)


def test_12b_geometry_plans_eligible():
    """The real Gemma-3-12B geometry (the kernel's design target) must
    pass the tile planner and the adaptive logits-tile pick in serve-q4:
    48 layers, d=3840, ffn=15360, 16/8 heads, head_dim 256, vocab 262144.
    Pure planning math — no arrays."""
    from llm_inference_tpu.quant.device import maskdot_block_geom

    D, F, H, Hkv, dk, dv, V = 3840, 15360, 16, 8, 256, 256, 262144
    Rq = H * dk + Hkv * (dk + dv)

    def meta(rows, cols):
        bg, bc, nblk, mp = maskdot_block_geom(cols, 32)
        return dict(packed=True, c_store=cols // 2, C=cols, R=rows, gs=32,
                    bg=bg, bc=bc, nblk=nblk, mp=mp, gp=nblk * mp,
                    has_off=False, centered=True)

    metas, dots = [], 0
    for rows, cols in ((Rq, D), (D, H * dv), (2 * F, D), (D, F)):
        m = meta(rows, cols)
        tr = fds._pick_tr(m)
        assert tr is not None, (rows, cols)
        m["TR"], m["nt"] = tr, rows // tr
        dots += m["nt"] * m["nblk"]
        metas.append(m)
    assert dots <= fds._MAX_DOTS
    base = fds._base_need(metas, D, Hkv, dk, dv, 1024)
    tn = fds._pick_tn(V, D, base)
    assert tn is not None and tn >= 1024  # the fixed 4096 tile was 63 MB
    assert base + 2 * tn * D * 2 <= fds._BUFFER_BUDGET


def test_capacity_engine_end_to_end(stream_env, monkeypatch, tmp_path):
    """Engine takes the capacity load + streamed-kernel path when the
    whole-layer budget can't hold a layer, and reproduces the standard
    serve-q4 engine's greedy stream."""
    from llm_inference_tpu.engine import Engine
    from llm_inference_tpu.ops.pallas import fused_decode_q as fdq

    buf = _buf()
    path = tmp_path / "m.gguf"
    path.write_bytes(buf)

    ref = Engine(str(path), max_seq=64, mode="serve-q4", decode_chunk=4)
    assert not ref._capacity
    prompt = ref.tokenizer.encode("ab", apply_chat_template=False).ids
    want = ref.generate_from_ids(prompt, n_predict=8)

    monkeypatch.setattr(fdq, "_BUFFER_BUDGET", 0)
    eng = Engine(str(path), max_seq=64, mode="serve-q4", decode_chunk=4)
    assert eng._capacity
    assert isinstance(eng.weights.layers.wqkv, TQ4Tensor)
    got = eng.generate_from_ids(prompt, n_predict=8)
    assert got == want

    # LLMI_FORCE_CAPACITY takes the same path without shrinking the
    # whole-layer budget (the TPU-side validation knob for small models)
    monkeypatch.undo()
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")
    monkeypatch.setenv("LLMI_FORCE_CAPACITY", "1")
    eng2 = Engine(str(path), max_seq=64, mode="serve-q4", decode_chunk=4)
    assert eng2._capacity
    assert eng2.generate_from_ids(prompt, n_predict=8) == want


def test_stream_kernel_pipeline_knobs(stream_env, monkeypatch):
    """LLMI_STREAM_LDEPTH=3 + LLMI_STREAM_DEFER_WB=1 (the deeper logits
    stream and the non-blocking KV writeback) must match the default
    double-buffer/blocking kernel token-for-token and cache-for-cache."""
    monkeypatch.setattr(
        __import__("llm_inference_tpu.ops.pallas.fused_decode_q",
                   fromlist=["x"]), "_BUFFER_BUDGET", 0)
    buf = _buf(GGMLType.Q4_0)
    hp, _ = load_weights(GGUFFile(buf), mode="packed-serve")
    _, ws = load_maskdot_stacked(GGUFFile(buf), q4=True)

    def run_once():
        cache = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
        fwd = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))
        toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
        _, cache = fwd(ws, cache, toks, 0)
        outs = []
        pos = 3
        for step in range(2):
            d, cache = fwd(ws, cache, jnp.asarray([9 + step], jnp.int32), pos)
            outs.append(np.asarray(d))
            pos += 1
        return outs, np.asarray(cache.k, dtype=np.float32)[:, :pos]

    want, kref = run_once()
    monkeypatch.setenv("LLMI_STREAM_LDEPTH", "3")
    monkeypatch.setenv("LLMI_STREAM_DEFER_WB", "1")
    got, kgot = run_once()
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(kgot, kref)


def test_stream_kernel_raw_f16_scales_bit_exact(stream_env, monkeypatch):
    """scale_f16=True (RAW per-group d kept as checkpoint f16; /16 fold
    applied in-kernel in f32) must be BIT-identical to the folded-f32
    load through both dequant and the streamed kernel: f16 -> f32 is
    exact and x/16 in f32 is an exponent shift."""
    monkeypatch.setattr(
        __import__("llm_inference_tpu.ops.pallas.fused_decode_q",
                   fromlist=["x"]), "_BUFFER_BUDGET", 0)
    buf = _buf(GGMLType.Q4_0)
    hp, _ = load_weights(GGUFFile(buf), mode="packed-serve")
    _, w32 = load_maskdot_stacked(GGUFFile(buf), q4=True, scale_f16=False)
    _, w16 = load_maskdot_stacked(GGUFFile(buf), q4=True, scale_f16=True)
    assert w16.layers.wqkv.sT.dtype == jnp.float16
    assert w32.layers.wqkv.sT.dtype == jnp.float32

    np.testing.assert_array_equal(
        np.asarray(w16.layers.w_down.dequant(jnp.float32)),
        np.asarray(w32.layers.w_down.dequant(jnp.float32)))

    def run_once(ws):
        cache = init_cache(hp, 64, stacked=True, dtype=jnp.bfloat16)
        fwd = jax.jit(partial(forward, hp, exact=False, mm_impl="auto"))
        toks = jnp.asarray([2, 7, 8], dtype=jnp.int32)
        _, cache = fwd(ws, cache, toks, 0)
        outs = []
        pos = 3
        for step in range(2):
            d, cache = fwd(ws, cache, jnp.asarray([9 + step], jnp.int32), pos)
            outs.append(np.asarray(d))
            pos += 1
        return outs

    for a, b in zip(run_once(w16), run_once(w32)):
        np.testing.assert_array_equal(a, b)
