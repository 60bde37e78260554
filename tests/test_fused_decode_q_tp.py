"""TP lossless (masked-dot) whole-step decode megakernel vs the
single-chip masked-dot megakernel.

Runs the shard_map'd kernel (ops/pallas/fused_decode_q_tp.py) on the
virtual 8-device CPU mesh under the Pallas TPU interpreter — simulated
inter-chip DMAs/semaphores with race detection — and checks logits +
cache against the single-chip kernel on identical weights. Covers both
the int8 TQuantTensor layout (serve-q) and the nibble-packed sign-hi
TQ4Tensor layout (serve-q4, the 27B-class capacity format)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# interpret-mode megakernel emulation: minutes of single-core work
pytestmark = pytest.mark.slow

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.models import init_cache, load_weights
from llm_inference_tpu.models.weights import (
    fuse_projections,
    maskdot_layers,
    stack_layers,
)
from llm_inference_tpu.parallel import make_mesh

from fixtures import build_gemma3_gguf

VOCAB = [f"t{i}" for i in range(512)]


def _maskdot_weights(q4: bool, shard: int):
    buf = build_gemma3_gguf(n_layers=2, n_embd=256, n_ff=512, n_head=4,
                            n_head_kv=1, head_dim=128, vocab=VOCAB, seed=21)
    g = GGUFFile(buf)
    from llm_inference_tpu.models.hparams import load_hparams

    hp = load_hparams(g.metadata)
    _, w = load_weights(g, mode="packed-q4" if q4 else "packed-serve")
    w = fuse_projections(w)
    w = dataclasses.replace(w, layers=stack_layers(w.layers))
    wmd = maskdot_layers(w, q4=q4, shard=shard)
    assert wmd is not None
    return hp, wmd


def _single_chip_steps(hp, w, tokens, positions, max_seq):
    from llm_inference_tpu.ops.pallas.fused_decode_q import (
        decode_step_megakernel_q,
    )

    cache = init_cache(hp, max_seq, stacked=True, dtype=jnp.bfloat16)
    outs = []
    for tok, pos in zip(tokens, positions):
        logits, kc, vc = decode_step_megakernel_q(
            hp, w, cache, jnp.int32(tok), jnp.int32(pos), interpret=True)
        cache = dataclasses.replace(cache, k=kc, v=vc)
        outs.append(np.asarray(logits))
    return outs, cache


@pytest.mark.parametrize("q4,n", [(False, 2), (True, 2), (True, 4)])
def test_tp_maskdot_megakernel_matches_single_chip(q4, n):
    from llm_inference_tpu.ops.pallas.fused_decode_q_tp import (
        decode_step_megakernel_q_tp,
        shard_maskdot_for_tp,
        tp_megakernel_q_supported,
    )

    hp, w = _maskdot_weights(q4, n)
    assert tp_megakernel_q_supported(hp, w, n)
    packed, geom = shard_maskdot_for_tp(hp, w, n)
    mesh = make_mesh(model=n, data=1, devices=jax.devices()[:n])

    max_seq = 32
    tokens = [2, 7, 150, 511]
    positions = [3, 4, 5, 6]

    want, want_cache = _single_chip_steps(hp, w, tokens, positions, max_seq)

    cache = init_cache(hp, max_seq, stacked=True, dtype=jnp.bfloat16)
    got = []
    for tok, pos in zip(tokens, positions):
        logits, kc, vc = decode_step_megakernel_q_tp(
            hp, packed, geom, w, cache, jnp.int32(tok), jnp.int32(pos),
            mesh=mesh, interpret=True)
        cache = dataclasses.replace(cache, k=kc, v=vc)
        got.append(np.asarray(logits))

    for step, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            a, b, rtol=2e-5, atol=2e-5,
            err_msg=f"step {step} (q4={q4}, n={n}) logits diverge")
    np.testing.assert_allclose(
        np.asarray(cache.k), np.asarray(want_cache.k), rtol=1e-6, atol=1e-6)


def test_tp_maskdot_supported_gates():
    from llm_inference_tpu.ops.pallas.fused_decode_q_tp import (
        tp_megakernel_q_supported,
    )

    hp, w = _maskdot_weights(True, 2)
    assert not tp_megakernel_q_supported(hp, w, 1)   # TP needs n >= 2
    assert not tp_megakernel_q_supported(hp, w, 3)   # heads must split


def test_engine_tp_mesh_serve_q4_matches_single_chip(monkeypatch):
    """Engine(tp_mesh=..., mode='serve-q4') must emit the same greedy
    stream as the single-chip serve-q4 maskdot megakernel engine."""
    from llm_inference_tpu.engine import Engine

    buf = build_gemma3_gguf(n_layers=2, n_embd=256, n_ff=512, n_head=4,
                            n_head_kv=1, head_dim=128, vocab=VOCAB, seed=21)
    monkeypatch.setenv("LLMI_FUSED_INTERPRET", "1")
    single = Engine(GGUFFile(buf), max_seq=64, mode="serve-q4", decode_chunk=4)
    single.tokenizer.eos_id = -1
    single.tokenizer.end_of_turn_id = -1
    want = single.generate_from_ids([2, 7, 8], n_predict=6)

    mesh = make_mesh(model=2, data=1, devices=jax.devices()[:2])
    tp = Engine(GGUFFile(buf), max_seq=64, mode="serve-q4", decode_chunk=4,
                tp_mesh=mesh)
    assert tp._tp is not None and tp._tp_q
    tp.tokenizer.eos_id = -1
    tp.tokenizer.end_of_turn_id = -1
    got = tp.generate_from_ids([2, 7, 8], n_predict=6)
    assert got == want
