"""Continuous batching: batched decode must reproduce the single-stream
engine token-for-token, across staggered joins and retirements."""

import numpy as np
import pytest

from llm_inference_tpu.engine import Engine
from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.serving import BatchedServer

from fixtures import build_gemma3_gguf


@pytest.fixture(scope="module")
def model_buf():
    return build_gemma3_gguf(n_layers=2, seed=99)


def _reference_outputs(model_buf, prompts, n_predict):
    engine = Engine(GGUFFile(model_buf), max_seq=64, mode="parity", decode_chunk=4)
    return [engine.generate_from_ids(p, n_predict=n) for p, n in zip(prompts, n_predict)]


def test_batched_matches_single_stream(model_buf):
    prompts = [[2, 7, 8], [2, 10, 11, 9], [2, 12]]
    n_predict = [6, 5, 7]
    want = _reference_outputs(model_buf, prompts, n_predict)

    server = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=4,
                           mode="parity", decode_chunk=4)
    got = server.run(list(zip(prompts, n_predict)))
    assert got == want


def test_more_requests_than_slots(model_buf):
    prompts = [[2, 7, 8], [2, 10, 11, 9], [2, 12], [2, 8, 8], [2, 9]]
    n_predict = [4] * 5
    want = _reference_outputs(model_buf, prompts, n_predict)

    server = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=2,
                           mode="parity", decode_chunk=4)
    got = server.run(list(zip(prompts, n_predict)))
    assert got == want


def test_overlong_request_rejected(model_buf):
    """Requests that could overrun the cache must be rejected at submit,
    never silently drop KV writes (round-1 review finding)."""
    server = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=1,
                           mode="parity", decode_chunk=4)
    with pytest.raises(ValueError, match="max_seq"):
        server.submit([2] * 60, n_predict=10)
    with pytest.raises(ValueError, match="max_seq"):
        server.submit([2] * 3, n_predict=64)


def test_unknown_mode_rejected(model_buf):
    with pytest.raises(ValueError, match="supported"):
        BatchedServer(GGUFFile(model_buf), max_seq=64, mode="serve-q9")


def test_serve_q4_mode(model_buf):
    """serve-q4 (lossless nibble-packed) must work batched, matching the
    bf16 serve stream on this well-conditioned fixture."""
    server = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=2,
                           mode="serve-q4", decode_chunk=4)
    got = server.run([([2, 7, 8], 5), ([2, 12], 5)])
    ref = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=2,
                        mode="serve", decode_chunk=4)
    want = ref.run([([2, 7, 8], 5), ([2, 12], 5)])
    assert got == want


def test_slot_reuse_is_clean(model_buf):
    """A request that reuses a freed slot must be unaffected by stale cache."""
    server = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=1,
                           mode="parity", decode_chunk=4)
    first = server.run([([2, 7, 8], 5)])[0]
    second = server.run([([2, 7, 8], 5)])[0]
    assert first == second


def test_grouped_admission_matches_serial(model_buf):
    """Same-bucket requests admitted in one vmapped prefill dispatch must
    behave exactly like serial admission (padded lanes must not clobber)."""
    serial = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=4,
                           mode="serve", decode_chunk=4, max_admit_per_step=1)
    want = serial.run([([2, 7, 8], 5), ([2, 10, 11], 5), ([2, 12], 5)])

    grouped = BatchedServer(GGUFFile(model_buf), max_seq=64, max_batch=4,
                            mode="serve", decode_chunk=4, max_admit_per_step=4)
    got = grouped.run([([2, 7, 8], 5), ([2, 10, 11], 5), ([2, 12], 5)])
    assert got == want


def test_gemma4_batched_decode():
    """The batched decode step must handle the gemma4 path (per-layer
    inputs, shared KV, out_scale) identically to single-stream serve."""
    from fixtures import build_gemma4_gguf
    from llm_inference_tpu.engine import Engine

    buf = build_gemma4_gguf(n_layers=4, shared_kv_layers=1, seed=5)
    single = Engine(GGUFFile(buf), max_seq=64, mode="serve", decode_chunk=4)
    want = [single.generate_from_ids([2, 7, 8], n_predict=5),
            single.generate_from_ids([2, 9], n_predict=5)]

    srv = BatchedServer(GGUFFile(buf), max_seq=64, max_batch=2,
                        mode="serve", decode_chunk=4)
    got = srv.run([([2, 7, 8], 5), ([2, 9], 5)])
    assert got == want


def test_paged_matches_dense_server(model_buf):
    """Paged KV pool serving == dense per-slot serving, token for token."""
    prompts = [[2, 7, 8], [2, 10, 11, 9], [2, 12], [2, 5, 6, 7, 9]]
    n_predict = [6, 5, 7, 4]

    dense = BatchedServer(GGUFFile(model_buf), max_seq=256, max_batch=4,
                          mode="serve", decode_chunk=4)
    want = dense.run(list(zip(prompts, n_predict)))

    paged = BatchedServer(GGUFFile(model_buf), max_seq=256, max_batch=4,
                          mode="serve", decode_chunk=4, kv_pages=6)
    got = paged.run(list(zip(prompts, n_predict)))
    assert got == want


def test_paged_pool_exhaustion_waits(model_buf):
    """With fewer pages than concurrent requests, admission waits for
    retirements instead of corrupting the pool; all requests complete."""
    prompts = [[2, 7, 8], [2, 10, 11], [2, 12]]
    n_predict = [5, 5, 5]
    dense = BatchedServer(GGUFFile(model_buf), max_seq=256, max_batch=4,
                          mode="serve", decode_chunk=4)
    want = dense.run(list(zip(prompts, n_predict)))

    paged = BatchedServer(GGUFFile(model_buf), max_seq=256, max_batch=4,
                          mode="serve", decode_chunk=4, kv_pages=2)
    got = paged.run(list(zip(prompts, n_predict)))
    assert got == want
    assert sorted(paged._free_pages) == [0, 1]  # all pages returned


def test_paged_rejects_parity_mode(model_buf):
    with pytest.raises(ValueError):
        BatchedServer(GGUFFile(model_buf), max_seq=256, max_batch=2,
                      mode="parity", kv_pages=4)


def test_paged_grouped_admission_matches_serial(model_buf):
    """Paged same-bucket requests admitted in one vmapped prefill dispatch
    (grouped page scatter) must behave exactly like serial admission."""
    reqs = [([2, 7, 8], 5), ([2, 10, 11], 5), ([2, 12], 5), ([2, 9, 4], 5)]
    serial = BatchedServer(GGUFFile(model_buf), max_seq=256, max_batch=4,
                           mode="serve", decode_chunk=4, kv_pages=8,
                           max_admit_per_step=1)
    want = serial.run(list(reqs))

    grouped = BatchedServer(GGUFFile(model_buf), max_seq=256, max_batch=4,
                            mode="serve", decode_chunk=4, kv_pages=8,
                            max_admit_per_step=4)
    got = grouped.run(list(reqs))
    assert got == want
    assert sorted(grouped._free_pages) == list(range(8))


def test_paged_submit_rejects_unservable_request(model_buf):
    """A request needing more pages than the pool HOLDS can never be
    admitted — it must be rejected at submit, not livelock the queue
    (round-2 advisor finding)."""
    server = BatchedServer(GGUFFile(model_buf), max_seq=1024, max_batch=2,
                           mode="serve", decode_chunk=4, kv_pages=1)
    with pytest.raises(ValueError, match="pages"):
        server.submit([2] * 8, n_predict=300)
    # a pool-sized request is fine
    server.submit([2] * 8, n_predict=100)


def test_batched_server_sampled_decoding(model_buf):
    buf = model_buf
    """temperature > 0 routes through SamplingConfig with per-(slot, pos)
    keys: reproducible given the seed, and the greedy megakernel fast
    path is bypassed (VERDICT r3 #9)."""
    from llm_inference_tpu.sampling import SamplingConfig

    reqs = [([2, 7, 8, 9], 8), ([2, 12, 9], 8)]
    cfg = SamplingConfig(temperature=0.8, top_k=40)
    srv1 = BatchedServer(GGUFFile(buf), max_seq=64, max_batch=2,
                         mode="serve", decode_chunk=4, sampling=cfg, seed=7)
    assert not srv1._mega_batch  # stochastic sampling needs the logits
    out1 = srv1.run([(list(p), n) for p, n in reqs])
    srv2 = BatchedServer(GGUFFile(buf), max_seq=64, max_batch=2,
                         mode="serve", decode_chunk=4, sampling=cfg, seed=7)
    out2 = srv2.run([(list(p), n) for p, n in reqs])
    assert out1 == out2  # deterministic given the seed

    greedy = BatchedServer(GGUFFile(buf), max_seq=64, max_batch=2,
                           mode="serve", decode_chunk=4).run(
        [(list(p), n) for p, n in reqs])
    assert out1 != greedy  # the temperature actually bites


def test_batched_server_parity_rejects_sampling(model_buf):
    buf = model_buf
    from llm_inference_tpu.sampling import SamplingConfig

    with pytest.raises(ValueError):
        BatchedServer(GGUFFile(buf), max_seq=64, max_batch=2, mode="parity",
                      sampling=SamplingConfig(temperature=0.5))
