#!/usr/bin/env python
"""Decode-throughput benchmark on a Gemma-3-1B-shaped Q4_0 checkpoint.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tok/s", "vs_baseline": N}

The model is a synthetic (seeded-random) checkpoint with the real
Gemma-3-1B geometry — 26 layers, d_model 1152, ffn 6912, 4 heads /
1 KV head, head_dim 256, vocab 262144, Q4_0 layer weights + F16 tied
embeddings — so the bytes-moved-per-token matches the real model the
reference's README benchmarks (31.53 tok/s on CPU, reference README.md:85).
The checkpoint is cached at /tmp so repeat runs skip generation.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

BASELINE_TOK_S = 31.53  # reference README.md:85 (gemma-3-1b-it Q4_0, greedy)

# Gemma-3-1B geometry (gguf metadata of the real checkpoint)
GEOM_1B = dict(n_layers=26, n_embd=1152, n_ff=6912, n_head=4, n_head_kv=1,
               head_dim=256)
GEOM = GEOM_1B
# Gemma-3-4B geometry — the BASELINE config-2 Q4_K_M-class model
GEOM_4B = dict(n_layers=34, n_embd=2560, n_ff=10240, n_head=8, n_head_kv=4,
               head_dim=256)
# gemma4 (per-layer-input / shared-KV, reference model.cpp:568-704)
# geometry sized so the whole-layer rowq8 megakernel's double buffer
# fits VMEM (3*D*F dominates; F=4096 keeps a layer ~37 MB int8)
GEOM_G4 = dict(n_layers=24, n_embd=2048, n_ff=4096, n_head=8, n_head_kv=2,
               n_embd_per_layer=256, shared_kv_layers=4)
VOCAB_SIZE = 262144

# LLMI_BENCH_GEOM: 1b (default) | 4b | g4 (gemma4 arch).  LLMI_BENCH_FMT:
# q4_0 (default) | q8_0 | q4_k — the checkpoint's weight quantization
# (BASELINE config 2).
GEOM_NAME = os.environ.get("LLMI_BENCH_GEOM", "1b")
FMT = os.environ.get("LLMI_BENCH_FMT", "q4_0")
if GEOM_NAME == "4b":
    GEOM = GEOM_4B
elif GEOM_NAME == "g4":
    GEOM = GEOM_G4
ARCH_NAME = "gemma4" if GEOM_NAME == "g4" else "gemma3"

CACHE = Path(os.environ.get(
    "LLMI_BENCH_GGUF", f"/tmp/llmi_bench_gemma3_{GEOM_NAME}_{FMT}.gguf"))

PREFILL_LEN = int(os.environ.get("LLMI_BENCH_PREFILL", "32"))
DECODE_STEPS = int(os.environ.get("LLMI_BENCH_STEPS", "256"))
WARMUP_STEPS = 8
MAX_SEQ = int(os.environ.get("LLMI_BENCH_MAX_SEQ", "1024"))
# one on-device scan per dispatch; big chunks amortize the host round-trip
# (through the axon tunnel a dispatch costs ~35 ms)
DECODE_CHUNK = int(os.environ.get("LLMI_BENCH_CHUNK", "256"))


def build_checkpoint() -> None:
    from fixtures import build_gemma3_gguf, build_gemma4_gguf

    from llm_inference_tpu.gguf.constants import GGMLType

    fmt = {"q4_0": GGMLType.Q4_0, "q8_0": GGMLType.Q8_0,
           "q4_k": GGMLType.Q4_K}[FMT]
    vocab = [f"t{i}" for i in range(VOCAB_SIZE)]
    vocab[1] = "<eos>"
    vocab[2] = "<bos>"
    vocab[3] = "<unk>"
    builder = build_gemma4_gguf if GEOM_NAME == "g4" else build_gemma3_gguf
    buf = builder(vocab=vocab, seed=20260816, weight_fmt=fmt, **GEOM)
    tmp = CACHE.with_suffix(".tmp")
    tmp.write_bytes(buf)
    tmp.rename(CACHE)


# Same geometry with weight std 2e-2: contractive like a trained model, so
# greedy streams stay pinned for 100+ tokens (the std-0.1 bench checkpoint
# amplifies irreducible ~1e-7 float-ordering noise ~3x/layer — no pair of
# bit-different engines holds a long stream on it; see PARITY_1B.md).
TAME_CACHE = Path(
    os.environ.get("LLMI_TAME_GGUF", "/tmp/llmi_parity_gemma3_1b_tame_q4_0.gguf")
)


def build_tame_checkpoint() -> Path:
    if not TAME_CACHE.exists():
        from fixtures import build_gemma3_gguf

        vocab = [f"t{i}" for i in range(VOCAB_SIZE)]
        vocab[1] = "<eos>"
        vocab[2] = "<bos>"
        vocab[3] = "<unk>"
        # always the 1B Q4_0 geometry — the at-scale parity target
        # (tests/test_parity_at_scale.py, PARITY_1B.md), independent of
        # the LLMI_BENCH_GEOM / LLMI_BENCH_FMT bench knobs
        buf = build_gemma3_gguf(vocab=vocab, seed=20260816, weight_std=0.02,
                                **GEOM_1B)
        tmp = TAME_CACHE.with_suffix(".tmp")
        tmp.write_bytes(buf)
        tmp.rename(TAME_CACHE)
    return TAME_CACHE


def _device_reachable(timeout_s: int = 240) -> bool:
    """Probe jax.devices() in a SUBPROCESS with a timeout: when the TPU
    tunnel is down, backend init hangs forever — the bench must emit an
    honest error line instead of hanging the driver."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def main() -> None:
    if not _device_reachable():
        print("device backend unreachable (TPU tunnel down?)", file=sys.stderr)
        print(json.dumps({
            "metric": "decode_tok_s_gemma3_1b_q4_0",
            "value": 0,
            "unit": "tok/s",
            "vs_baseline": 0,
            "error": "device backend unreachable (jax.devices() timed out)",
        }))
        return

    if not CACHE.exists():
        t0 = time.time()
        build_checkpoint()
        print(f"built synthetic checkpoint in {time.time()-t0:.1f}s -> {CACHE}", file=sys.stderr)

    import jax

    # persistent jit cache: repeat bench runs skip the 1-2 min compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/llmi_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from llm_inference_tpu.engine import Engine, GenerationStats

    profile_dir = os.environ.get("LLMI_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    mode = os.environ.get("LLMI_BENCH_MODE", "serve-q8")
    batch = int(os.environ.get("LLMI_BENCH_BATCH", "0"))
    if batch:
        return bench_batched(mode, batch)
    engine = Engine(str(CACHE), max_seq=MAX_SEQ, mode=mode, decode_chunk=DECODE_CHUNK)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    # random weights can argmax onto <eos>; never stop early in the benchmark
    engine.tokenizer.eos_id = -1
    engine.tokenizer.end_of_turn_id = -1

    rng = np.random.default_rng(0)
    prompt_ids = [2] + rng.integers(10, 10000, size=PREFILL_LEN - 1).tolist()

    # warmup run: compiles prefill + decode-chunk, fills jit caches
    warm = GenerationStats()
    engine.generate_from_ids(prompt_ids, n_predict=WARMUP_STEPS, stats=warm)
    print(
        f"warmup: prefill({PREFILL_LEN}) incl. compile {warm.prefill_seconds:.2f}s, "
        f"decode compile+run {warm.decode_seconds:.2f}s",
        file=sys.stderr,
    )

    stats = GenerationStats()
    engine.generate_from_ids(prompt_ids, n_predict=DECODE_STEPS, stats=stats)
    if profile_dir:
        jax.profiler.stop_trace()

    tok_s = stats.decode_tok_per_s
    print(
        f"prefill {stats.prefill_seconds*1e3:.1f} ms, "
        f"decode {stats.decode_steps} steps in {stats.decode_seconds:.3f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"decode_tok_s_{ARCH_NAME}_{GEOM_NAME}_{FMT}",
                "value": round(tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
                # single-stream TTFT = prefill wall time to the first
                # sampled token (post-warmup, compile excluded)
                "ttft_ms": round(stats.prefill_seconds * 1e3, 2),
                "prefill_tok_s": round(PREFILL_LEN / stats.prefill_seconds, 1)
                if stats.prefill_seconds else None,
            }
        )
    )


def bench_batched(mode: str, batch: int) -> None:
    """Aggregate decode throughput with `batch` concurrent requests
    (continuous batching, serving.py)."""
    import numpy as np

    from llm_inference_tpu.serving import BatchedServer

    # peak-aggregate measurement: admit the whole batch upfront (the
    # default bounded admission trades aggregate for TTFT fairness).
    # LLMI_BENCH_PAGED=<n>: use the shared KV page pool with n pages
    # (serving.py kv_pages) instead of dense per-slot caches.
    kv_pages = int(os.environ.get("LLMI_BENCH_PAGED", "0")) or None
    max_seq = int(os.environ.get("LLMI_BENCH_MAX_SEQ", str(MAX_SEQ)))
    server = BatchedServer(str(CACHE), max_seq=max_seq, max_batch=batch,
                           mode=mode, decode_chunk=32,
                           max_admit_per_step=batch, kv_pages=kv_pages)
    server.tokenizer.eos_id = -1
    server.tokenizer.end_of_turn_id = -1
    rng = np.random.default_rng(0)

    def reqs(n_predict):
        return [
            ([2] + rng.integers(10, 10000, size=PREFILL_LEN - 1).tolist(), n_predict)
            for _ in range(batch)
        ]

    # warmup/compile. Paged runs warm the FULL depth: the nb_cap flash
    # grid retraces once per power-of-2 block bucket, and an 8-token
    # warmup leaves the deeper buckets' compiles inside the timed loop
    # (measured: 793 vs 5295 tok/s on batch32-paged-4k from exactly this)
    server.run(reqs(DECODE_STEPS if kv_pages else 8))
    t0 = time.time()
    handles = [server.submit(ids, n) for ids, n in reqs(DECODE_STEPS)]
    while server.step():
        pass
    dt = time.time() - t0
    total = sum(len(r.out) for r in handles)
    tok_s = total / dt
    import numpy as _np

    ttft_p50 = float(_np.percentile([r.ttft_s for r in handles], 50)) * 1e3
    print(f"batch={batch}: {total} tokens in {dt:.3f}s, p50 TTFT {ttft_p50:.1f} ms",
          file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"decode_tok_s_{ARCH_NAME}_{GEOM_NAME}_{FMT}_batch{batch}"
                + ("_paged" if kv_pages else ""),
                "value": round(tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
                "p50_ttft_ms": round(ttft_p50, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
