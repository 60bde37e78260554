"""llm_inference_tpu — a TPU-native GGUF quantized-inference framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
reference CPU engine ``corywalker/llm_inference`` (see SURVEY.md): GGUF
block-quantized checkpoint loading straight into device HBM, fused
dequant+matmul kernels, grouped-query attention with a preallocated KV
cache, Gemma-3 / gemma4 forward semantics, greedy decoding, and
tensor-parallel scaling over a ``jax.sharding.Mesh``.

Layering (bottom-up), mirroring the reference's 5-layer DAG
(reference BUILD:27-106) but TPU-shaped:

  gguf/       container parsing + fixture writer   (ref gguf.{h,cpp})
  quant/      block codecs + activation quant      (ref ops.{h,cpp} C3/C4)
  ops/        norms, rope, matmul, attention       (ref ops.cpp C5/C7)
  ops/pallas/ fused dequant+GEMV / flash kernels
  models/     hparams, weight mapping, forward     (ref model.{h,cpp})
  runtime/    KV cache, sampler, generate loop, CLI (ref main.cpp)
  parallel/   mesh + sharding layouts
  tokenizer/  greedy longest-match SentencePiece-style tokenizer
  tracing/    named-activation dumps for the parity harness
"""

__version__ = "0.1.0"
