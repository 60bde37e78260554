"""Synthetic GGUF model fixtures — the Python port of the reference's
``create_test_gguf`` (reference model_test.cpp:125-391): a complete, tiny,
seeded gemma3 checkpoint built in memory, parseable by BOTH engines. This
is what makes hermetic cross-engine forward-pass parity tests possible."""

from __future__ import annotations

import numpy as np

from llm_inference_tpu.gguf import GGMLType, GGUFWriter

# A vocab whose entries exercise the greedy longest-match tokenizer:
# multi-char pieces, the SentencePiece space, and specials.
DEFAULT_VOCAB = [
    "<pad>", "<eos>", "<bos>", "<unk>", "<end_of_turn>", "<start_of_turn>",
    "▁", "a", "b", "c", "ab", "abc", "user", "model", "\n",
    "▁fact", "fact", "f", "t", "u", "s", "e", "r", "m", "o", "d", "l",
]


def build_gemma3_gguf(
    *,
    n_layers: int = 1,
    n_embd: int = 32,
    n_ff: int = 64,
    n_head: int = 2,
    n_head_kv: int = 1,
    vocab: list[str] | None = None,
    weight_fmt: GGMLType = GGMLType.Q4_0,
    embd_fmt: GGMLType = GGMLType.F16,
    seed: int = 12345,
    rope_freq_base: float = 10000.0,
    with_post_norms: bool = False,
    head_dim: int | None = None,
    weight_std: float = 0.1,
    sliding_window: int = 0,
    swa_pattern: list[bool] | None = None,
) -> bytes:
    """Build a complete little gemma3 GGUF buffer with seeded random weights.

    ``head_dim`` other than n_embd/n_head emits gemma3.attention.key_length
    metadata (the real Gemma-3-1B uses head_dim 256 with n_embd 1152)."""
    vocab = vocab if vocab is not None else DEFAULT_VOCAB
    explicit_head_dim = head_dim is not None and head_dim != n_embd // n_head
    head_dim = head_dim if head_dim is not None else n_embd // n_head
    rng = np.random.default_rng(seed)

    def rand(*shape):
        # small weights keep activations tame through quantization;
        # weight_std ~2e-2 makes deep stacks contractive (trained-model-
        # like error propagation) — see tools/greedy_parity.py
        return (rng.standard_normal(shape) * weight_std).astype(np.float32)

    w = GGUFWriter()
    w.add_metadata("general.architecture", "gemma3")
    w.add_metadata("gemma3.block_count", n_layers)
    w.add_metadata("gemma3.embedding_length", n_embd)
    w.add_metadata("gemma3.feed_forward_length", n_ff)
    w.add_metadata("gemma3.attention.head_count", n_head)
    w.add_metadata("gemma3.attention.head_count_kv", n_head_kv)
    w.add_metadata("gemma3.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata("gemma3.rope.freq_base", rope_freq_base)
    if sliding_window:
        w.add_metadata("gemma3.attention.sliding_window", sliding_window)
    if swa_pattern is not None:
        w.add_metadata("gemma3.attention.sliding_window_pattern", swa_pattern)
    if explicit_head_dim:
        w.add_metadata("gemma3.attention.key_length", head_dim)
        w.add_metadata("gemma3.attention.value_length", head_dim)
    w.add_metadata("tokenizer.ggml.tokens", vocab)
    w.add_metadata("tokenizer.ggml.bos_token_id", 2)
    w.add_metadata("tokenizer.ggml.eos_token_id", 1)
    w.add_metadata("tokenizer.ggml.unk_token_id", 3)

    # numpy [rows, cols]; GGUF shape (cols, rows)
    w.add_tensor("token_embd.weight", rand(len(vocab), n_embd), embd_fmt)
    w.add_tensor("output_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)

    for i in range(n_layers):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
        w.add_tensor(p + "attn_q_norm.weight", rand(head_dim) + 1.0, GGMLType.F32)
        w.add_tensor(p + "attn_k_norm.weight", rand(head_dim) + 1.0, GGMLType.F32)
        w.add_tensor(p + "attn_q.weight", rand(n_head * head_dim, n_embd), weight_fmt)
        w.add_tensor(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd), weight_fmt)
        w.add_tensor(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd), weight_fmt)
        w.add_tensor(p + "attn_output.weight", rand(n_embd, n_head * head_dim), weight_fmt)
        w.add_tensor(p + "ffn_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", rand(n_ff, n_embd), weight_fmt)
        w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd), weight_fmt)
        w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff), weight_fmt)
        if with_post_norms:
            w.add_tensor(p + "post_attention_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
            w.add_tensor(p + "post_ffw_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)

    return w.build()


GEMMA4_VOCAB = DEFAULT_VOCAB + ["<|turn>", "<turn|>", "<|channel>thought", "<channel|>"]


def build_gemma4_gguf(
    *,
    n_layers: int = 4,
    n_embd: int = 32,
    n_ff: int = 64,
    n_head: int = 2,
    n_head_kv: int = 1,
    n_embd_per_layer: int = 32,  # Q4_0 per_layer_proj needs cols % 32 == 0
    shared_kv_layers: int = 1,
    vocab: list[str] | None = None,
    weight_fmt: GGMLType = GGMLType.Q4_0,
    seed: int = 777,
) -> bytes:
    """Complete little gemma4 checkpoint: per-layer-input (AltUp) machinery,
    shared trailing KV layers, out_scale, unweighted V-norm — the reference's
    gemma4 path (reference model.cpp:568-704, 774-835, 927-977)."""
    vocab = vocab if vocab is not None else GEMMA4_VOCAB
    head_dim = n_embd // n_head
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    w = GGUFWriter()
    w.add_metadata("general.architecture", "gemma4")
    w.add_metadata("gemma4.block_count", n_layers)
    w.add_metadata("gemma4.embedding_length", n_embd)
    w.add_metadata("gemma4.feed_forward_length", n_ff)
    w.add_metadata("gemma4.attention.head_count", n_head)
    w.add_metadata("gemma4.attention.head_count_kv", n_head_kv)
    w.add_metadata("gemma4.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata("gemma4.rope.freq_base", 1000000.0)
    w.add_metadata("gemma4.embedding_length_per_layer", n_embd_per_layer)
    w.add_metadata("gemma4.attention.shared_kv_layers", shared_kv_layers)
    w.add_metadata("tokenizer.ggml.tokens", vocab)
    w.add_metadata("tokenizer.ggml.bos_token_id", 2)
    w.add_metadata("tokenizer.ggml.eos_token_id", 1)
    w.add_metadata("tokenizer.ggml.unk_token_id", 3)
    w.add_metadata("tokenizer.ggml.add_bos_token", True)

    w.add_tensor("token_embd.weight", rand(len(vocab), n_embd), GGMLType.F16)
    w.add_tensor("output_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
    # per-layer embeddings: row per token, n_layers * n_embd_per_layer wide
    w.add_tensor(
        "token_embd_per_layer.weight",
        rand(len(vocab), n_layers * n_embd_per_layer),
        GGMLType.F16,
    )
    w.add_tensor(
        "per_layer_model_proj.weight",
        rand(n_layers * n_embd_per_layer, n_embd),
        weight_fmt,
    )
    w.add_tensor("per_layer_proj_norm.weight", rand(n_embd_per_layer) + 1.0, GGMLType.F32)

    for i in range(n_layers):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
        w.add_tensor(p + "attn_q_norm.weight", rand(head_dim) + 1.0, GGMLType.F32)
        w.add_tensor(p + "attn_k_norm.weight", rand(head_dim) + 1.0, GGMLType.F32)
        w.add_tensor(p + "attn_q.weight", rand(n_head * head_dim, n_embd), weight_fmt)
        has_kv = i < n_layers - shared_kv_layers
        if has_kv:
            w.add_tensor(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd), weight_fmt)
            w.add_tensor(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd), weight_fmt)
        w.add_tensor(p + "attn_output.weight", rand(n_embd, n_head * head_dim), weight_fmt)
        w.add_tensor(p + "ffn_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", rand(n_ff, n_embd), weight_fmt)
        w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd), weight_fmt)
        w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff), weight_fmt)
        w.add_tensor(p + "post_attention_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
        w.add_tensor(p + "post_ffw_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
        w.add_tensor(p + "per_layer_inp_gate.weight", rand(n_embd_per_layer, n_embd), weight_fmt)
        w.add_tensor(p + "per_layer_proj.weight", rand(n_embd, n_embd_per_layer), weight_fmt)
        w.add_tensor(p + "per_layer_post_norm.weight", rand(n_embd) + 1.0, GGMLType.F32)
        w.add_tensor(p + "out_scale.weight", np.asarray([0.9], dtype=np.float32), GGMLType.F32)

    return w.build()
