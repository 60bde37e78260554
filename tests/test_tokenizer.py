"""Tokenizer parity: greedy longest-match + chat templates, token-for-token
against the reference engine's tokenize (reference model.cpp:1091-1191)."""

import pytest

from llm_inference_tpu.gguf import GGUFFile
from llm_inference_tpu.tokenizer import Tokenizer

from fixtures import build_gemma3_gguf, DEFAULT_VOCAB
from oracle_harness import oracle_available


def _tokenizer(buf) -> Tokenizer:
    g = GGUFFile(buf)
    return Tokenizer(g.metadata, g.metadata["general.architecture"])


def test_longest_match_prefers_longer_tokens():
    tok = _tokenizer(build_gemma3_gguf())
    # "abc" exists as one token; must not split into "ab"+"c" or "a"+"b"+"c"
    ids = tok.encode("abc", apply_chat_template=False).ids
    # template-less gemma3 adds BOS then " " -> "▁"
    assert ids[0] == tok.bos_id
    assert tok.id_to_token[ids[1]] == "▁"
    assert tok.id_to_token[ids[2]] == "abc"


def test_unknown_chars_become_unk():
    tok = _tokenizer(build_gemma3_gguf())
    ids = tok.encode("aZ", apply_chat_template=False).ids
    assert ids[-1] == tok.unk_id  # 'Z' not in vocab
    assert tok.id_to_token[ids[-2]] == "a"


def test_unknown_multibyte_chars_emit_unk_per_byte():
    """The reference walks UTF-8 bytes (model.cpp:1148-1178): an
    out-of-vocab 3-byte character like '€' yields THREE <unk> tokens."""
    tok = _tokenizer(build_gemma3_gguf())
    ids = tok.encode("a€", apply_chat_template=False).ids
    assert tok.id_to_token[ids[-4]] == "a"
    assert ids[-3:] == [tok.unk_id] * 3


def test_chat_template_gemma3():
    tok = _tokenizer(build_gemma3_gguf())
    res = tok.encode("ab", apply_chat_template=True)
    assert not res.prefilled_thinking
    toks = [tok.id_to_token[i] for i in res.ids]
    assert toks[0] == "<bos>" if "<bos>" in tok.token_to_id else res.ids[0] == tok.bos_id
    assert "<start_of_turn>" in toks
    assert "<end_of_turn>" in toks


def test_decode_restores_spaces():
    tok = _tokenizer(build_gemma3_gguf())
    assert tok.piece(tok.token_to_id["▁fact"]) == " fact"


def test_stop_tokens():
    tok = _tokenizer(build_gemma3_gguf())
    assert tok.is_stop(tok.eos_id)
    assert tok.is_stop(tok.end_of_turn_id)
    assert not tok.is_stop(tok.token_to_id["a"])


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
@pytest.mark.parametrize("chat", [False, True])
@pytest.mark.parametrize(
    "prompt",
    ["abc", "a b c", "user fact", "abab", "fact fact fact", "zq!?", ""],
)
def test_tokenize_parity_vs_reference(prompt, chat):
    from oracle_harness import OracleModel

    buf = build_gemma3_gguf()
    ref = OracleModel(buf)
    golden = ref.tokenize(prompt, chat)
    ref.close()
    tok = _tokenizer(buf)
    assert tok.encode(prompt, chat).ids == golden, f"prompt={prompt!r} chat={chat}"
