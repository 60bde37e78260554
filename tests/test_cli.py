"""CLI end-to-end: flags, streaming output, tok/s line, verbose top-10,
activation-trace dump — the reference main.cpp's observable behavior."""

import numpy as np
import pytest

from llm_inference_tpu.cli import build_parser, main

from fixtures import build_gemma3_gguf


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("m") / "tiny.gguf"
    p.write_bytes(build_gemma3_gguf(n_layers=2))
    return str(p)


def test_parser_flags():
    args = build_parser().parse_args(["-m", "x.gguf", "-p", "hi", "-n", "5", "-v", "--no-cnv"])
    assert args.model == "x.gguf"
    assert args.predict == 5
    assert args.verbose and args.no_cnv


def test_cli_generates(model_path, capsys):
    rc = main(["-m", model_path, "-p", "ab", "-n", "4", "--no-cnv", "--max-seq", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Prompt: ab" in out
    assert "tok/s decode" in out


def test_cli_verbose_top10(model_path, capsys):
    rc = main(["-m", model_path, "-p", "ab", "-n", "2", "--no-cnv", "-v", "--max-seq", "64"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "Top 10 most likely tokens:" in err
    assert "arch=gemma3" in err
    # container dump parity with the reference -v (main.cpp:73-84,
    # gguf.cpp:306-327): header, tensor directory, metadata
    assert "GGUF File Information:" in err
    assert "Tensor count:" in err
    assert "token_embd.weight: shape = [" in err
    assert "general.architecture = gemma3" in err


def test_cli_trace(model_path, capsys, tmp_path):
    trace_path = str(tmp_path / "trace.npz")
    rc = main(["-m", model_path, "-p", "ab", "-n", "2", "--no-cnv",
               "--trace", trace_path, "--max-seq", "64"])
    assert rc == 0
    data = np.load(trace_path)
    names = [k.split("|", 1)[1] for k in data.files]
    assert "imp_embed" in names
    assert any(n.startswith("kqv_out-") for n in names)
