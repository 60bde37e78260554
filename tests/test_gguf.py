"""GGUF reader/writer tests.

Coverage model follows the reference's gguf_test.cpp: metadata typing,
tensor directory, 32-byte data alignment, file-path load, plus cross-engine
parsing of writer output through the compiled reference oracle.
"""

import numpy as np
import pytest

from llm_inference_tpu.gguf import GGMLType, GGUFFile, GGUFValueType, GGUFWriter
from llm_inference_tpu.quant import layouts

from oracle_harness import oracle_available


def _simple_buffer() -> bytes:
    w = GGUFWriter()
    w.add_metadata("general.architecture", "gemma3")
    w.add_metadata("gemma3.block_count", 2)
    w.add_metadata("gemma3.rope.freq_base", 1000000.0)
    w.add_metadata("tokenizer.ggml.add_bos_token", True)
    w.add_metadata("tokenizer.ggml.tokens", ["<pad>", "<bos>", "hello"])
    w.add_metadata("some.int16", -3, GGUFValueType.INT16)
    w.add_metadata("some.float64", 2.5, GGUFValueType.FLOAT64)
    w.add_tensor("a.weight", np.arange(12, dtype=np.float32).reshape(3, 4), GGMLType.F32)
    w.add_tensor("b.weight", np.ones((2, 32), dtype=np.float32), GGMLType.F16)
    return w.build()


def test_roundtrip_metadata():
    f = GGUFFile(_simple_buffer())
    assert f.header.version == 3
    assert f.header.tensor_count == 2
    assert f.metadata["general.architecture"] == "gemma3"
    assert f.metadata["gemma3.block_count"] == 2
    assert f.metadata["gemma3.rope.freq_base"] == pytest.approx(1000000.0)
    assert f.metadata["tokenizer.ggml.add_bos_token"] is True
    assert f.metadata["tokenizer.ggml.tokens"] == ["<pad>", "<bos>", "hello"]
    assert f.metadata["some.int16"] == -3
    assert f.metadata["some.float64"] == 2.5


def test_roundtrip_tensors():
    f = GGUFFile(_simple_buffer())
    a = f.tensors["a.weight"]
    assert a.shape == (4, 3)  # GGUF order: cols first
    assert a.tensor_type == GGMLType.F32
    np.testing.assert_array_equal(
        f.tensor_f32(a), np.arange(12, dtype=np.float32).reshape(3, 4)
    )
    b = f.tensors["b.weight"]
    assert b.tensor_type == GGMLType.F16
    vals = layouts.dequantize(f.tensor_bytes(b), GGMLType.F16, 2, 32)
    np.testing.assert_array_equal(vals, np.ones((2, 32), dtype=np.float32))


def test_data_alignment():
    f = GGUFFile(_simple_buffer())
    assert f.data_section_start % 32 == 0


def test_file_path_load(tmp_path):
    path = tmp_path / "test.gguf"
    path.write_bytes(_simple_buffer())
    with GGUFFile(str(path)) as f:
        assert f.metadata["general.architecture"] == "gemma3"
        a = f.tensors["a.weight"]
        np.testing.assert_array_equal(
            f.tensor_f32(a), np.arange(12, dtype=np.float32).reshape(3, 4)
        )


def test_invalid_magic():
    with pytest.raises(ValueError, match="magic"):
        GGUFFile(b"\x00" * 64)


def test_row_views(rng):
    w = GGUFWriter()
    data = rng.standard_normal((4, 64)).astype(np.float32)
    w.add_tensor("t", data, GGMLType.Q8_0)
    f = GGUFFile(w.build())
    info = f.tensors["t"]
    full = f.tensor_bytes(info)
    row1 = f.tensor_row_bytes(info, 1)
    np.testing.assert_array_equal(row1, full[68:136])  # 2 blocks/row * 34B


@pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable")
def test_writer_output_parses_in_reference_engine(rng):
    """The reference C++ parser must read our writer's containers identically."""
    from oracle_harness import OracleGGUF

    w = GGUFWriter()
    w.add_metadata("general.architecture", "gemma3")
    data = rng.standard_normal((8, 64)).astype(np.float32)
    w.add_tensor("x.weight", data, GGMLType.F16)
    buf = w.build()

    ours = GGUFFile(buf)
    ref = OracleGGUF(buf)
    ref_vals = ref.dequant("x.weight", 8 * 64).reshape(8, 64)
    our_vals = layouts.dequantize(
        ours.tensor_bytes(ours.tensors["x.weight"]), GGMLType.F16, 8, 64
    )
    np.testing.assert_array_equal(ref_vals, our_vals)
    ref.close()
