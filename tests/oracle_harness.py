"""Compile-on-demand ctypes bridge to the reference C++ engine.

Builds a shared library from the read-only reference sources plus the thin
C wrapper in tests/oracle/oracle.cpp, and exposes the reference's
dequantizers / GEMVs / activation quantizers / full forward pass to Python.
This is the cross-engine golden oracle for parity tests — the TPU analogue
of the reference's own llama.cpp comparison harness (SURVEY.md §2 C16).

The .so is cached under /tmp keyed by source mtimes; tests that need the
oracle should ``pytest.importorskip``-style skip when compilation isn't
possible (no g++ or no reference checkout).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

REFERENCE_DIR = Path(os.environ.get("LLMI_REFERENCE_DIR", "/root/reference"))
ORACLE_SRC = Path(__file__).parent / "oracle" / "oracle.cpp"
_REF_SOURCES = ["gguf.cpp", "ops.cpp", "model.cpp"]

# ISA build flavors. "avx2" matches the reference's x86 production build
# flags (reference BUILD:45-50) — its SIMD kernels, and therefore the
# activation-quantization contract, are what parity tests exercise.
# "scalar" compiles the reference's OWN scalar fallbacks (ops.cpp #else
# branches) — the reference compiled for a different ISA. Comparing the two
# (tools/oracle_divergence.py) quantifies the float-ordering noise floor
# that NO bit-different engine pair can beat.
_ISA_FLAGS = {
    "avx2": ["-mavx2", "-mfma", "-mf16c"],
    "scalar": ["-mno-avx2", "-mno-fma", "-mno-f16c"],
}

_libs: dict[str, ctypes.CDLL] = {}
_load_errors: dict[str, str] = {}


def _cache_path(isa: str) -> Path:
    h = hashlib.sha256()
    for src in [ORACLE_SRC] + [REFERENCE_DIR / s for s in _REF_SOURCES]:
        h.update(str(src).encode())
        h.update(str(src.stat().st_mtime_ns).encode())
    h.update(isa.encode())
    return Path("/tmp") / f"llmi_oracle_{isa}_{h.hexdigest()[:16]}.so"


def _build(isa: str) -> Path:
    so = _cache_path(isa)
    if so.exists():
        return so
    cmd = [
        "g++", "-shared", "-fPIC", "-O2", "-std=c++17",
        *_ISA_FLAGS[isa],
        str(ORACLE_SRC),
        *[str(REFERENCE_DIR / s) for s in _REF_SOURCES],
        f"-I{REFERENCE_DIR}",
        "-o", str(so),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def get_oracle(isa: str = "avx2") -> ctypes.CDLL:
    """Return the loaded oracle library, raising RuntimeError if unavailable."""
    if isa in _libs:
        return _libs[isa]
    if isa in _load_errors:
        raise RuntimeError(_load_errors[isa])
    if not REFERENCE_DIR.exists():
        _load_errors[isa] = f"reference checkout not found at {REFERENCE_DIR}"
        raise RuntimeError(_load_errors[isa])
    try:
        so = _build(isa)
        lib = ctypes.CDLL(str(so))
    except (subprocess.CalledProcessError, OSError) as e:
        detail = e.stderr if isinstance(e, subprocess.CalledProcessError) else str(e)
        _load_errors[isa] = f"oracle build failed: {detail}"
        raise RuntimeError(_load_errors[isa]) from e

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.oracle_init.argtypes = [ctypes.c_int]
    lib.oracle_gguf_open.restype = ctypes.c_void_p
    lib.oracle_gguf_open.argtypes = [u8p, ctypes.c_size_t]
    lib.oracle_gguf_close.argtypes = [ctypes.c_void_p]
    lib.oracle_dequant.restype = ctypes.c_long
    lib.oracle_dequant.argtypes = [ctypes.c_void_p, ctypes.c_char_p, f32p]
    lib.oracle_matvec.restype = ctypes.c_long
    lib.oracle_matvec.argtypes = [ctypes.c_void_p, ctypes.c_char_p, f32p, ctypes.c_long, f32p]
    lib.oracle_quantize_q8_0.argtypes = [f32p, ctypes.c_long,
                                         ctypes.POINTER(ctypes.c_uint16),
                                         ctypes.POINTER(ctypes.c_int8)]
    lib.oracle_quantize_q8_k.argtypes = [f32p, ctypes.c_long, f32p,
                                         ctypes.POINTER(ctypes.c_int8),
                                         ctypes.POINTER(ctypes.c_int16)]
    lib.oracle_model_new.restype = ctypes.c_void_p
    lib.oracle_model_new.argtypes = [u8p, ctypes.c_size_t]
    lib.oracle_model_free.argtypes = [ctypes.c_void_p]
    lib.oracle_forward.restype = ctypes.c_long
    lib.oracle_forward.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                                   ctypes.c_int, ctypes.c_int, f32p]
    lib.oracle_tokenize.restype = ctypes.c_long
    lib.oracle_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int), ctypes.c_long]
    lib.oracle_init(1)
    _libs[isa] = lib
    return lib


def oracle_available() -> bool:
    try:
        get_oracle()
        return True
    except RuntimeError:
        return False


class OracleGGUF:
    """Reference-engine view of a GGUF byte buffer."""

    def __init__(self, buf: bytes):
        self._lib = get_oracle()
        self._buf = np.frombuffer(buf, dtype=np.uint8)  # keep alive
        ptr = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        self._handle = self._lib.oracle_gguf_open(ptr, len(buf))
        if not self._handle:
            raise RuntimeError("oracle failed to parse GGUF buffer")

    def dequant(self, name: str, n_elements: int) -> np.ndarray:
        out = np.empty(n_elements, dtype=np.float32)
        n = self._lib.oracle_dequant(self._handle, name.encode(),
                                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n < 0:
            raise RuntimeError(f"oracle dequant failed for {name}")
        return out[:n]

    def matvec(self, name: str, x: np.ndarray, n_rows: int) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        out = np.empty(n_rows, dtype=np.float32)
        n = self._lib.oracle_matvec(self._handle, name.encode(),
                                    x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                    len(x),
                                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n < 0:
            raise RuntimeError(f"oracle matvec failed for {name}")
        return out[:n]

    def close(self) -> None:
        if self._handle:
            self._lib.oracle_gguf_close(self._handle)
            self._handle = None


class OracleModel:
    """Reference-engine Model over a GGUF byte buffer (forward + tokenize)."""

    def __init__(self, buf: bytes, isa: str = "avx2"):
        self._lib = get_oracle(isa)
        self._buf = np.frombuffer(buf, dtype=np.uint8)
        ptr = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        self._handle = self._lib.oracle_model_new(ptr, len(buf))
        if not self._handle:
            raise RuntimeError("oracle failed to construct Model")

    def forward(self, tokens: list[int], pos: int, vocab_size: int) -> np.ndarray:
        toks = (ctypes.c_int * len(tokens))(*tokens)
        out = np.empty(vocab_size, dtype=np.float32)
        n = self._lib.oracle_forward(self._handle, toks, len(tokens), pos,
                                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n < 0:
            raise RuntimeError("oracle forward failed")
        return out[:n]

    def tokenize(self, prompt: str, apply_chat_template: bool) -> list[int]:
        out = (ctypes.c_int * 4096)()
        n = self._lib.oracle_tokenize(self._handle, prompt.encode(),
                                      1 if apply_chat_template else 0, out, 4096)
        if n < 0:
            raise RuntimeError("oracle tokenize failed")
        return list(out[:n])

    def close(self) -> None:
        if self._handle:
            self._lib.oracle_model_free(self._handle)
            self._handle = None


def oracle_quantize_q8_0(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lib = get_oracle()
    x = np.ascontiguousarray(x, dtype=np.float32)
    nb = len(x) // 32
    d = np.empty(nb, dtype=np.uint16)
    q = np.empty(nb * 32, dtype=np.int8)
    lib.oracle_quantize_q8_0(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
                             d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                             q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return d.view(np.float16), q.reshape(nb, 32)


def oracle_quantize_q8_k(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = get_oracle()
    x = np.ascontiguousarray(x, dtype=np.float32)
    nb = len(x) // 256
    d = np.empty(nb, dtype=np.float32)
    q = np.empty(nb * 256, dtype=np.int8)
    bsums = np.empty(nb * 16, dtype=np.int16)
    lib.oracle_quantize_q8_k(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
                             d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                             bsums.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return d, q.reshape(nb, 256), bsums.reshape(nb, 16)
