"""ctypes bridge to the C++ native data-path library (native/llmi_native.cpp).

The reference's loader/codec layer is native C++ (reference gguf.cpp,
ops.cpp); this framework keeps its device compute in XLA/Pallas but runs
the host-side byte work — block repacking, direct-to-bf16 dequantization,
fixture encoding — through a small C++ library where numpy overhead would
otherwise dominate model load time.

Compiled on demand with g++ (cached under /tmp keyed by source mtime, the
same strategy as the test oracle); every entry point has a numpy fallback
so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "llmi_native.cpp"

_lib: Optional[ctypes.CDLL] = None
_tried = False

_REPACK_SYMS = {
    2: "repack_q4_0",  # GGMLType values
    6: "repack_q5_0",
    8: "repack_q8_0",
    12: "repack_q4_k",
    14: "repack_q6_k",
}


def _build() -> Path:
    h = hashlib.sha256()
    h.update(str(_SRC).encode())
    h.update(str(_SRC.stat().st_mtime_ns).encode())
    so = Path("/tmp") / f"llmi_native_{h.hexdigest()[:16]}.so"
    if not so.exists():
        subprocess.run(
            ["g++", "-shared", "-fPIC", "-O3", "-march=native", "-std=c++17",
             str(_SRC), "-o", str(so)],
            check=True, capture_output=True, text=True,
        )
    return so


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable (no g++ / no src)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LLMI_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(str(_build()))
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i64 = ctypes.c_int64

    for sym in ("repack_q4_0", "repack_q8_0", "repack_q5_0", "repack_q6_k"):
        getattr(lib, sym).argtypes = [u8p, i64, i64, i8p, f32p]
    lib.repack_q4_k.argtypes = [u8p, i64, i64, i8p, f32p, f32p]
    lib.dequant_bf16.restype = ctypes.c_int
    lib.dequant_bf16.argtypes = [u8p, ctypes.c_int, i64, i64, u16p]
    lib.encode_q4_0.argtypes = [f32p, i64, i64, u8p]
    lib.encode_f16.argtypes = [f32p, i64, u16p]
    lib.transpose_i8.argtypes = [i8p, i64, i64, i8p]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def repack(raw: np.ndarray, fmt: int, rows: int, cols: int, group_size: int):
    """Native planar repack -> (q int8 [rows, G, S], scale f32 [rows, G],
    offset f32 [rows, G] | None), or None when the library is unavailable."""
    lib = get_lib()
    sym = _REPACK_SYMS.get(int(fmt))
    if lib is None or sym is None:
        return None
    groups = cols // group_size
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    q = np.empty((rows, groups, group_size), dtype=np.int8)
    scale = np.empty((rows, groups), dtype=np.float32)
    if int(fmt) == 12:  # Q4_K carries a min offset
        offset = np.empty((rows, groups), dtype=np.float32)
        lib.repack_q4_k(_ptr(raw, ctypes.c_uint8), rows, cols,
                        _ptr(q, ctypes.c_int8), _ptr(scale, ctypes.c_float),
                        _ptr(offset, ctypes.c_float))
        return q, scale, offset
    getattr(lib, sym)(_ptr(raw, ctypes.c_uint8), rows, cols,
                      _ptr(q, ctypes.c_int8), _ptr(scale, ctypes.c_float))
    return q, scale, None


def dequant_bf16(raw: np.ndarray, fmt: int, rows: int, cols: int) -> Optional[np.ndarray]:
    """Native GGUF-bytes -> bf16 (as uint16 words) [rows, cols], or None."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty((rows, cols), dtype=np.uint16)
    rc = lib.dequant_bf16(_ptr(raw, ctypes.c_uint8), int(fmt), rows, cols,
                          _ptr(out, ctypes.c_uint16))
    return out if rc == 0 else None


def encode_q4_0(w: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rows, cols = w.shape
    w = np.ascontiguousarray(w, dtype=np.float32)
    out = np.empty(rows * (cols // 32) * 18, dtype=np.uint8)
    lib.encode_q4_0(_ptr(w, ctypes.c_float), rows, cols, _ptr(out, ctypes.c_uint8))
    return out


def encode_f16(w: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(w, dtype=np.float32).reshape(-1)
    out = np.empty(flat.size, dtype=np.uint16)
    lib.encode_f16(_ptr(flat, ctypes.c_float), flat.size, _ptr(out, ctypes.c_uint16))
    return out.view(np.uint8)


def transpose_i8(a: np.ndarray) -> Optional[np.ndarray]:
    """Cache-blocked native transpose of a contiguous int8 [R, C] matrix
    -> contiguous [C, R]; None when the library is unavailable."""
    lib = get_lib()
    if lib is None or a.dtype != np.int8 or a.ndim != 2:
        return None
    a = np.ascontiguousarray(a)
    rows, cols = a.shape
    out = np.empty((cols, rows), dtype=np.int8)
    lib.transpose_i8(_ptr(a, ctypes.c_int8), rows, cols,
                     _ptr(out, ctypes.c_int8))
    return out
