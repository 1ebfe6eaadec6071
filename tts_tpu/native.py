"""ctypes bridge to the native data-path library (native/ttsnative.cpp).

Builds the shared library on first use (g++ via the Makefile) and caches it;
every entry point has a numpy fallback so the framework works without a
toolchain. TPU-era counterpart of the reference's native loader/quantizer
plumbing (ggml-patches/llama-mmap.cpp, quantize_impl.cpp:104-163).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_NATIVE_DIR, "libttsnative.so")
        src = os.path.join(_NATIVE_DIR, "ttsnative.cpp")
        try:
            if (not os.path.exists(so) or
                    os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            if lib.tts_native_abi_version() != 1:
                return None
            i64, i32 = ctypes.c_int64, ctypes.c_int
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i8p = ctypes.POINTER(ctypes.c_int8)
            f32p = ctypes.POINTER(ctypes.c_float)
            for name in ("tts_unpack_q4_transposed", "tts_unpack_q5_transposed",
                         "tts_unpack_q8_transposed"):
                fn = getattr(lib, name)
                fn.argtypes = [u8p, i64, i64, i8p, f32p, i32]
                fn.restype = None
            for name in ("tts_quantize_q4_0", "tts_quantize_q5_0",
                         "tts_quantize_q8_0"):
                fn = getattr(lib, name)
                fn.argtypes = [f32p, i64, i64, u8p, i32]
                fn.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _nthreads() -> int:
    return max(1, (os.cpu_count() or 1) - 1)


def unpack_planar_transposed(raw: np.ndarray, qtype: int, shape):
    """Raw ggml blocks -> (codes_t (K, N) int8, scales_t (K//32, N) f32)
    directly in the device layout. Falls back to the numpy path."""
    from .gguf import quants
    lib = _load()
    rows = int(np.prod(shape[:-1]))
    cols = int(shape[-1])
    if lib is None:
        codes, scales = quants.unpack_planar(raw, qtype, (rows, cols))
        return (np.ascontiguousarray(codes.astype(np.int8).T),
                np.ascontiguousarray(scales.astype(np.float32).T))
    codes_t = np.empty((cols, rows), np.int8)
    scales_t = np.empty((cols // 32, rows), np.float32)
    buf = np.ascontiguousarray(np.frombuffer(bytes(raw), dtype=np.uint8))
    fn = {quants.GGML_TYPE_Q4_0: lib.tts_unpack_q4_transposed,
          quants.GGML_TYPE_Q5_0: lib.tts_unpack_q5_transposed,
          quants.GGML_TYPE_Q8_0: lib.tts_unpack_q8_transposed}[qtype]
    fn(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       rows, cols,
       codes_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
       scales_t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       _nthreads())
    return codes_t, scales_t


def quantize(x: np.ndarray, qtype: int) -> np.ndarray:
    """Threaded quantization; falls back to the numpy reference math."""
    from .gguf import quants
    lib = _load()
    x2 = np.ascontiguousarray(x, dtype=np.float32)
    rows = int(np.prod(x2.shape[:-1])) if x2.ndim > 1 else 1
    cols = int(x2.shape[-1])
    if lib is None or cols % 32 or \
            qtype not in (quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q5_0,
                          quants.GGML_TYPE_Q8_0):
        return quants.quantize(x2, qtype)
    bb = {quants.GGML_TYPE_Q4_0: 18, quants.GGML_TYPE_Q5_0: 22,
          quants.GGML_TYPE_Q8_0: 34}[qtype]
    out = np.empty(rows * (cols // 32) * bb, np.uint8)
    fn = {quants.GGML_TYPE_Q4_0: lib.tts_quantize_q4_0,
          quants.GGML_TYPE_Q5_0: lib.tts_quantize_q5_0,
          quants.GGML_TYPE_Q8_0: lib.tts_quantize_q8_0}[qtype]
    fn(x2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols,
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _nthreads())
    return out
