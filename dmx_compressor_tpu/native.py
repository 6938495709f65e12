"""ctypes bindings for the native host-side quantization library (csrc/dmxq.cpp).

Compiled on demand with the system C++ toolchain (the analogue of the
reference's JIT cpp_extension build, quant_function.py:6-28).  Degrades
gracefully: ``AVAILABLE`` is False when no compiler is present and callers
fall back to the JAX implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
AVAILABLE = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "dmxq.cpp")
_CACHE = os.path.join(tempfile.gettempdir(), "dmxq_native")


def _build() -> Optional[str]:
    os.makedirs(_CACHE, exist_ok=True)
    so = os.path.join(_CACHE, "libdmxq.so")
    src = os.path.abspath(_SRC)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so
    except (OSError, subprocess.SubprocessError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, AVAILABLE
    if _LIB is not None:
        return _LIB
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.dmxq_fixed_point_nearest.argtypes = [
        f32p, f32p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dmxq_float_nearest.argtypes = [
        f32p, f32p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dmxq_block_nearest.argtypes = [
        f32p, f32p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
    ]
    lib.dmxq_bfp_pack.argtypes = [
        f32p, i8p, i8p, ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int,
    ]
    lib.dmxq_bfp_unpack.argtypes = [
        i8p, i8p, f32p, ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int,
    ]
    _LIB = lib
    AVAILABLE = True
    return lib


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def fixed_point_quantize_nearest(
    x: np.ndarray, wl: int, fl: int, clamp: bool = True, symmetric: bool = False
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    x = np.ascontiguousarray(x, np.float32)
    y = np.empty_like(x)
    lib.dmxq_fixed_point_nearest(
        _f32(x), _f32(y), x.size, wl, fl, int(clamp), int(symmetric)
    )
    return y


def float_quantize_nearest(
    x: np.ndarray, man: int, exp: int, bias: int, flush_subnormal: bool = True
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    x = np.ascontiguousarray(x, np.float32)
    y = np.empty_like(x)
    lib.dmxq_float_nearest(_f32(x), _f32(y), x.size, man, exp, bias, int(flush_subnormal))
    return y


def block_quantize_nearest(blocks: np.ndarray, wl: int) -> np.ndarray:
    """Blocks along the last axis."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    b = np.ascontiguousarray(blocks, np.float32)
    y = np.empty_like(b)
    rows = int(np.prod(b.shape[:-1])) if b.ndim > 1 else 1
    lib.dmxq_block_nearest(_f32(b), _f32(y), rows, b.shape[-1], wl)
    return y


def bfp_pack(
    x: np.ndarray, wl: int = 8, block_size: int = 64
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side packing of [rows, cols] fp32 to (int8 mantissas, int8 block
    exponents) — for checkpoint-conversion pipelines."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    x = np.ascontiguousarray(x, np.float32)
    assert x.ndim == 2 and x.shape[1] % block_size == 0
    man = np.empty(x.shape, np.int8)
    exp = np.empty((x.shape[0], x.shape[1] // block_size), np.int8)
    lib.dmxq_bfp_pack(_f32(x), _i8(man), _i8(exp), x.shape[0], x.shape[1], block_size, wl)
    return man, exp


def bfp_unpack(man: np.ndarray, exp: np.ndarray, wl: int, block_size: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    man = np.ascontiguousarray(man, np.int8)
    exp = np.ascontiguousarray(exp, np.int8)
    y = np.empty(man.shape, np.float32)
    lib.dmxq_bfp_unpack(_i8(man), _i8(exp), _f32(y), man.shape[0], man.shape[1], block_size, wl)
    return y


def is_available() -> bool:
    return _load() is not None
