"""ctypes bindings for the exact-integer C++ oracle (oracle.cpp).

Compiled lazily with g++ on first use; tests skip gracefully if no
toolchain is present.
"""

from __future__ import annotations

import ctypes

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is None:
        from .build import build

        _lib = ctypes.CDLL(build())
    return _lib


def oracle_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def dyadic_decompose_oracle(r: np.ndarray):
    lib = _load()
    r = np.ascontiguousarray(r, np.float32)
    n = r.size
    m = np.empty(n, np.int32)
    e = np.empty(n, np.int32)
    lib.dyadic_decompose(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return m.reshape(r.shape), e.reshape(r.shape)


def dyadic_mul_oracle(z: np.ndarray, m: int, e: int):
    lib = _load()
    z = _i32(z)
    out = np.empty_like(z)
    lib.dyadic_mul(
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(z.size),
        ctypes.c_int32(int(m)),
        ctypes.c_int32(int(e)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def _rowwise(fn_name, x, scale, out_bits, n):
    lib = _load()
    x = _i32(x)
    rows, cols = x.shape
    out = np.empty_like(x)
    getattr(lib, fn_name)(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(rows),
        ctypes.c_int(cols),
        ctypes.c_float(scale),
        ctypes.c_int(out_bits),
        ctypes.c_int(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def shiftmax_oracle(x, scale, out_bits=16, n=15):
    return _rowwise("shiftmax_i32", x, scale, out_bits, n)


def shiftgelu_oracle(x, sig_scale, out_bits=8, n=23):
    return _rowwise("shiftgelu_i32", x, sig_scale, out_bits, n)


def int_layernorm_oracle(x):
    lib = _load()
    x = _i32(x)
    rows, cols = x.shape
    out = np.empty_like(x)
    lib.int_layernorm_i32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(rows),
        ctypes.c_int(cols),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
