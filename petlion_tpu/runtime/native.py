"""ctypes bindings for the native (C++) host runtime (csrc/).

Builds libpetlion_native.so on first use if a C++ toolchain is available;
all callers degrade gracefully to pure-numpy fallbacks when it isn't.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "libpetlion_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists():
            subprocess.run(["make", "-s", "-C", str(_CSRC)], check=True,
                           timeout=120)
        lib = ctypes.CDLL(str(_SO))
        lib.cubic_spline_interp.restype = ctypes.c_int
        lib.cubic_spline_interp.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int]
        lib.banded_arrow_factor.restype = ctypes.c_int
        lib.banded_arrow_solve.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def spline_interp(t, y, t_query, extrapolate=False):
    """Natural cubic spline; y is (n,) or (n, m). Returns query values."""
    lib = _load()
    assert lib is not None
    t = np.ascontiguousarray(t, dtype=np.float64)
    y2 = np.ascontiguousarray(y, dtype=np.float64)
    squeeze = y2.ndim == 1
    if squeeze:
        y2 = y2[:, None]
    tq = np.ascontiguousarray(t_query, dtype=np.float64)
    out = np.empty((len(tq), y2.shape[1]), dtype=np.float64)
    rc = lib.cubic_spline_interp(len(t), _dp(t), y2.shape[1], _dp(y2),
                                 len(tq), _dp(tq), _dp(out),
                                 1 if extrapolate else 0)
    if rc != 0:
        raise RuntimeError(f"cubic_spline_interp failed: {rc}")
    return out[:, 0] if squeeze else out


def banded_arrow_solve(A, b, kl, ku):
    """Solve the P2D banded+arrowhead system (host, f64). A is modified."""
    lib = _load()
    assert lib is not None
    A = np.ascontiguousarray(A, dtype=np.float64).copy()
    b = np.ascontiguousarray(b, dtype=np.float64)
    n = A.shape[0]
    work = np.empty(2 * n + 2, dtype=np.float64)
    rc = lib.banded_arrow_factor(n, kl, ku, _dp(A), _dp(work))
    if rc != 0:
        raise RuntimeError(f"banded_arrow_factor failed: {rc}")
    x = np.empty(n, dtype=np.float64)
    rc = lib.banded_arrow_solve(n, kl, ku, _dp(A), _dp(work), _dp(b), _dp(x))
    if rc != 0:
        raise RuntimeError(f"banded_arrow_solve failed: {rc}")
    return x
