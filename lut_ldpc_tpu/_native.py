"""ctypes loader for the native design-time kernels (csrc/lut_core.cpp).

Builds the shared library on first use (cached next to the source); all
callers fall back to the pure-numpy implementations when no compiler is
available, so the native path is strictly an accelerator, never a
correctness dependency.  Tests assert bit-identical outputs between both.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRCS = [
    os.path.join(_REPO_ROOT, "csrc", "lut_core.cpp"),
    os.path.join(_REPO_ROOT, "csrc", "peg.cpp"),
]
_SRC = _SRCS[0]
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_LIB = os.path.join(_BUILD_DIR, "liblutcore.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # -ffp-contract=off: no FMA contraction, so results stay bit-identical
    # to the numpy fallback (and the reference's accumulation order)
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off",
        "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LUT_LDPC_NO_NATIVE"):
            return None
        needs_build = not os.path.exists(_LIB) or any(
            os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(_LIB)
            for s in _SRCS
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        dptr = ctypes.POINTER(ctypes.c_double)
        iptr = ctypes.POINTER(ctypes.c_int64)
        lib.quant_mi_sym.restype = ctypes.c_double
        lib.quant_mi_sym.argtypes = [dptr, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int32, dptr, iptr]
        lib.sym_llr_sort_unique.restype = ctypes.c_int64
        lib.sym_llr_sort_unique.argtypes = [dptr, ctypes.c_int64, ctypes.c_double,
                                            dptr, iptr, iptr]
        lib.chk_update_minsum.restype = None
        lib.chk_update_minsum.argtypes = [dptr, ctypes.c_int64, ctypes.c_int64, dptr]
        i32ptr = ctypes.POINTER(ctypes.c_int32)
        lib.peg_construct.restype = ctypes.c_int32
        lib.peg_construct.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i32ptr, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_uint64, i32ptr, i32ptr,
        ]
        _lib = lib
        return _lib


def _as_dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _as_iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def quant_mi_sym_native(p_in: np.ndarray, Nq: int, is_sorted: bool):
    """Native quant_mi_sym; returns (mi, p_out, Q_out) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p_in = np.ascontiguousarray(p_in, dtype=np.float64)
    p_out = np.empty(Nq, dtype=np.float64)
    Q_out = np.empty(len(p_in), dtype=np.int64)
    mi = lib.quant_mi_sym(
        _as_dptr(p_in), len(p_in), Nq, 1 if is_sorted else 0, _as_dptr(p_out), _as_iptr(Q_out)
    )
    if np.isnan(mi):
        raise ValueError("quant_mi_sym (native): invalid input")
    return float(mi), p_out, Q_out


def chk_update_minsum_native(p_in: np.ndarray, dc: int):
    lib = get_lib()
    if lib is None:
        return None
    p_in = np.ascontiguousarray(p_in, dtype=np.float64)
    out = np.empty(len(p_in), dtype=np.float64)
    lib.chk_update_minsum(_as_dptr(p_in), len(p_in), dc, _as_dptr(out))
    return out
