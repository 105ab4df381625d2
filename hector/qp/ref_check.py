"""Host-side QP oracle harness (the qpOASES stand-in).

Builds and binds the native clean-room active-set solver
(native/qp_oracle.cpp) via ctypes -- the independent double-precision
reference for validating the batched TPU interior-point solver, playing the
role qpOASES plays for the reference (SURVEY.md §2.2 "ref_check" plan).

The shared library is compiled on first use with g++ and cached under
native/build/.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def _build_lib() -> str:
    src = os.path.join(_NATIVE_DIR, "qp_oracle.cpp")
    build_dir = os.path.join(_NATIVE_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    lib_path = os.path.join(build_dir, "libqp_oracle.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", lib_path, src],
            check=True)
    return lib_path


def _lib():
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL(_build_lib())
        _LIB.qp_oracle_solve.restype = ctypes.c_int
        _LIB.qp_oracle_solve.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ]
    return _LIB


def solve_dense(h_mat, g_vec, a_mat, lb, ub, max_iter: int = 2000,
                tol: float = 1e-10, big_threshold: float = 1e9) -> np.ndarray:
    """Solve min 1/2 x^T H x + g^T x s.t. lb <= A x <= ub in float64.

    Raises RuntimeError on solver failure.
    """
    h = np.ascontiguousarray(h_mat, np.float64)
    g = np.ascontiguousarray(g_vec, np.float64)
    a = np.ascontiguousarray(a_mat, np.float64)
    lo = np.ascontiguousarray(lb, np.float64)
    hi = np.ascontiguousarray(ub, np.float64)
    n = g.shape[0]
    m = lo.shape[0]
    x = np.zeros(n, np.float64)
    p = lambda arr: arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = _lib().qp_oracle_solve(n, m, p(h), p(g), p(a), p(lo), p(hi),
                                p(x), max_iter, tol, big_threshold)
    if rc not in (0,):
        raise RuntimeError(f"qp_oracle_solve failed rc={rc}")
    return x


def solve_qpdata(qp, **kw) -> np.ndarray:
    """Solve a hector QPData (unbatched) with the native oracle.

    Expands the per-step constraint block into the full (16h, 12h) matrix
    the way fmat is laid out (SolverMPC.cpp:552-555).
    """
    h_mat = np.asarray(qp.h_mat, np.float64)
    g_vec = np.asarray(qp.g_vec, np.float64)
    c = np.asarray(qp.c_block, np.float64)
    lb = np.asarray(qp.lb, np.float64).reshape(-1)
    ub = np.asarray(qp.ub, np.float64).reshape(-1)
    h = qp.lb.shape[-2]
    n = g_vec.shape[0]
    a = np.zeros((16 * h, n))
    for i in range(h):
        a[16 * i:16 * (i + 1), 12 * i:12 * (i + 1)] = c
    return solve_dense(h_mat, g_vec, a, lb, ub, **kw)
