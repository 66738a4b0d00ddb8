"""Native (C++) host-side QP solver binding.

Builds ``libscp_qp.so`` from ``scp_qp.cpp`` on first use (g++, cached next to
the source) and exposes it through ctypes as :class:`NativeQP` — the same
equilibrated matrix-free ADMM as ``solvers/admm.py``, running on the host
CPU.  Fills the role OSQP's C core plays in the reference and doubles as an
independent implementation for differential tests.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "scp_qp.cpp"
_LIB = Path(__file__).parent / "libscp_qp.so"

_lib = None


def _build() -> Path:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(_LIB), str(_SRC)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def load_library():
    """Load (building if needed) the native solver library."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    d = ctypes.c_double
    dp = ctypes.POINTER(ctypes.c_double)
    lib.scp_qp_create.restype = ctypes.c_void_p
    lib.scp_qp_create.argtypes = [ctypes.c_int, ctypes.c_int, d]
    lib.scp_qp_destroy.argtypes = [ctypes.c_void_p]
    lib.scp_qp_set_settings.argtypes = [ctypes.c_void_p, d, d, d, d, d,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int]
    lib.scp_qp_set_precond.argtypes = [ctypes.c_void_p, dp, dp]
    lib.scp_qp_set_bounds.argtypes = [ctypes.c_void_p, dp, dp]
    lib.scp_qp_set_scaling.argtypes = [ctypes.c_void_p, dp, dp]
    lib.scp_qp_set_collision.argtypes = [ctypes.c_void_p, dp, d]
    lib.scp_qp_solve.restype = ctypes.c_int
    lib.scp_qp_solve.argtypes = [ctypes.c_void_p, dp, dp, dp]
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeQP:
    """One QP instance:  min ||x||^2  s.t.  l <= A x <= u  on the host.

    Row buffers are concatenated block order jerk|acc|vel|pos|col, matching
    ``ConstraintBlocks`` flattened per block.
    """

    def __init__(self, n_vehicles: int, n_steps: int, h: float):
        self.lib = load_library()
        self.N, self.K, self.h = n_vehicles, n_steps, h
        self.P = n_vehicles * (n_vehicles - 1) // 2
        self.handle = self.lib.scp_qp_create(n_vehicles, n_steps,
                                             ctypes.c_double(h))
        self.n = 2 * n_vehicles * n_steps
        self.m = (2 * self.N * (self.K - 1) + 3 * 2 * self.N * self.K
                  + self.K * self.P)

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.scp_qp_destroy(self.handle)
            self.handle = None

    def set_settings(self, *, rho=0.1, sigma=1e-6, alpha=1.6, eps_abs=1e-3,
                     eps_rel=1e-3, max_iter=4000, check_interval=25,
                     cg_iters=10):
        self.lib.scp_qp_set_settings(self.handle, rho, sigma, alpha, eps_abs,
                                     eps_rel, max_iter, check_interval,
                                     cg_iters)

    def set_precond(self, Q: np.ndarray, lam: np.ndarray):
        Q = np.ascontiguousarray(Q, dtype=np.float64)
        lam = np.ascontiguousarray(lam, dtype=np.float64)
        assert Q.shape == (self.K, self.K) and lam.shape == (self.K,)
        self.lib.scp_qp_set_precond(self.handle, _ptr(Q), _ptr(lam))

    def set_bounds(self, lower: np.ndarray, upper: np.ndarray):
        lower = np.ascontiguousarray(lower, dtype=np.float64)
        upper = np.ascontiguousarray(upper, dtype=np.float64)
        assert lower.size == self.m and upper.size == self.m
        self.lib.scp_qp_set_bounds(self.handle, _ptr(lower), _ptr(upper))

    def set_scaling(self, d_rows: np.ndarray, rho_rows: np.ndarray):
        d_rows = np.ascontiguousarray(d_rows, dtype=np.float64)
        rho_rows = np.ascontiguousarray(rho_rows, dtype=np.float64)
        assert d_rows.size == self.m and rho_rows.size == self.m
        self.lib.scp_qp_set_scaling(self.handle, _ptr(d_rows), _ptr(rho_rows))

    def set_collision(self, eta: np.ndarray, col_mask: float):
        eta = np.ascontiguousarray(eta, dtype=np.float64)
        assert eta.size == self.K * self.P * 2
        self.lib.scp_qp_set_collision(self.handle, _ptr(eta),
                                      ctypes.c_double(col_mask))

    def solve(self, x_init: np.ndarray):
        x_init = np.ascontiguousarray(x_init, dtype=np.float64).reshape(-1)
        assert x_init.size == self.n
        x_out = np.zeros(self.n)
        info = np.zeros(4)
        self.lib.scp_qp_solve(self.handle, _ptr(x_init), _ptr(x_out),
                              _ptr(info))
        return (x_out.reshape(self.N, self.K, 2),
                dict(iters=int(info[0]), prim_res=float(info[1]),
                     dual_res=float(info[2]), converged=bool(info[3])))
