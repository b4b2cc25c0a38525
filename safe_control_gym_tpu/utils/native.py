"""Loader for the native C++ dynamics oracle (native/dynamics_oracle.cpp).

Builds the shared library on demand with g++ (cached next to the source) and
exposes ctypes wrappers. The oracle is an independent double-precision
implementation of the benchmark dynamics used to cross-validate the JAX
simulation core in tests — the ground-truth role PyBullet's C++ engine
played for the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ['load_oracle', 'cartpole_advance_oracle', 'quad2d_advance_oracle',
           'quad3d_advance_oracle', 'cartpole_rk4_oracle', 'load_qp_oracle',
           'qp_solve_oracle']

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          '..', '..'))
_SRC = os.path.join(_REPO_ROOT, 'native', 'dynamics_oracle.cpp')
_LIB = os.path.join(_REPO_ROOT, 'native', 'libdynamics_oracle.so')
_lib: Optional[ctypes.CDLL] = None


def load_oracle() -> ctypes.CDLL:
    """Compile (if needed) and load the oracle shared library."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.check_call(['g++', '-O2', '-shared', '-fPIC', '-o', _LIB,
                               _SRC])
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.cartpole_advance.argtypes = [dp, ctypes.c_double, dp, dp,
                                     ctypes.c_double, ctypes.c_int]
    lib.cartpole_rk4.argtypes = [dp, ctypes.c_double, dp, ctypes.c_double]
    lib.quad2d_advance.argtypes = [dp, dp, dp, ctypes.c_double, ctypes.c_int]
    lib.quad3d_advance.argtypes = [dp, dp, dp, ctypes.c_double, ctypes.c_int]
    _lib = lib
    return lib


def _as_c(arr):
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.float64))
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def cartpole_advance_oracle(state, force, tab_force, params, dt, n_substeps):
    lib = load_oracle()
    s, sp = _as_c(state)
    t, tp = _as_c(tab_force)
    p, pp = _as_c(params)
    lib.cartpole_advance(sp, float(force), tp, pp, float(dt),
                         int(n_substeps))
    return s


def cartpole_rk4_oracle(state, force, params, dt):
    lib = load_oracle()
    s, sp = _as_c(state)
    p, pp = _as_c(params)
    lib.cartpole_rk4(sp, float(force), pp, float(dt))
    return s


def quad2d_advance_oracle(state, u, params, dt, n_substeps):
    lib = load_oracle()
    s, sp = _as_c(state)
    uu, up = _as_c(u)
    p, pp = _as_c(params)
    lib.quad2d_advance(sp, up, pp, float(dt), int(n_substeps))
    return s


def quad3d_advance_oracle(state, f, params, dt, n_substeps):
    lib = load_oracle()
    s, sp = _as_c(state)
    ff, fp = _as_c(f)
    p, pp = _as_c(params)
    lib.quad3d_advance(sp, fp, pp, float(dt), int(n_substeps))
    return s


# ----------------------------------------------------------------------
# QP oracle (native/qp_oracle.cpp): independent f64 ADMM implementation of
# ops/qp.py's solver, the "second implementation" safety net standing in
# for the reference's host C++ solvers (IPOPT/qpOASES/HPIPM via CasADi and
# acados, reference controllers/mpc/mpc.py:170-246, mpc_acados.py:164-175).
# ----------------------------------------------------------------------
_QP_SRC = os.path.join(_REPO_ROOT, 'native', 'qp_oracle.cpp')
_QP_LIB = os.path.join(_REPO_ROOT, 'native', 'libqp_oracle.so')
_qp_lib: Optional[ctypes.CDLL] = None


def load_qp_oracle() -> ctypes.CDLL:
    """Compile (if needed) and load the QP oracle shared library."""
    global _qp_lib
    if _qp_lib is not None:
        return _qp_lib
    if (not os.path.exists(_QP_LIB)
            or os.path.getmtime(_QP_LIB) < os.path.getmtime(_QP_SRC)):
        subprocess.check_call(['g++', '-O2', '-shared', '-fPIC', '-o',
                               _QP_LIB, _QP_SRC])
    lib = ctypes.CDLL(_QP_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.qp_solve.argtypes = [dp, dp, dp, dp, dp, ctypes.c_int, ctypes.c_int,
                             dp, dp, ctypes.c_double, ctypes.c_double,
                             ctypes.c_double, ctypes.c_int, ctypes.c_double,
                             ctypes.c_int, dp, dp, dp]
    lib.qp_solve.restype = ctypes.c_int
    _qp_lib = lib
    return lib


def qp_solve_oracle(P, q, A, l, u, x0=None, y0=None, rho: float = 0.1,
                    sigma: float = 1e-6, alpha: float = 1.6,
                    iters: int = 200, tol: Optional[float] = None,
                    polish: bool = False):
    """Solve ``min 0.5 x'Px + q'x  s.t. l <= Ax <= u`` with the native
    oracle. Same signature/semantics as :func:`ops.qp.admm_qp`; returns
    ``(x, y, prim_res, dual_res)`` with residuals in the equilibrated
    scaling (the device solver's convention)."""
    lib = load_qp_oracle()
    P_, Pp = _as_c(P)
    q_, qp_ = _as_c(q)
    A_, Ap = _as_c(A)
    l_, lp = _as_c(l)
    u_, up = _as_c(u)
    n, m = P_.shape[0], A_.shape[0]
    null = ctypes.POINTER(ctypes.c_double)()
    if x0 is not None:
        x0_, x0p = _as_c(x0)
    else:
        x0p = null
    if y0 is not None:
        y0_, y0p = _as_c(y0)
    else:
        y0p = null
    x = np.zeros(n, np.float64)
    y = np.zeros(m, np.float64)
    res = np.zeros(2, np.float64)
    rc = lib.qp_solve(Pp, qp_, Ap, lp, up, n, m, x0p, y0p, float(rho),
                      float(sigma), float(alpha), int(iters),
                      float(tol) if tol is not None else 0.0,
                      int(bool(polish)),
                      x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      res.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f'native qp_solve failed (rc={rc}): '
                           'KKT factorization broke down')
    return x, y, float(res[0]), float(res[1])
