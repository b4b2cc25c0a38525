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
           'quad3d_advance_oracle', 'cartpole_rk4_oracle']

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
