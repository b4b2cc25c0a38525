"""On-device quadratic programming — the TPU-native replacement for the
reference's host C++ solvers (IPOPT / qpOASES / qrsqp via CasADi Opti,
mpc.py:170-246; HPIPM via acados, mpc_acados.py:164-175).

OSQP-style ADMM over the general form

    min 0.5 z'Pz + q'z   s.t.  l <= Az <= u

with a single dense Cholesky factorization of the quasi-definite KKT proxy
``P + sigma I + rho A'A`` reused across all iterations. Everything is
shape-static and jittable: MPC problems (a few hundred variables) factor in
microseconds on the MXU, batch under ``vmap`` (batched CBF-QPs, multi-env
MPC), and differentiate under ``jax.grad`` if needed.

Equality rows are expressed as l == u. Fixed iteration count keeps the
computation compilable; warm starting (z, y carried across control steps)
gives OSQP-like effective accuracy for receding-horizon use.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ['QPSolution', 'admm_qp', 'make_qp_solver']


class QPSolution(NamedTuple):
    x: jax.Array          # primal solution
    z: jax.Array          # slack (Ax projected)
    y: jax.Array          # dual
    prim_res: jax.Array   # final primal residual ||Ax - z||_inf
    dual_res: jax.Array   # final dual residual


def admm_qp(P: jax.Array, q: jax.Array, A: jax.Array, l: jax.Array,
            u: jax.Array, x0: Optional[jax.Array] = None,
            y0: Optional[jax.Array] = None, rho: float = 0.1,
            sigma: float = 1e-6, alpha: float = 1.6,
            iters: int = 200) -> QPSolution:
    """Solve the QP with fixed-iteration ADMM (OSQP algorithm 1).

    All arrays dense; returns a :class:`QPSolution`. ``rho`` is scaled per
    row: equality rows (l == u) get 1e3 x rho, the standard OSQP heuristic.
    """
    n = P.shape[0]
    m = A.shape[0]
    x = jnp.zeros(n) if x0 is None else x0
    y = jnp.zeros(m) if y0 is None else y0
    z = jnp.clip(A @ x, l, u)

    eq_mask = (u - l) < 1e-9
    rho_vec = jnp.where(eq_mask, rho * 1e3, rho)

    K = P + sigma * jnp.eye(n) + (A.T * rho_vec) @ A
    K = 0.5 * (K + K.T)
    chol = jax.scipy.linalg.cho_factor(K)

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + A.T @ (rho_vec * z - y)
        x_new = jax.scipy.linalg.cho_solve(chol, rhs)
        Ax = A @ x_new
        Ax_relaxed = alpha * Ax + (1 - alpha) * z
        z_new = jnp.clip(Ax_relaxed + y / rho_vec, l, u)
        y_new = y + rho_vec * (Ax_relaxed - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(0, iters, body, (x, z, y))
    Ax = A @ x
    prim_res = jnp.max(jnp.abs(Ax - jnp.clip(Ax, l, u)))
    dual_res = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    return QPSolution(x=x, z=z, y=y, prim_res=prim_res, dual_res=dual_res)


def make_qp_solver(iters: int = 200, rho: float = 0.1, sigma: float = 1e-6,
                   alpha: float = 1.6):
    """Returns a jit-ready closure ``solve(P, q, A, l, u, x0, y0)``."""
    def solve(P, q, A, l, u, x0=None, y0=None):
        return admm_qp(P, q, A, l, u, x0=x0, y0=y0, rho=rho, sigma=sigma,
                       alpha=alpha, iters=iters)
    return solve
