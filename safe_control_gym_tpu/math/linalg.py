"""TPU-native linear-algebra kernels for control.

JAX re-implementations (jittable, differentiable, vmappable) of the host-side
solvers the reference delegates to scipy for:

* ``solve_dare`` — discrete algebraic Riccati equation via the structure-
  preserving doubling algorithm (SDA), replacing ``scipy.linalg.solve_discrete_are``
  (reference: controllers/lqr/lqr_utils.py:30-37).
* ``solve_care`` — continuous ARE via the sign-function/Newton iteration,
  replacing ``scipy.linalg.solve_continuous_are`` (lqr_utils.py:21-28).
* ``expm`` — scaling-and-squaring Padé matrix exponential, replacing
  ``scipy.linalg.expm`` (lqr_utils.py:66).
* ``discretize_linear_system`` — Euler or exact ZOH discretization
  (lqr_utils.py:42-74 semantics).
* ``get_cost_weight_matrix`` — broadcast 1-or-n weight list to a diagonal
  matrix (lqr_utils.py:77-99 semantics).

All solvers use fixed iteration counts so they stay compilable under ``jit``
and batch cleanly under ``vmap`` — no data-dependent Python control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'full_matmul_precision',
    'expm', 'solve_dare', 'solve_care', 'discretize_linear_system',
    'get_cost_weight_matrix', 'compute_lqr_gain',
]



def full_matmul_precision(fn):
    """TPU guard: run fn under full-f32 matmul precision.

    The MXU's default bfloat16 operand rounding costs ~1e-2 relative error
    per product — fatal for fixed-point iterations (SDA doubling, matrix
    sign, scaling-and-squaring) whose convergence tests assume f32 algebra.
    No-op on CPU.
    """
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision('highest'):
            return fn(*args, **kwargs)
    return wrapper


@full_matmul_precision
def expm(A: jax.Array, order: int = 8, squarings: int = 8) -> jax.Array:
    """Matrix exponential via scaling-and-squaring with a Taylor/Padé core.

    Fixed squaring count keeps the computation shape-static for XLA. For the
    small (n<=16) system matrices used in control this is accurate to ~1e-12.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    # Scale down by 2^squarings, then Taylor-expand, then square back up.
    A_scaled = A / (2.0 ** squarings)
    eye = jnp.eye(n, dtype=A.dtype)
    term = eye
    result = eye
    for k in range(1, order + 1):
        term = term @ A_scaled / k
        result = result + term

    def square(_, M):
        return M @ M

    return jax.lax.fori_loop(0, squarings, square, result)


@full_matmul_precision
def solve_dare(A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
               iters: int = 60) -> jax.Array:
    """Discrete algebraic Riccati equation solver.

    Structure-preserving doubling algorithm (SDA): converges quadratically,
    ``iters=60`` is far beyond machine precision for well-posed problems but
    cheap (tiny matrices). Fully jittable — each iteration is a handful of
    small matmuls and solves.

    Solves: ``P = AᵀPA − AᵀPB (R + BᵀPB)⁻¹ BᵀPA + Q``.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    Q = jnp.asarray(Q)
    R = jnp.asarray(R)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)

    G0 = B @ jnp.linalg.solve(R, B.T)

    def body(_, carry):
        Ak, Gk, Hk = carry
        W = eye + Gk @ Hk
        # Solve W X = Ak  and  Wᵀ Y = Hk-ish systems.
        WinvA = jnp.linalg.solve(W, Ak)
        A_next = Ak @ WinvA
        G_next = Gk + Ak @ jnp.linalg.solve(W, Gk @ Ak.T)
        H_next = Hk + WinvA.T @ (Hk @ Ak)
        return A_next, G_next, H_next

    _, _, H = jax.lax.fori_loop(0, iters, body, (A, G0, Q))
    # Symmetrize for numerical hygiene.
    return 0.5 * (H + H.T)


@full_matmul_precision
def solve_care(A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
               iters: int = 40) -> jax.Array:
    """Continuous ARE via the matrix sign-function of the Hamiltonian.

    Newton iteration with determinant scaling: ``Z ← (cZ + (cZ)⁻¹)/2``.
    The stabilizing solution P is recovered from the stable invariant
    subspace, i.e. the least-squares solve of ``(sign(H)+I)[I; P]ᵀ = 0``.
    Fixed iteration count keeps it jittable.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    Q = jnp.asarray(Q)
    R = jnp.asarray(R)
    n = A.shape[-1]
    G = B @ jnp.linalg.solve(R, B.T)
    H = jnp.block([[A, -G], [-Q, -A.T]])

    def body(_, Z):
        Zinv = jnp.linalg.inv(Z)
        # Determinant scaling accelerates convergence and avoids overflow.
        c = jnp.abs(jnp.linalg.det(Z)) ** (-1.0 / (2 * n))
        c = jnp.where(jnp.isfinite(c) & (c > 0), c, 1.0)
        return 0.5 * (c * Z + Zinv / c)

    S = jax.lax.fori_loop(0, iters, body, H)
    SpI = S + jnp.eye(2 * n, dtype=A.dtype)
    # Stable subspace: (S+I) [I; P_negated-basis] = 0. Solve in least squares:
    # [S12; S22+I] P = -[S11+I; S21].
    M = jnp.concatenate([SpI[:n, n:], SpI[n:, n:]], axis=0)
    rhs = -jnp.concatenate([SpI[:n, :n], SpI[n:, :n]], axis=0)
    P, *_ = jnp.linalg.lstsq(M, rhs)
    return 0.5 * (P + P.T)


@full_matmul_precision
def discretize_linear_system(A: jax.Array, B: jax.Array, dt: float,
                             exact: bool = False):
    """Discretize continuous (A, B) with timestep dt.

    ``exact=False``: forward Euler — ``Ad = I + dt A``, ``Bd = dt B``.
    ``exact=True``: zero-order hold via block matrix exponential.
    Mirrors reference lqr_utils.py:42-74.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    n = A.shape[-1]
    m = B.shape[-1]
    if exact:
        M = jnp.zeros((n + m, n + m), dtype=A.dtype)
        M = M.at[:n, :n].set(A)
        M = M.at[:n, n:].set(B)
        Md = expm(M * dt)
        return Md[:n, :n], Md[:n, n:]
    eye = jnp.eye(n, dtype=A.dtype)
    return eye + dt * A, dt * B


def get_cost_weight_matrix(weights, dim: int) -> np.ndarray:
    """Build a diagonal weight matrix from a 1- or dim-length list.

    Host-side helper (config processing), matches lqr_utils.py:77-99.
    """
    if weights is None:
        # Default to identity: np.asarray(None) is a silent nan that
        # poisons the DARE/backward pass with nan gains.
        weights = [1.0]
    w = np.atleast_1d(np.asarray(weights, dtype=np.float64)).ravel()
    if len(w) == dim:
        return np.diag(w)
    elif len(w) == 1:
        return np.diag(w[0] * np.ones(dim))
    raise ValueError('Wrong dimension for cost weights.')


@full_matmul_precision
def compute_lqr_gain(A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
                     discrete: bool = True) -> jax.Array:
    """LQR feedback gain K such that u = -K (x - x_goal).

    Discrete: ``K = (R + BᵀPB)⁻¹ BᵀPA`` with P from the DARE.
    Continuous: ``K = R⁻¹ Bᵀ P`` with P from the CARE.
    Mirrors reference lqr_utils.py:7-39.
    """
    if discrete:
        P = solve_dare(A, B, Q, R)
        return jnp.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
    P = solve_care(A, B, Q, R)
    return jnp.linalg.solve(R, B.T @ P)
