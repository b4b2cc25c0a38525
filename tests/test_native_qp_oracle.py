"""Cross-validation of the on-device ADMM QP solver (ops/qp.py) against the
independent C++ oracle (native/qp_oracle.cpp) — the "second implementation
in another language" role the reference's host C++ solvers (IPOPT/qpOASES/
HPIPM, reference controllers/mpc/mpc.py:170-246) play for its MPC stack.

The oracle is f64 with its own dense Cholesky/LU; the device solver is f32
on the MXU. Agreement on random, ill-conditioned, and MPC-shaped instances
certifies the whole pipeline: Ruiz equilibration, staged adaptive rho,
equality-row handling, and the active-set polish."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which('g++') is None,
                                reason='g++ not available')

import jax.numpy as jnp

from safe_control_gym_tpu.ops.qp import admm_qp
from safe_control_gym_tpu.utils.native import qp_solve_oracle


def _objective(P, q, x):
    return 0.5 * x @ P @ x + q @ x


def _device_solve(P, q, A, l, u, **kw):
    sol = admm_qp(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                  jnp.asarray(A, jnp.float32), jnp.asarray(l, jnp.float32),
                  jnp.asarray(u, jnp.float32), **kw)
    return (np.asarray(sol.x, np.float64), np.asarray(sol.y, np.float64),
            float(sol.prim_res), float(sol.dual_res))


def _random_qp(rng, n, m, cond=10.0):
    G = rng.normal(size=(n, n))
    P = G @ G.T + np.eye(n) / cond
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    ctr = A @ rng.normal(size=n)
    width = np.abs(rng.normal(size=m)) + 0.5
    return P, q, A, ctr - width, ctr + width


def test_oracle_matches_device_on_random_qps():
    rng = np.random.default_rng(0)
    for trial in range(5):
        P, q, A, l, u = _random_qp(rng, n=12, m=20)
        xo, yo, pro, dro = qp_solve_oracle(P, q, A, l, u, iters=2000,
                                           tol=1e-6, polish=True)
        xd, yd, prd, drd = _device_solve(P, q, A, l, u, iters=2000,
                                         tol=1e-6, polish=True)
        assert pro < 1e-5, (trial, pro)
        assert prd < 1e-4, (trial, prd)
        # Same minimizer (strictly convex): x agreement at f32 level and
        # matching objective values.
        assert np.max(np.abs(xo - xd)) < 5e-3, trial
        fo, fd = _objective(P, q, xo), _objective(P, q, xd)
        assert abs(fo - fd) <= 1e-4 * max(1.0, abs(fo)), trial


def test_oracle_exact_on_equality_constrained_qp():
    # min 0.5||x||^2 s.t. sum(x) == 1 has the analytic solution x_i = 1/n.
    n = 8
    P = np.eye(n)
    q = np.zeros(n)
    A = np.ones((1, n))
    l = u = np.ones(1)
    x, y, pr, dr = qp_solve_oracle(P, q, A, l, u, iters=1000, tol=1e-8,
                                   polish=True)
    assert np.max(np.abs(x - 1.0 / n)) < 1e-6, x
    xd, *_ = _device_solve(P, q, A, l, u, iters=1000, tol=1e-8, polish=True)
    assert np.max(np.abs(xd - 1.0 / n)) < 1e-4, xd


def test_oracle_matches_device_on_ill_scaled_qp():
    # Rows/columns spanning 8 orders of magnitude: the regime that made
    # Ruiz equilibration + staged rho mandatory for the MPSC tube QPs.
    rng = np.random.default_rng(1)
    n, m = 10, 16
    P, q, A, l, u = _random_qp(rng, n, m)
    row_s = 10.0 ** rng.uniform(-3, 4, size=m)
    col_s = 10.0 ** rng.uniform(-2, 2, size=n)
    A = A * row_s[:, None] * col_s[None, :]
    P = P * col_s[:, None] * col_s[None, :]
    q = q * col_s
    l, u = l * row_s, u * row_s
    xo, _, pro, _ = qp_solve_oracle(P, q, A, l, u, iters=4000, tol=1e-6,
                                    polish=True)
    xd, _, prd, _ = _device_solve(P, q, A, l, u, iters=4000, tol=1e-6,
                                  polish=True)
    assert pro < 1e-5
    fo, fd = _objective(P, q, xo), _objective(P, q, xd)
    assert abs(fo - fd) <= 1e-3 * max(1.0, abs(fo))


def test_oracle_matches_device_on_mpc_shaped_qp():
    # A condensed-form LTI MPC program exactly as MPC._build lays it out:
    # z = [X (T+1,nx); U (T,nu)], dynamics as hard equality rows (l == u),
    # box state/input constraints, initial-condition pin. Double-integrator
    # plant, horizon 15.
    T, nx, nu = 15, 2, 1
    dt = 0.1
    Ad = np.array([[1.0, dt], [0.0, 1.0]])
    Bd = np.array([[0.5 * dt * dt], [dt]])
    nX = (T + 1) * nx
    n = nX + T * nu
    Q, R = np.diag([1.0, 0.1]), np.eye(nu) * 0.1
    P = np.zeros((n, n))
    for k in range(T + 1):
        P[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx] = Q
    for k in range(T):
        i = nX + k * nu
        P[i:i + nu, i:i + nu] = R
    x_ref = np.array([1.0, 0.0])
    q = np.zeros(n)
    for k in range(T + 1):
        q[k * nx:(k + 1) * nx] = -Q @ x_ref
    # Rows: init pin (nx) + dynamics (T*nx) + state boxes + input boxes.
    m = nx + T * nx + nX + T * nu
    A = np.zeros((m, n))
    l = np.full(m, -np.inf)
    u = np.full(m, np.inf)
    x0 = np.array([0.0, 0.0])
    A[:nx, :nx] = np.eye(nx)
    l[:nx] = u[:nx] = x0
    r = nx
    for k in range(T):
        A[r:r + nx, (k + 1) * nx:(k + 2) * nx] = -np.eye(nx)
        A[r:r + nx, k * nx:(k + 1) * nx] = Ad
        A[r:r + nx, nX + k * nu:nX + (k + 1) * nu] = Bd
        l[r:r + nx] = u[r:r + nx] = 0.0
        r += nx
    A[r:r + nX, :nX] = np.eye(nX)
    l[r:r + nX], u[r:r + nX] = -5.0, 5.0
    r += nX
    A[r:, nX:] = np.eye(T * nu)
    l[r:], u[r:] = -0.8, 0.8
    xo, _, pro, _ = qp_solve_oracle(P, q, A, l, u, iters=4000, tol=1e-7,
                                    polish=True)
    xd, _, prd, _ = _device_solve(P, q, A, l, u, iters=4000, tol=1e-7,
                                  polish=True)
    assert pro < 1e-6 and prd < 1e-4
    # The input bound binds early in the push toward x_ref = 1.
    U_o = xo[nX:].reshape(T, nu)
    assert U_o[0, 0] > 0.79, U_o[:, 0]
    assert np.max(np.abs(xo - xd)) < 5e-3
    # Dynamics rows hold exactly for the oracle solution.
    X_o = xo[:nX].reshape(T + 1, nx)
    for k in range(T):
        pred = Ad @ X_o[k] + Bd @ U_o[k]
        assert np.max(np.abs(pred - X_o[k + 1])) < 1e-5


def test_oracle_warm_start_and_dual_consistency():
    rng = np.random.default_rng(2)
    P, q, A, l, u = _random_qp(rng, n=8, m=12)
    x1, y1, pr1, dr1 = qp_solve_oracle(P, q, A, l, u, iters=2000, tol=1e-7,
                                       polish=True)
    # Warm-started re-solve lands on the same point with few iterations.
    x2, y2, pr2, dr2 = qp_solve_oracle(P, q, A, l, u, x0=x1, y0=y1,
                                       iters=50, tol=1e-7, polish=True)
    assert np.max(np.abs(x1 - x2)) < 1e-5
    # KKT stationarity in the ORIGINAL scaling: Px + q + A'y ~ 0.
    stat = P @ x1 + q + A.T @ y1
    assert np.max(np.abs(stat)) < 1e-4 * max(1.0, np.max(np.abs(q)))
