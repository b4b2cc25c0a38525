"""Numerical regression tests for the control linear-algebra kernels
against scipy (which the reference uses directly, lqr_utils.py:7-74)."""

import numpy as np
import pytest
import scipy.linalg as sla

from safe_control_gym_tpu.math import linalg


@pytest.fixture(scope='module')
def systems():
    rng = np.random.default_rng(0)
    out = []
    for _ in range(4):
        n, m = 4, 2
        A = rng.standard_normal((n, n)) * 0.5
        B = rng.standard_normal((n, m))
        Q = np.eye(n)
        R = np.eye(m) * 0.1
        out.append((A, B, Q, R))
    return out


def test_dare_matches_scipy(systems):
    for A, B, Q, R in systems:
        P_ref = sla.solve_discrete_are(A, B, Q, R)
        P = np.array(linalg.solve_dare(A, B, Q, R))
        assert np.allclose(P, P_ref, atol=1e-4), np.abs(P - P_ref).max()


def test_care_matches_scipy(systems):
    for A, B, Q, R in systems:
        P_ref = sla.solve_continuous_are(A, B, Q, R)
        P = np.array(linalg.solve_care(A, B, Q, R))
        assert np.allclose(P, P_ref, atol=1e-4)


def test_expm_matches_scipy(systems):
    for A, _, _, _ in systems:
        # f32 on-device precision: ~1e-5 absolute error for these norms.
        assert np.allclose(np.array(linalg.expm(A)), sla.expm(A), atol=2e-4)


def test_discretize_exact_vs_euler():
    A = np.array([[0.0, 1.0], [-2.0, -0.5]])
    B = np.array([[0.0], [1.0]])
    Ad, Bd = linalg.discretize_linear_system(A, B, 0.01, exact=True)
    Ad_e, Bd_e = linalg.discretize_linear_system(A, B, 0.01, exact=False)
    # Euler is a first-order approximation of exact ZOH.
    assert np.allclose(np.array(Ad), np.array(Ad_e), atol=1e-3)
    assert np.allclose(np.array(Bd), np.array(Bd_e), atol=1e-4)
    # Exact matches scipy expm-based discretization.
    M = np.block([[A, B], [np.zeros((1, 3))]])
    Md = sla.expm(M * 0.01)
    assert np.allclose(np.array(Ad), Md[:2, :2], atol=1e-6)
    assert np.allclose(np.array(Bd), Md[:2, 2:], atol=1e-6)


def test_lqr_gain_stabilizes():
    # Cartpole linearized at upright must be stabilized by the LQR gain.
    from safe_control_gym_tpu.envs.dynamics import CartPoleParams, cartpole_dynamics
    import jax
    p = CartPoleParams()
    f = lambda x, u: cartpole_dynamics(x, u, p)
    A = np.array(jax.jacfwd(f, 0)(np.zeros(4, np.float32), np.zeros(1, np.float32)))
    B = np.array(jax.jacfwd(f, 1)(np.zeros(4, np.float32), np.zeros(1, np.float32)))
    Ad, Bd = linalg.discretize_linear_system(A, B, 0.02, exact=True)
    K = np.array(linalg.compute_lqr_gain(np.array(Ad), np.array(Bd),
                                         np.eye(4), np.eye(1) * 0.1,
                                         discrete=True))
    eig = np.linalg.eigvals(np.array(Ad) - np.array(Bd) @ K)
    assert np.all(np.abs(eig) < 1.0)


def test_cost_weight_matrix():
    assert np.allclose(linalg.get_cost_weight_matrix([5.0], 3), np.eye(3) * 5)
    assert np.allclose(linalg.get_cost_weight_matrix([1.0, 2.0], 2),
                       np.diag([1.0, 2.0]))
    with pytest.raises(ValueError):
        linalg.get_cost_weight_matrix([1.0, 2.0], 3)
