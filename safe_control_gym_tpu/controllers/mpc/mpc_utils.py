"""MPC utilities — parity with controllers/mpc/mpc_utils.py.

``rk_discrete`` returns a pure JAX function (the reference returns a CasADi
Function); the discrete LQR helper uses the on-device DARE solver.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.constraints import ConstraintList
from safe_control_gym_tpu.math.linalg import (discretize_linear_system,
                                              solve_dare)

__all__ = ['compute_discrete_lqr_gain_from_cont_linear_system', 'rk_discrete',
           'compute_state_rmse', 'reset_constraints']


def compute_discrete_lqr_gain_from_cont_linear_system(dfdx, dfdu, Q_lqr,
                                                      R_lqr, dt):
    """LQR gain + discretized system + Riccati solution
    (mpc_utils.py:12-40). Note the returned gain is NEGATIVE feedback
    (u = K x convention), matching the reference."""
    A, B = discretize_linear_system(np.asarray(dfdx), np.asarray(dfdu), dt)
    A, B = np.asarray(A), np.asarray(B)
    P = np.asarray(solve_dare(A, B, np.asarray(Q_lqr), np.asarray(R_lqr)))
    btp = B.T @ P
    lqr_gain = -np.linalg.solve(np.asarray(R_lqr) + btp @ B, btp @ A)
    return lqr_gain, A, B, P


def rk_discrete(fc: Callable, n: int, m: int, dt: float) -> Callable:
    """RK4 discretization of ``fc(x, u) -> x_dot`` (mpc_utils.py:42-64)."""
    def rk_dyn(x, u):
        k1 = fc(x, u)
        k2 = fc(x + dt / 2 * k1, u)
        k3 = fc(x + dt / 2 * k2, u)
        k4 = fc(x + dt * k3, u)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    return rk_dyn


def compute_state_rmse(state_error: np.ndarray):
    """Per-state and total RMSE (mpc_utils.py:67-80)."""
    mse = np.mean(np.asarray(state_error) ** 2, axis=0)
    state_rmse = np.sqrt(mse)
    return state_rmse, np.sqrt(np.sum(mse))


def reset_constraints(constraints) -> Tuple[ConstraintList, List, List]:
    """Split constraints into state/input symbolic function lists
    (mpc_utils.py:84-101); rejects INPUT_AND_STATE."""
    constraints_list = ConstraintList(constraints)
    state_constraints_sym = constraints_list.get_state_constraint_symbolic_models()
    input_constraints_sym = constraints_list.get_input_constraint_symbolic_models()
    if len(constraints_list.input_state_constraints) > 0:
        raise NotImplementedError(
            '[Error] Cannot handle combined state input constraints yet.')
    return constraints_list, state_constraints_sym, input_constraints_sym
