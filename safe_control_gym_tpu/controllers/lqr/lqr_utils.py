"""LQR helpers — JAX rebuild of controllers/lqr/lqr_utils.py.

The scipy DARE/CARE/expm calls of the reference (lqr_utils.py:7-74) are
replaced by the jittable solvers in :mod:`safe_control_gym_tpu.math.linalg`,
so gain synthesis can run on-device and batch under vmap.
"""

from __future__ import annotations

import numpy as np

from safe_control_gym_tpu.math.linalg import (discretize_linear_system,
                                              get_cost_weight_matrix,
                                              solve_care, solve_dare)

__all__ = ['compute_lqr_gain', 'discretize_linear_system',
           'get_cost_weight_matrix']


def compute_lqr_gain(model, x_0, u_0, Q, R, discrete_dynamics: bool = True):
    """LQR gain for the model linearized at (x_0, u_0)
    (reference lqr_utils.py:7-39).

    Args:
        model: AnalyticModel with df_func and dt.
        x_0/u_0: linearization point.
        Q/R: cost weights.
        discrete_dynamics: discretize + DARE if True, else CARE.

    Returns:
        gain (ndarray): K such that u = -K (x - x_goal) + u_eq.
    """
    df = model.df_func(np.atleast_1d(x_0), np.atleast_1d(u_0))
    A, B = np.asarray(df['dfdx']), np.asarray(df['dfdu'])
    if discrete_dynamics:
        Ad, Bd = discretize_linear_system(A, B, model.dt, exact=True)
        Ad, Bd = np.asarray(Ad), np.asarray(Bd)
        P = np.asarray(solve_dare(Ad, Bd, Q, R))
        btp = Bd.T @ P
        gain = np.linalg.solve(btp @ Bd + R, btp @ Ad)
    else:
        P = np.asarray(solve_care(A, B, Q, R))
        gain = np.linalg.solve(R, B.T @ P)
    return gain
