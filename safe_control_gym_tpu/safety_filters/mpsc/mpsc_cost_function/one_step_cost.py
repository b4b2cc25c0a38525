"""One-step MPSC cost: || u_L - next_u ||^2
(mpsc_cost_function/one_step_cost.py:9-23 parity).

``next_u = v_0 + U_EQ + K (x_init - z_0)`` is affine in (z_0, v_0), so the
cost is quadratic in the first-step decision variables; get_cost returns the
corresponding (M, c0) with cost = ||c0 + M [z0; v0]||^2.
"""

from __future__ import annotations

import numpy as np

from safe_control_gym_tpu.safety_filters.mpsc.mpsc_cost_function.abstract_cost import \
    MPSC_COST

__all__ = ['ONE_STEP_COST']


class ONE_STEP_COST(MPSC_COST):
    """Standard one-step MPSC cost function."""

    def get_cost(self, opti_dict):
        """Quadratic cost data in d = [z0; v0]:
        e = (u_L - U_EQ - K x_init) + K z0 - v0, cost = e'e."""
        K = np.asarray(opti_dict['lqr_gain'])
        nu, nx = K.shape
        M = np.concatenate([K, -np.eye(nu)], axis=1)  # (nu, nx+nu)
        return M
