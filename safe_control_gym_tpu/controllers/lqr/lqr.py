"""Linear Quadratic Regulator — parity with controllers/lqr/lqr.py:1-64.

Linearize the analytic prior at (X_EQ, U_EQ), discretize, solve the DARE
(on-device doubling iteration instead of scipy), apply the static gain.
"""

from __future__ import annotations

import numpy as np

from safe_control_gym_tpu.controllers.base_controller import BaseController
from safe_control_gym_tpu.controllers.lqr.lqr_utils import (
    compute_lqr_gain, get_cost_weight_matrix)
from safe_control_gym_tpu.envs.benchmark_env import Task

__all__ = ['LQR']


class LQR(BaseController):
    """Linear quadratic regulator."""

    def __init__(self,
                 env_func,
                 q_lqr: list = None,
                 r_lqr: list = None,
                 discrete_dynamics: bool = True,
                 **kwargs):
        super().__init__(env_func, **kwargs)
        self.env = env_func()
        self.model = self.get_prior(self.env)
        self.discrete_dynamics = discrete_dynamics
        self.Q = get_cost_weight_matrix(q_lqr, self.model.nx)
        self.R = get_cost_weight_matrix(r_lqr, self.model.nu)
        self.gain = compute_lqr_gain(self.model, self.model.X_EQ,
                                     self.model.U_EQ, self.Q, self.R,
                                     self.discrete_dynamics)

    def reset(self):
        self.env.reset()

    def close(self):
        self.env.close()

    def select_action(self, obs, info=None):
        step = self.extract_step(info)
        if self.env.TASK == Task.STABILIZATION:
            return -self.gain @ (obs - self.env.X_GOAL) + np.atleast_1d(self.model.U_EQ)
        elif self.env.TASK == Task.TRAJ_TRACKING:
            return (-self.gain @ (obs - self.env.X_GOAL[step])
                    + np.atleast_1d(self.model.U_EQ))
