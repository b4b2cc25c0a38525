"""Linear MPC — rebuild of controllers/mpc/linear_mpc.py (259 LoC).

Same skeleton as MPC but with exact-discretized LTI dynamics linearized once
at (X_EQ, U_EQ) (linear_mpc.py:71-93). The reference solves a conic program
via qrqp/qpoases; here the dynamics function is the affine map

    x+ = X_EQ + Ad (x - X_EQ) + Bd (u - U_EQ)

whose Jacobians are constant, so the parent's SQP converges in exactly one
iteration — a single ADMM QP per control step, matching the conic-solver
structure of the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.lqr.lqr_utils import \
    discretize_linear_system
from safe_control_gym_tpu.controllers.mpc.mpc import MPC
from safe_control_gym_tpu.controllers.mpc.mpc_utils import \
    compute_discrete_lqr_gain_from_cont_linear_system

__all__ = ['LinearMPC']


class LinearMPC(MPC):
    """MPC with the linearized prior model."""

    def __init__(self, env_func, horizon: int = 5, q_mpc: list = [1],
                 r_mpc: list = [1], warmstart: bool = True,
                 soft_constraints: bool = False, soft_penalty: float = 10000,
                 constraint_tol: float = 1e-6, solver: str = 'qp',
                 **kwargs):
        # One QP per step: a single SQP iteration is exact for LTI dynamics.
        kwargs.setdefault('sqp_iters', 1)
        super().__init__(env_func, horizon=horizon, q_mpc=q_mpc, r_mpc=r_mpc,
                         warmstart=warmstart, soft_constraints=soft_constraints,
                         soft_penalty=soft_penalty,
                         constraint_tol=constraint_tol, solver=solver,
                         **kwargs)

    def set_dynamics_func(self):
        """LTI dynamics from exact discretization at the equilibrium
        (linear_mpc.py:71-93)."""
        df = self.model.df_func(x=self.X_EQ, u=self.U_EQ)
        dfdx = np.asarray(df['dfdx'])
        dfdu = np.asarray(df['dfdu'])
        self.dfdx, self.dfdu = dfdx, dfdu
        Ad, Bd = discretize_linear_system(dfdx, dfdu, self.dt, exact=True)
        self.Ad, self.Bd = np.asarray(Ad), np.asarray(Bd)
        self.lqr_gain, _, _, self.P = \
            compute_discrete_lqr_gain_from_cont_linear_system(
                dfdx, dfdu, self.Q, self.R, self.dt)
        Ad_j = jnp.asarray(self.Ad, jnp.float32)
        Bd_j = jnp.asarray(self.Bd, jnp.float32)
        X_EQ = jnp.asarray(self.X_EQ, jnp.float32)
        U_EQ = jnp.asarray(self.U_EQ, jnp.float32)

        def linear_dynamics(x, u):
            return X_EQ + Ad_j @ (x - X_EQ) + Bd_j @ (u - U_EQ)

        self.dynamics_func = linear_dynamics
        self.linear_dynamics_func = linear_dynamics
