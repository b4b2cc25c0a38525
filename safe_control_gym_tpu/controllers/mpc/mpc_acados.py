"""Real-time-iteration MPC — the TPU-native equivalent of
controllers/mpc/mpc_acados.py (228 LoC reference).

The reference generates C code via acados (AcadosModel from the CasADi
dynamics, LINEAR_LS cost, HPIPM + SQP/SQP_RTI, ERK integrator,
mpc_acados.py:70-175). On TPU the compile-to-native step is XLA itself;
this class mirrors acados' *semantics*, not just its iteration cap:

* **LINEAR_LS cost scaling** — acados weighs the stage residuals with
  ``W = blkdiag(Q/dt, R/dt)`` while the terminal weight ``W_e`` stays the
  unscaled ``Q`` (or DARE ``P``) (mpc_acados.py:104-117). The 1/dt stage
  scaling makes the discrete cost approximate the continuous-time integral
  cost independent of the control rate; relative stage-vs-terminal
  weighting therefore differs from the plain MPC parent by a factor dt.
* **ERK integrator** — acados integrates the *continuous* explicit
  dynamics with an explicit Runge-Kutta scheme over tf/N
  (``integrator_type='ERK'``, mpc_acados.py:166). The parent's
  ``rk_discrete`` RK4 over dt is exactly that scheme; the option is
  validated here and anything else (IRK/GNSF — never used by the
  reference) raises.
* **Box constraints only** — acados' lbx/ubx/lbu/ubu interface accepts
  only ``BoundedConstraint``-style boxes; other constraint types raise
  ``ValueError`` (mpc_acados.py:119-136).
* **SQP_RTI** — ``use_RTI`` selects a fixed single warm-started SQP
  iteration per control step (nlp_solver_max_iter=1, mpc_acados.py:164-175)
  so each ``select_action`` is exactly one pre-compiled linearize+QP
  kernel, the real-time structure HPIPM provides on CPU.
"""

from __future__ import annotations

import numpy as np

from safe_control_gym_tpu.controllers.mpc.mpc import MPC
from safe_control_gym_tpu.envs.constraints import BoundedConstraint

__all__ = ['MPC_ACADOS']


class MPC_ACADOS(MPC):
    """MPC with acados' cost/constraint/solve-schedule semantics."""

    def __init__(self, env_func, horizon: int = 5, q_mpc: list = [1],
                 r_mpc: list = [1], warmstart: bool = True,
                 soft_constraints: bool = False, soft_penalty: float = 10000,
                 constraint_tol: float = 1e-6, use_RTI: bool = False,
                 integrator_type: str = 'ERK',
                 **kwargs):
        kwargs.setdefault('sqp_iters', 1 if use_RTI else 5)
        super().__init__(env_func, horizon=horizon, q_mpc=q_mpc, r_mpc=r_mpc,
                         warmstart=warmstart,
                         soft_constraints=soft_constraints,
                         soft_penalty=soft_penalty,
                         constraint_tol=constraint_tol, **kwargs)
        self.use_RTI = use_RTI
        # acados integrator option (mpc_acados.py:166): only the explicit
        # Runge-Kutta path exists (the parent's RK4 over dt IS ERK); the
        # reference never configures IRK/GNSF and neither do we.
        if integrator_type != 'ERK':
            raise ValueError(
                f"integrator_type '{integrator_type}' is not supported; "
                "only 'ERK' (explicit RK4) is implemented — the reference "
                'always uses ERK (mpc_acados.py:166).')
        self.integrator_type = integrator_type
        # acados' box-only constraint interface (mpc_acados.py:119-136).
        for con in (self.constraints.state_constraints
                    + self.constraints.input_constraints):
            if not isinstance(con, BoundedConstraint):
                raise ValueError(
                    'Constraint type not supported. Support only for '
                    'BoundedConstraint and descendants. Check '
                    'constraints.py.')
        # LINEAR_LS stage-cost scaling W = blkdiag(Q/dt, R/dt); terminal
        # W_e stays Q (or P) (mpc_acados.py:104-117). Consumed by the
        # parent's setup_optimizer when assembling the QP Hessian.
        self.Q_stage = np.asarray(self.Q) / self.dt
        self.R_stage = np.asarray(self.R) / self.dt
