"""Real-time-iteration MPC — the TPU-native equivalent of
controllers/mpc/mpc_acados.py (228 LoC reference).

The reference generates C code via acados (AcadosModel from the CasADi
dynamics, LINEAR_LS cost, HPIPM + SQP/SQP_RTI, ERK integrator,
mpc_acados.py:70-175). On TPU the compile-to-native step is XLA itself:
this class is the parent MPC with acados' SQP_RTI semantics — a fixed single
SQP iteration per control step, warm-started by the shifted previous
solution — so each ``select_action`` is exactly one pre-compiled
linearize+QP kernel, the same real-time structure HPIPM provides on CPU.

Config parity: ``use_RTI`` selects 1 SQP iteration (mpc_acados.py:164-175);
otherwise a small fixed iteration budget mirrors acados' SQP mode.
"""

from __future__ import annotations

from safe_control_gym_tpu.controllers.mpc.mpc import MPC

__all__ = ['MPC_ACADOS']


class MPC_ACADOS(MPC):
    """MPC with real-time-iteration (acados-equivalent) solve schedule."""

    def __init__(self, env_func, horizon: int = 5, q_mpc: list = [1],
                 r_mpc: list = [1], warmstart: bool = True,
                 soft_constraints: bool = False, soft_penalty: float = 10000,
                 constraint_tol: float = 1e-6, use_RTI: bool = False,
                 **kwargs):
        kwargs.setdefault('sqp_iters', 1 if use_RTI else 5)
        super().__init__(env_func, horizon=horizon, q_mpc=q_mpc, r_mpc=r_mpc,
                         warmstart=warmstart,
                         soft_constraints=soft_constraints,
                         soft_penalty=soft_penalty,
                         constraint_tol=constraint_tol, **kwargs)
        self.use_RTI = use_RTI
