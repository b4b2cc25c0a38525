"""Abstract Model Predictive Safety Certification (MPSC) — rebuild of
safety_filters/mpsc/mpsc.py (258 LoC reference).

Wabersich-Zeilinger tube-MPC certification: maintain a nominal trajectory z
and inputs v; ``certify_action`` clips the proposed input and solves the
tube MPC; on infeasibility it replays the previous plan step ``k_inf`` with
LQR tube feedback, else falls back to pure LQR, flagging success=False
(mpsc.py:171-226). Results bookkeeping: feasible / kinf / uncertified /
certified / correction (mpsc.py:228-235).

TPU-native division of labor
----------------------------
This abstract class is deliberately thin host-side orchestration: it holds
the mutable per-episode bookkeeping (previous plan ``z_prev``/``v_prev``,
the infeasibility counter ``kinf``, the results_dict lists) and the
fallback ladder, all of which are control-flow on scalars and tiny
vectors where XLA buys nothing. Everything numerical lives in the concrete
subclass (``linear_mpsc.py``): the tube-MPC solve there is a single jitted
SQP+ADMM program in delta coordinates (one XLA dispatch per
``solve_optimization`` call), the RPI-set synthesis is on-device penalized
log-det descent, and the tightening is exact interval arithmetic. Keeping
the ladder on host also means an infeasible solve costs one matvec — no
recompilation and no extra device round-trips beyond the failed solve
itself.

Where the reference builds its optimizer once with CasADi ``Opti`` and
mutates parameter values per call, the jitted solve here is re-entrant and
stateless: warm starts are threaded through explicit arguments, so the
same compiled executable certifies any number of concurrent runs (and can
be ``vmap``-ped over a batch of states for controller-evaluation sweeps —
something a stateful Opti instance fundamentally cannot do).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from safe_control_gym_tpu.controllers.lqr.lqr_utils import (
    compute_lqr_gain, get_cost_weight_matrix)
from safe_control_gym_tpu.controllers.mpc.mpc_utils import reset_constraints
from safe_control_gym_tpu.safety_filters.base_safety_filter import \
    BaseSafetyFilter
from safe_control_gym_tpu.safety_filters.mpsc.mpsc_cost_function.one_step_cost import \
    ONE_STEP_COST
from safe_control_gym_tpu.safety_filters.mpsc.mpsc_utils import (
    Cost_Function, get_trajectory_on_horizon)

__all__ = ['MPSC']


class MPSC(BaseSafetyFilter, ABC):
    """Abstract Model Predictive Safety Certification class."""

    def __init__(self,
                 env_func,
                 horizon: int = 10,
                 q_lin: list = None,
                 r_lin: list = None,
                 integration_algo: str = 'rk4',
                 warmstart: bool = True,
                 additional_constraints: list = None,
                 use_terminal_set: bool = True,
                 cost_function: Cost_Function = Cost_Function.ONE_STEP_COST,
                 **kwargs):
        self.horizon = int(horizon)
        self.integration_algo = integration_algo
        self.warmstart = warmstart
        self.use_terminal_set = use_terminal_set
        super().__init__(env_func, **kwargs)
        np.random.seed(self.seed)
        # Envs (mpsc.py:62-67).
        self.env = env_func(normalized_rl_action_space=False)
        self.training_env = env_func(randomized_init=True, init_state=None,
                                     cost='quadratic',
                                     normalized_rl_action_space=False)
        self.reset()
        self.dt = self.model.dt
        self.Q = get_cost_weight_matrix(q_lin, self.model.nx)
        self.R = get_cost_weight_matrix(r_lin, self.model.nu)
        self.X_EQ = np.zeros(self.model.nx)
        self.U_EQ = np.atleast_1d(np.asarray(self.model.U_EQ))
        self.set_dynamics()
        # NEGATIVE-feedback gain (u = K x) (mpsc.py:84).
        self.lqr_gain = -compute_lqr_gain(self.model, self.X_EQ, self.U_EQ,
                                          self.Q, self.R,
                                          discrete_dynamics=True)
        self.terminal_set = None
        if additional_constraints is None:
            additional_constraints = []
        self.additional_constraints = additional_constraints
        (self.constraints, self.state_constraints_sym,
         self.input_constraints_sym) = reset_constraints(
            (self.env.constraints.constraints if self.env.constraints else [])
            + additional_constraints)
        if cost_function == Cost_Function.ONE_STEP_COST:
            self.cost_function = ONE_STEP_COST()
        else:
            raise NotImplementedError(
                f'The MPSC cost function {cost_function} has not been implemented')

    @abstractmethod
    def set_dynamics(self):
        raise NotImplementedError

    @abstractmethod
    def setup_optimizer(self):
        raise NotImplementedError

    def before_optimization(self, obs):
        return

    @abstractmethod
    def solve_optimization(self, obs, uncertified_action, iteration=None):
        raise NotImplementedError

    def certify_action(self, current_state, uncertified_action, info=None):
        """Algorithm 1 from Wabersich 2019 (mpsc.py:171-226)."""
        uncertified_action = np.clip(uncertified_action,
                                     self.env.physical_action_bounds[0],
                                     self.env.physical_action_bounds[1])
        self.results_dict['uncertified_action'].append(uncertified_action)
        success = True
        self.before_optimization(current_state)
        iteration = self.extract_step(info)
        action, feasible = self.solve_optimization(current_state,
                                                   uncertified_action,
                                                   iteration)
        self.results_dict['feasible'].append(feasible)
        nx, nu = self.model.nx, self.model.nu
        in_con = self.constraints.input_constraints[0]
        if feasible:
            self.kinf = 0
            certified_action = action
        else:
            self.kinf += 1
            # U_EQ is added in BOTH integration modes: v is a delta input
            # everywhere in the optimizer (the reference's own certified
            # path uses next_u = v + U_EQ + K(.) for rk4 AND LTI,
            # linear_mpsc.py:305,321) — its fallback adding U_EQ only for
            # LTI (mpsc.py:204-215) is a reference bug that commands
            # near-zero thrust on quadrotors and crashes them into the
            # very constraint the filter protects.
            if (self.kinf <= self.horizon - 1 and self.z_prev is not None
                    and self.v_prev is not None):
                action = (np.squeeze(self.v_prev[:, self.kinf])
                          + np.squeeze(self.U_EQ)
                          + np.squeeze(self.lqr_gain @ (
                              current_state.reshape(nx, 1)
                              - self.z_prev[:, self.kinf].reshape(nx, 1))))
                action = np.squeeze(action)
                clipped_action = np.clip(action, in_con.lower_bounds,
                                         in_con.upper_bounds)
                if np.linalg.norm(clipped_action - action) >= 0.01:
                    success = False
                certified_action = clipped_action
            else:
                action = np.squeeze(self.lqr_gain @ (current_state - self.X_EQ))
                action = action + np.squeeze(self.U_EQ)
                clipped_action = np.clip(action, in_con.lower_bounds,
                                         in_con.upper_bounds)
                success = False
                certified_action = clipped_action
        certified_action = np.squeeze(np.array(certified_action))
        self.results_dict['kinf'].append(self.kinf)
        self.results_dict['certified_action'].append(certified_action)
        self.results_dict['correction'].append(
            np.linalg.norm(certified_action - uncertified_action))
        return certified_action, success

    def setup_results_dict(self):
        self.results_dict = {'feasible': [], 'kinf': [],
                             'uncertified_action': [], 'certified_action': [],
                             'correction': []}

    def close(self):
        self.env.close()
        self.training_env.close()

    def reset(self):
        self.model = self.get_prior(self.env, self.prior_info)
        self.env.reset()
        self.training_env.reset()
        self.reset_before_run()

    def reset_before_run(self, env=None):
        self.z_prev = None
        self.v_prev = None
        self.kinf = self.horizon - 1
        self.setup_results_dict()
