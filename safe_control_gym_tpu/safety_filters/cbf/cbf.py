"""Control-barrier-function QP safety filter — rebuild of
safety_filters/cbf/cbf.py (336 LoC reference).

The CBF-QP: minimize ||u_des - u||^2 (+ slack penalty) subject to

    -alpha(h(x)) - L_f h(x, u) <= slack,  input constraints,  slack >= 0

(cbf.py:105-162). The Lie derivative is computed by JAX autodiff instead of
CasADi gradients (cbf.py:85-94); since the dynamics are control-affine
(checked numerically, cbf.py:96-103), the constraint is linear in u and the
tiny QP solves with the jitted ADMM kernel — one fused device call per
certification, batchable under vmap.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.ops.qp import admm_qp
from safe_control_gym_tpu.safety_filters.base_safety_filter import \
    BaseSafetyFilter
from safe_control_gym_tpu.safety_filters.cbf.cbf_utils import (
    cartesian_product, cbf_cartpole, linear_function)

__all__ = ['CBF']


class CBF(BaseSafetyFilter):
    """Control Barrier Function QP filter."""

    def __init__(self, env_func, slope: float = 0.1,
                 soft_constrained: bool = True,
                 slack_weight: float = 10000.0,
                 slack_tolerance: float = 1.0e-3,
                 feas_tol: float = 1.0e-3, **kwargs):
        super().__init__(env_func=env_func, **kwargs)
        self.env = self.env_func()
        self.slope = slope
        self.soft_constrained = soft_constrained
        self.slack_weight = slack_weight
        self.slack_tolerance = slack_tolerance
        # QP feasibility threshold on the final ADMM primal residual — a
        # real config knob like MPC/MPSC's feas_tol, not a hard-coded
        # constant (a mis-declared 'feasible' is a certification false
        # positive).
        self.feas_tol = float(feas_tol)

        input_constraints = self.env.constraints.input_constraints
        state_constraints = self.env.constraints.state_constraints
        if len(input_constraints) > 1 or len(state_constraints) > 1:
            raise NotImplementedError("CBF currently can't handle more than 1 constraint")
        if len(input_constraints) == 0:
            raise Exception('CBF requires at least 1 input constraint')
        if len(state_constraints) == 0:
            raise Exception('CBF requires at least 1 state constraint')
        self.input_constraint = input_constraints[0]
        self.state_constraint = state_constraints[0]

        self.reset()

        if self.env.NAME == 'cartpole':
            self.state_limits = [
                min(abs(self.state_constraint.upper_bounds[i]),
                    abs(self.state_constraint.lower_bounds[i]))
                for i in range(self.model.nx)]
            self.cbf = cbf_cartpole(self.state_limits)
        else:
            raise NotImplementedError(
                '[Error] Currently CBF is only implemented for the cartpole system.')

        assert self.is_control_affine()
        self.linear_func = linear_function(self.slope)
        self.setup_optimizer()

    # ------------------------------------------------------------------
    def get_lie_derivative(self):
        """L_f h(x, u) = grad h(x) . f(x, u) via autodiff (cbf.py:85-94)."""
        fc = self.model.fc_fn
        cbf = self.cbf

        def lie(x, u):
            return jax.grad(cbf)(x) @ fc(x, u)

        return lie

    def is_control_affine(self) -> bool:
        """Numerical control-affineness check (cbf.py:96-103): d^2 f/du^2 = 0."""
        fc = self.model.fc_fn
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            self.model.nx), jnp.float32) * 0.1
        hess = jax.jacfwd(jax.jacfwd(fc, argnums=1), argnums=1)(
            x, jnp.ones(self.model.nu))
        return bool(np.allclose(np.asarray(hess), 0.0, atol=1e-5))

    # ------------------------------------------------------------------
    def setup_optimizer(self):
        """Compile the jitted CBF-QP (cbf.py:105-162)."""
        nu = self.model.nu
        lie = self.get_lie_derivative()
        cbf = self.cbf
        slope = float(self.slope)
        soft = bool(self.soft_constrained)
        slack_weight = float(self.slack_weight)
        feas_tol = float(self.feas_tol)
        A_u = jnp.asarray(self.input_constraint.A, jnp.float32)
        b_u = jnp.asarray(self.input_constraint.b, jnp.float32)
        m_u = A_u.shape[0]
        big = 1e8

        def solve(x, u_des, nn_a, nn_b):
            # Control-affine decomposition: L(x,u) = a0 + b0'u.
            a0 = lie(x, jnp.zeros(nu))
            b0 = jax.jacfwd(lie, argnums=1)(x, jnp.zeros(nu))
            h = cbf(x)
            bt = b0 + nn_a
            rhs = slope * h + a0 + nn_b
            # CBF row: -bt'u <= rhs (+ slack). The slack is eliminated
            # analytically (exact quadratic penalty): for any u the optimal
            # slack is max(0, -bt'u - rhs), so the soft problem is
            #   min 0.5||u - u_des||^2 + w max(0, -bt'u - rhs)^2  s.t. A_u u <= b_u
            # solved as two candidate QPs (inactive / active penalty branch).
            # Candidate 1: hard-CBF QP.
            A1 = jnp.concatenate([(-bt)[None, :], A_u], axis=0)
            u1b = jnp.concatenate([rhs[None], b_u])
            l1 = jnp.full((1 + m_u,), -big)
            P1 = jnp.eye(nu)
            q1 = -u_des
            sol1 = admm_qp(P1, q1, A1, l1, u1b, rho=1.0, iters=300,
                           polish=True)
            # Candidate 2: penalty-active QP (soft mode only).
            P2 = jnp.eye(nu) + 2.0 * slack_weight * jnp.outer(bt, bt)
            q2 = -u_des + 2.0 * slack_weight * rhs * bt
            sol2 = admm_qp(P2, q2, A_u, jnp.full((m_u,), -big), b_u,
                           rho=1.0, iters=300, polish=True)
            slack2 = jnp.clip(-(bt @ sol2.x) - rhs, 0.0, None)
            cand1_ok = sol1.prim_res < feas_tol
            if soft:
                u_sol = jnp.where(cand1_ok, sol1.x, sol2.x)
                slack = jnp.where(cand1_ok, 0.0, slack2)
                res = jnp.where(cand1_ok, sol1.prim_res, sol2.prim_res)
            else:
                u_sol = sol1.x
                slack = jnp.zeros(())
                res = sol1.prim_res
            return u_sol, slack, res

        self._solve_raw = solve
        self._solve_jit = jax.jit(solve)
        self._solve_batch_jit = None

    def solve_optimization(self, current_state, uncertified_action
                           ) -> Tuple[np.ndarray, bool]:
        """One certification QP (cbf.py:164-215)."""
        nn_a, nn_b = self._nn_terms(current_state)
        # Numpy in (ships with the dispatch), ONE device_get out — eager
        # per-array conversions each pay a tunnel round-trip (see
        # MPC.select_action latency note).
        u, slack, res = self._solve_jit(
            np.asarray(current_state, np.float32),
            np.asarray(np.atleast_1d(uncertified_action), np.float32),
            nn_a, nn_b)
        certified_action, slack_v, res_v = jax.device_get((u, slack, res))
        feasible = bool(np.isfinite(float(res_v))
                        and float(res_v) < self.feas_tol)
        if self.soft_constrained and feasible:
            if float(slack_v) > self.slack_tolerance:
                feasible = False
        return np.asarray(certified_action), feasible

    def _nn_terms(self, state):
        """Learned Lie-derivative residual terms (zero for plain CBF)."""
        return jnp.zeros((self.model.nu,)), jnp.zeros(())

    def _nn_terms_batch(self, states):
        """(B, nu) / (B,) residual terms for a batch (zero for plain CBF)."""
        B = states.shape[0]
        return jnp.zeros((B, self.model.nu)), jnp.zeros((B,))

    # ------------------------------------------------------------------
    def certify_action_batch(self, states, actions):
        """Certify B (state, action) pairs in ONE vmapped device call.

        Same pattern as ``LinearMPSC.certify_action_batch`` and
        ``MPC.select_action_batch``: the whole two-candidate CBF-QP
        (hard branch + analytic-penalty branch) vmaps over the batch; no
        reference equivalent (one qpOASES process per call, cbf.py:105-162).
        Residual terms (CBF-NN) are evaluated for the whole batch with one
        MLP application outside the trace, so updated network params never
        go stale inside the compiled program. Composes with
        ``shard_over(mesh)`` to split the batch across chips.

        Returns (certified_actions (B, nu), feasible (B,) bool).
        """
        lo, hi = self.env.physical_action_bounds
        states = np.asarray(states, np.float32)
        actions = np.clip(np.atleast_2d(np.asarray(actions, np.float32)),
                          lo, hi).astype(np.float32)
        if self._solve_batch_jit is None:
            self._solve_batch_jit = jax.jit(jax.vmap(self._solve_raw))
        nn_a, nn_b = self._nn_terms_batch(states)
        args = self._place_batched(states, actions, jnp.asarray(nn_a),
                                   jnp.asarray(nn_b))
        u, slack, res = jax.device_get(self._solve_batch_jit(*args))
        feasible = np.isfinite(res) & (res < self.feas_tol)
        if self.soft_constrained:
            feasible &= np.asarray(slack) <= self.slack_tolerance
        return np.asarray(u), feasible

    def shard_over(self, mesh, axis_name: str = 'data'):
        """Distribute ``certify_action_batch`` over a device mesh (batch
        axis sharded, QP constants replicated — embarrassingly parallel;
        mirrors LinearMPSC.shard_over)."""
        self._solve_mesh = mesh
        self._solve_mesh_axis = axis_name
        self._solve_batch_jit = None

    def _place_batched(self, *arrays):
        mesh = getattr(self, '_solve_mesh', None)
        if mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec(self._solve_mesh_axis))
        return tuple(jax.device_put(a, sh) for a in arrays)

    def certify_action(self, current_state, uncertified_action, info=None
                       ) -> Tuple[np.ndarray, bool]:
        """(cbf.py:217-242)."""
        uncertified_action = np.clip(uncertified_action,
                                     self.env.physical_action_bounds[0],
                                     self.env.physical_action_bounds[1])
        self.results_dict['uncertified_action'].append(uncertified_action)
        certified_action, success = self.solve_optimization(
            current_state, uncertified_action)
        self.results_dict['feasible'].append(success)
        certified_action = np.squeeze(np.array(certified_action))
        self.results_dict['certified_action'].append(certified_action)
        self.results_dict['correction'].append(
            np.linalg.norm(certified_action - uncertified_action))
        return certified_action, success

    # ------------------------------------------------------------------
    def is_cbf(self, num_points: int = 100, tolerance: float = 0.01):
        """Gridded validity check (cbf.py:244-318)."""
        epsilon = 1e-6
        max_bounds = np.array(self.state_limits) + tolerance
        min_bounds = -max_bounds
        nx, nu = self.model.nx, self.model.nu
        num_points = max(2 * nx, num_points + num_points % (2 * nx))
        num_points_per_dim = num_points // nx
        states_to_sample = [np.linspace(min_bounds[i], max_bounds[i],
                                        num_points_per_dim)
                            for i in range(nx)]
        states_to_check = cartesian_product(*states_to_sample)
        control_input = np.ones((nu,))
        num_infeasible = 0
        num_infeasible_inside = 0
        infeasible_states = []
        for state in states_to_check:
            _, success = self.certify_action(state, control_input)
            if not success:
                infeasible_states.append(state)
                num_infeasible += 1
                if float(self.cbf(jnp.asarray(state, jnp.float32))) > epsilon:
                    num_infeasible_inside += 1
        valid_cbf = num_infeasible_inside == 0
        return valid_cbf, infeasible_states

    def setup_results_dict(self):
        self.results_dict = {'feasible': [], 'uncertified_action': [],
                             'certified_action': [], 'correction': []}

    def reset(self):
        self.model = self.get_prior(self.env, self.prior_info)
        self.env.reset()
        self.setup_results_dict()

    def close(self):
        self.env.close()
