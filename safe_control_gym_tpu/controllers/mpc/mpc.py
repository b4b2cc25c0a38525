"""Nonlinear Model Predictive Control — TPU-native rebuild of
controllers/mpc/mpc.py (375 LoC reference).

The reference builds a CasADi Opti multiple-shooting NLP solved by IPOPT /
qrsqp on the host C++ side (mpc.py:170-246). Here the whole
linearize -> QP -> update loop is an on-device SQP:

* RK4-discretized prior dynamics (rk_discrete parity, mpc_utils.py:42-64);
* per-SQP-iteration Jacobians/defects via vmapped ``jax.jacfwd``;
* the sparse multiple-shooting QP (states + inputs + shared slack variables,
  matching the reference's variable layout mpc.py:185-241) solved by the
  OSQP-style ADMM kernel in :mod:`safe_control_gym_tpu.ops.qp` with a single
  Cholesky factorization per iteration;
* fixed SQP iteration count under ``lax.scan`` -> ONE jitted solve per
  control step; warm-started by the shifted previous solution
  (mpc.py:285-292).

Infeasibility handling mirrors the reference's fallback ladder
(mpc.py:298-316): feasibility is judged by the final QP primal residual.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base_controller import BaseController
from safe_control_gym_tpu.controllers.lqr.lqr_utils import (
    discretize_linear_system, get_cost_weight_matrix)
from safe_control_gym_tpu.controllers.mpc.mpc_utils import (
    compute_discrete_lqr_gain_from_cont_linear_system, reset_constraints,
    rk_discrete)
from safe_control_gym_tpu.envs.benchmark_env import Task
from safe_control_gym_tpu.envs.constraints import (GENERAL_CONSTRAINTS,
                                                   create_constraint_list)
from safe_control_gym_tpu.ops.qp import admm_qp

__all__ = ['MPC']


class MPC(BaseController):
    """MPC with full nonlinear model, solved on device by SQP+ADMM."""

    def __init__(self,
                 env_func,
                 horizon: int = 5,
                 q_mpc: list = [1],
                 r_mpc: list = [1],
                 warmstart: bool = True,
                 soft_constraints: bool = False,
                 soft_penalty: float = 10000,
                 constraint_tol: float = 1e-6,
                 use_lqr_gain_and_terminal_cost: bool = False,
                 solver: str = 'sqp',
                 sqp_iters: int = 3,
                 qp_iters: int = 4000,
                 feas_tol: float = 1e-2,
                 feas_tol_relative: bool = True,
                 additional_constraints: Optional[list] = None,
                 **kwargs):
        super().__init__(env_func=env_func, **kwargs)
        self.env = env_func()
        if additional_constraints is not None:
            additional = create_constraint_list(
                additional_constraints, GENERAL_CONSTRAINTS, self.env).constraints
            self.additional_constraints = additional
            (self.constraints, self.state_constraints_sym,
             self.input_constraints_sym) = reset_constraints(
                (self.env.constraints.constraints if self.env.constraints else [])
                + additional)
        else:
            (self.constraints, self.state_constraints_sym,
             self.input_constraints_sym) = reset_constraints(
                self.env.constraints.constraints if self.env.constraints else [])
            self.additional_constraints = []

        self.model = self.get_prior(self.env)
        self.dt = self.model.dt
        self.T = int(horizon)
        self.Q = get_cost_weight_matrix(q_mpc, self.model.nx)
        self.R = get_cost_weight_matrix(r_mpc, self.model.nu)
        self.constraint_tol = constraint_tol
        self.soft_constraints = soft_constraints
        self.soft_penalty = soft_penalty
        self.warmstart = warmstart
        self.use_lqr_gain_and_terminal_cost = use_lqr_gain_and_terminal_cost
        self.solver = solver
        self.sqp_iters = int(sqp_iters)
        self.qp_iters = int(qp_iters)
        # Feasibility is judged by the final ADMM primal residual. With
        # ``feas_tol_relative`` the tolerance scales with the problem data
        # (OSQP's eps_abs + eps_rel * scale convention) so large states /
        # references don't get spuriously declared infeasible.
        self.feas_tol = float(feas_tol)
        self.feas_tol_relative = bool(feas_tol_relative)
        self.X_EQ = np.atleast_1d(np.asarray(self.model.X_EQ))
        self.U_EQ = np.atleast_1d(np.asarray(self.model.U_EQ))
        if self.env.TASK == Task.STABILIZATION:
            self.x_goal = self.env.X_GOAL
        elif self.env.TASK == Task.TRAJ_TRACKING:
            self.traj = self.env.X_GOAL.T
        self.terminate_loop = False

    # ------------------------------------------------------------------
    def add_constraints(self, constraints):
        (self.constraints, self.state_constraints_sym,
         self.input_constraints_sym) = reset_constraints(
            constraints + self.constraints.constraints)

    def remove_constraints(self, constraints):
        old = self.constraints.constraints
        for c in constraints:
            assert c in old, ValueError('This constraint is not in the current list of constraints')
            old.remove(c)
        (self.constraints, self.state_constraints_sym,
         self.input_constraints_sym) = reset_constraints(old)

    def close(self):
        self.env.close()

    def reset_before_run(self, obs=None, info=None, env=None):
        self.x_prev = None
        self.u_prev = None
        self._qp_warm = None
        super().reset_before_run(obs, info, env)

    def reset(self):
        """Build dynamics + the jitted SQP solver (mpc.py:132-139)."""
        self.set_dynamics_func()
        self.setup_optimizer(self.solver)
        self.reset_before_run()

    # ------------------------------------------------------------------
    def set_dynamics_func(self):
        """Discrete dynamics + ancillary LQR gain/terminal cost
        (mpc.py:141-168)."""
        df = self.model.df_func(x=self.X_EQ, u=self.U_EQ)
        dfdx = np.asarray(df['dfdx'])
        dfdu = np.asarray(df['dfdu'])
        self.dfdx, self.dfdu = dfdx, dfdu
        Ad, Bd = discretize_linear_system(dfdx, dfdu, self.dt, exact=True)
        self.Ad, self.Bd = np.asarray(Ad), np.asarray(Bd)
        self.lqr_gain, _, _, self.P = \
            compute_discrete_lqr_gain_from_cont_linear_system(
                dfdx, dfdu, self.Q, self.R, self.dt)
        self.dynamics_func = rk_discrete(self.model.fc_fn, self.model.nx,
                                         self.model.nu, self.dt)

    # -- constraint stacks ----------------------------------------------
    def _stacked_state_con(self):
        fns = self.state_constraints_sym
        if not fns:
            return None, 0
        def g(x):
            return jnp.concatenate([jnp.atleast_1d(f(x)) for f in fns])
        ms = int(sum(np.atleast_1d(np.asarray(f(jnp.zeros(self.model.nx)))).shape[0]
                     for f in fns))
        return g, ms

    def _stacked_input_con(self):
        fns = self.input_constraints_sym
        if not fns:
            return None, 0
        def h(u):
            return jnp.concatenate([jnp.atleast_1d(f(u)) for f in fns])
        mu = int(sum(np.atleast_1d(np.asarray(f(jnp.zeros(self.model.nu)))).shape[0]
                     for f in fns))
        return h, mu

    # ------------------------------------------------------------------
    def setup_optimizer(self, solver='sqp'):
        """Assemble the static QP structure and compile the SQP solve
        (replaces Opti construction, mpc.py:170-246)."""
        nx, nu, T = self.model.nx, self.model.nu, self.T
        g_fn, ms = self._stacked_state_con()
        h_fn, mu = self._stacked_input_con()
        soft = bool(self.soft_constraints)
        n_slack = (ms + mu) if soft else 0
        nX = (T + 1) * nx
        nU = T * nu
        n_z = nX + nU + n_slack
        # Rows: init eq, dynamics eq, state ineq ((T+1)*ms), input ineq
        # (T*mu), slack >= 0.
        m_rows = nx + T * nx + (T + 1) * ms + T * mu + n_slack

        # Constant cost Hessian (mpc.py:192-210): stage Q, terminal Q or P,
        # inputs R, slack quadratic penalty. Stage weights are overridable
        # by subclasses with different stage/terminal scaling conventions
        # (MPC_ACADOS's LINEAR_LS W = blkdiag(Q/dt, R/dt) with terminal W_e
        # left unscaled, reference mpc_acados.py:104-117).
        Q_stage = np.asarray(getattr(self, 'Q_stage', self.Q))
        R_stage = np.asarray(getattr(self, 'R_stage', self.R))
        Qterm = self.P if self.use_lqr_gain_and_terminal_cost else self.Q
        P_diagblocks = ([Q_stage] * T + [Qterm] + [R_stage] * T
                        + ([np.eye(n_slack) * 2 * self.soft_penalty]
                           if n_slack else []))
        P_qp = np.zeros((n_z, n_z))
        ofs = 0
        for blk in P_diagblocks:
            d = blk.shape[0]
            P_qp[ofs:ofs + d, ofs:ofs + d] = blk
            ofs += d
        self._P_qp = jnp.asarray(P_qp, jnp.float32)

        # Index templates for the per-iteration scatter writes (numpy,
        # compile-time constants).
        def block_indices(row0, col0, n_blocks, br, bc, row_stride, col_stride):
            k = np.arange(n_blocks)[:, None, None]
            i = np.arange(br)[None, :, None]
            j = np.arange(bc)[None, None, :]
            rows = row0 + k * row_stride + i
            cols = col0 + k * col_stride + j
            return (np.broadcast_to(rows, (n_blocks, br, bc)).reshape(-1),
                    np.broadcast_to(cols, (n_blocks, br, bc)).reshape(-1))

        r_dyn0 = nx  # after init rows
        self._idx_dynA = block_indices(r_dyn0, 0, T, nx, nx, nx, nx)
        self._idx_dynB = block_indices(r_dyn0, nX, T, nx, nu, nx, nu)
        r_sc0 = nx + T * nx
        if ms:
            self._idx_G = block_indices(r_sc0, 0, T + 1, ms, nx, ms, nx)
        r_ic0 = r_sc0 + (T + 1) * ms
        if mu:
            self._idx_H = block_indices(r_ic0, nX, T, mu, nu, mu, nu)
        r_sl0 = r_ic0 + T * mu

        # Constant base matrix: init identity, +I blocks of dynamics,
        # slack coupling, slack positivity.
        A_base = np.zeros((m_rows, n_z))
        A_base[:nx, :nx] = np.eye(nx)
        for k in range(T):
            A_base[r_dyn0 + k * nx:r_dyn0 + (k + 1) * nx,
                   (k + 1) * nx:(k + 2) * nx] = np.eye(nx)
        if soft and ms:
            for k in range(T + 1):
                A_base[r_sc0 + k * ms:r_sc0 + (k + 1) * ms,
                       nX + nU:nX + nU + ms] = -np.eye(ms)
        if soft and mu:
            for k in range(T):
                A_base[r_ic0 + k * mu:r_ic0 + (k + 1) * mu,
                       nX + nU + ms:nX + nU + ms + mu] = -np.eye(mu)
        if n_slack:
            A_base[r_sl0:r_sl0 + n_slack, nX + nU:nX + nU + n_slack] = \
                np.eye(n_slack)
        self._A_base = jnp.asarray(A_base, jnp.float32)

        # Dynamics enter either as a closed-over function fd(x, u) or — when
        # the subclass defines ``dynamics_func_param`` — as fd(x, u, params)
        # with ``params`` threaded through the jitted solve as a pytree
        # argument. The latter lets data-dependent dynamics (online GP-MPC)
        # update without recompiling: fixed shapes, new values.
        fd_param = getattr(self, 'dynamics_func_param', None)
        if fd_param is None:
            _fd0 = self.dynamics_func
            def fd_p(x, u, p):
                return _fd0(x, u)
        else:
            fd_p = fd_param
        Q = jnp.asarray(Q_stage, jnp.float32)
        Qterm_j = jnp.asarray(Qterm, jnp.float32)
        R = jnp.asarray(R_stage, jnp.float32)
        U_EQ = jnp.asarray(self.U_EQ, jnp.float32)
        tol = float(self.constraint_tol)
        qp_iters = self.qp_iters
        sqp_iters = self.sqp_iters
        idx_dynA, idx_dynB = self._idx_dynA, self._idx_dynB
        idx_G = self._idx_G if ms else None
        idx_H = self._idx_H if mu else None
        A_base_j = self._A_base
        P_qp_j = self._P_qp
        big = 1e8

        def build_and_solve(x_init, goal_states, X, U, z0, y0, tight_s,
                            tight_u, dp, do_polish=True):
            def fd(x, u):
                return fd_p(x, u, dp)
            # Jacobians + defects at the current guess.
            A_k = jax.vmap(jax.jacfwd(fd, argnums=0))(X[:-1], U)
            B_k = jax.vmap(jax.jacfwd(fd, argnums=1))(X[:-1], U)
            f_k = jax.vmap(fd)(X[:-1], U)
            c_k = f_k - jnp.einsum('kij,kj->ki', A_k, X[:-1]) \
                - jnp.einsum('kij,kj->ki', B_k, U)
            A_mat = A_base_j
            A_mat = A_mat.at[idx_dynA].set(-A_k.reshape(-1))
            A_mat = A_mat.at[idx_dynB].set(-B_k.reshape(-1))
            l = jnp.full((m_rows,), -big, jnp.float32)
            u = jnp.full((m_rows,), big, jnp.float32)
            l = l.at[:nx].set(x_init)
            u = u.at[:nx].set(x_init)
            l = l.at[r_dyn0:r_dyn0 + T * nx].set(c_k.reshape(-1))
            u = u.at[r_dyn0:r_dyn0 + T * nx].set(c_k.reshape(-1))
            if ms:
                G_k = jax.vmap(jax.jacfwd(g_fn))(X)
                g_val = jax.vmap(g_fn)(X)
                b_s = jnp.einsum('kij,kj->ki', G_k, X) - g_val - tight_s
                if not soft:
                    b_s = b_s - tol
                A_mat = A_mat.at[idx_G].set(G_k.reshape(-1))
                u = u.at[r_sc0:r_sc0 + (T + 1) * ms].set(b_s.reshape(-1))
            if mu:
                H_k = jax.vmap(jax.jacfwd(h_fn))(U)
                h_val = jax.vmap(h_fn)(U)
                b_u = jnp.einsum('kij,kj->ki', H_k, U) - h_val - tight_u
                if not soft:
                    b_u = b_u - tol
                A_mat = A_mat.at[idx_H].set(H_k.reshape(-1))
                u = u.at[r_ic0:r_ic0 + T * mu].set(b_u.reshape(-1))
            if n_slack:
                l = l.at[r_sl0:].set(0.0)
            # Linear cost from references (stage -Q xr, terminal -Qterm xr,
            # inputs -R U_EQ).
            q_x = (-goal_states[:T] @ Q).reshape(-1)
            q_xT = -(Qterm_j @ goal_states[T])
            q_u = jnp.tile(-(R @ U_EQ), (T,))
            q = jnp.concatenate([q_x, q_xT, q_u,
                                 jnp.zeros((n_slack,), jnp.float32)])
            # qp_iters is a budget, not a cost: ADMM stages exit early at
            # 0.1*feas_tol, so easy solves stay fast while hard ones (soft
            # slack penalties, infeasible warm starts, long horizons) get
            # the full budget.
            sol = admm_qp(P_qp_j, q, A_mat, l, u, x0=z0, y0=y0,
                          iters=qp_iters, tol=0.1 * float(self.feas_tol),
                          polish=do_polish)
            X_new = sol.x[:nX].reshape(T + 1, nx)
            U_new = sol.x[nX:nX + nU].reshape(T, nu)
            return X_new, U_new, sol.x, sol.y, sol.prim_res

        def solve(x_init, goal_states, X0, U0, z0, y0, tight_s, tight_u,
                  dp=None):
            # Polish (3 active-set LU solves, ~30 ms of pure latency on
            # v5e) only refines the FINAL iterate — intermediate SQP
            # iterates are re-linearized and re-solved anyway, so polishing
            # them buys nothing. Earlier iterations run unpolished.
            X, U, z, y = X0, U0, z0, y0
            if sqp_iters > 1:
                def body(carry, _):
                    X, U, z, y = carry
                    X, U, z, y, res = build_and_solve(
                        x_init, goal_states, X, U, z, y, tight_s, tight_u,
                        dp, do_polish=False)
                    return (X, U, z, y), res
                (X, U, z, y), _ = jax.lax.scan(body, (X, U, z, y), None,
                                               length=sqp_iters - 1)
            X, U, z, y, res = build_and_solve(x_init, goal_states, X, U,
                                              z, y, tight_s, tight_u, dp,
                                              do_polish=True)
            return X, U, z, y, res

        self._n_z = n_z
        self._m_rows = m_rows
        self._ms, self._mu = ms, mu
        # Raw solve kept for composition (vmapped/batched MPC, scenario MPC).
        self._solve_raw = solve
        self._solve_jit = jax.jit(solve)
        self._batch_solve = None
        self._scenario_solve = None

    # -- batched / multi-chip solves -------------------------------------
    def shard_over(self, mesh, axis_name: str = 'data'):
        """Distribute batched solves over a device mesh: the B independent
        problems of ``select_action_batch`` (and subclass batch APIs) are
        split across chips inside one SPMD program — problem data sharded
        on the batch axis, solver constants replicated. Embarrassingly
        parallel (zero collectives); the multi-chip path for MPC sweeps
        and mass certification. Mirrors the RL controllers' shard_over."""
        self._solve_mesh = mesh
        self._solve_mesh_axis = axis_name

    def _place_batched(self, *arrays):
        """Put batch-leading arrays on the mesh (no-op without one)."""
        mesh = getattr(self, '_solve_mesh', None)
        if mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec(self._solve_mesh_axis))
        out = tuple(jax.device_put(a, sh) for a in arrays)
        return out if len(out) > 1 else out[0]

    def select_action_batch(self, obs_batch, step: int = 0):
        """B independent cold-started receding-horizon solves in ONE
        vmapped device program (the batched-NMPC pattern of
        examples/mpc/batched_mpc_demo.py as a first-class API; no
        reference equivalent — the reference runs one IPOPT process per
        problem). After ``shard_over(mesh)`` the batch is split across
        the mesh. Returns ``(actions (B, nu), feasible (B,) bool)``."""
        nx, nu, T = self.model.nx, self.model.nu, self.T
        obs_batch = np.atleast_2d(np.asarray(obs_batch, np.float32))[:, :nx]
        goal = self.get_references(step)
        goal_j = jnp.asarray(goal.T, jnp.float32)
        if self._batch_solve is None:
            solve = self._solve_raw
            U_EQ = jnp.asarray(self.U_EQ, jnp.float32)
            ms, mu = self._ms, self._mu
            n_z, m_rows = self._n_z, self._m_rows

            def solve_one(x0, g, dp):
                X0 = jnp.tile(x0, (T + 1, 1))
                U0 = jnp.tile(U_EQ, (T, 1))
                z0 = jnp.zeros((n_z,), jnp.float32)
                y0 = jnp.zeros((m_rows,), jnp.float32)
                ts = jnp.zeros((T + 1, ms), jnp.float32)
                tu = jnp.zeros((T, mu), jnp.float32)
                X, U, z, y, res = solve(x0, g, X0, U0, z0, y0, ts, tu, dp)
                return U[0], res

            self._batch_solve = jax.jit(
                jax.vmap(solve_one, in_axes=(0, None, None)))
        x0s = self._place_batched(jnp.asarray(obs_batch))
        dp = getattr(self, 'dynamics_params', None)
        u0, res = self._batch_solve(x0s, goal_j, dp)
        res_np = np.asarray(res)
        scale = np.maximum(1.0, np.abs(obs_batch).max(axis=1))
        scale = np.maximum(scale, float(np.max(np.abs(goal))))
        tol = self.feas_tol * (scale if self.feas_tol_relative
                               else np.ones_like(scale))
        feasible = np.isfinite(res_np) & (res_np < tol)
        return np.asarray(u0), feasible

    def select_action_scenarios(self, obs, dynamics_params_batch,
                                step: int = 0):
        """Solve the SAME receding-horizon problem under B sampled
        dynamics-parameter sets in ONE vmapped device program — the
        scenario sweep primitive for domain-randomized / minimax robust
        MPC (no reference equivalent: the reference would run one IPOPT
        process per model).

        Requires the parametric-dynamics hook ``dynamics_func_param``
        (fd(x, u, params)); ``dynamics_params_batch`` is a pytree whose
        leaves carry a leading scenario axis B, vmapped while the initial
        state and reference are broadcast. Returns
        ``(actions (B, nu), feasible (B,) bool)`` — one candidate action
        per scenario; see examples/mpc/scenario_mpc_demo.py for a minimax
        consensus rule over the candidates."""
        assert getattr(self, 'dynamics_func_param', None) is not None, \
            'select_action_scenarios requires dynamics_func_param'
        nx, nu, T = self.model.nx, self.model.nu, self.T
        obs_np = np.asarray(obs, np.float32)[:nx]
        goal = self.get_references(step)
        goal_j = jnp.asarray(goal.T, jnp.float32)
        if self._scenario_solve is None:
            solve = self._solve_raw
            U_EQ = jnp.asarray(self.U_EQ, jnp.float32)
            ms, mu = self._ms, self._mu
            n_z, m_rows = self._n_z, self._m_rows

            def solve_one(x0, g, dp):
                X0 = jnp.tile(x0, (T + 1, 1))
                U0 = jnp.tile(U_EQ, (T, 1))
                z0 = jnp.zeros((n_z,), jnp.float32)
                y0 = jnp.zeros((m_rows,), jnp.float32)
                ts = jnp.zeros((T + 1, ms), jnp.float32)
                tu = jnp.zeros((T, mu), jnp.float32)
                X, U, z, y, res = solve(x0, g, X0, U0, z0, y0, ts, tu, dp)
                return U[0], res

            self._scenario_solve = jax.jit(
                jax.vmap(solve_one, in_axes=(None, None, 0)))
        dp_b = self._place_batched(dynamics_params_batch)
        u0, res = self._scenario_solve(obs_np, goal_j, dp_b)
        res_np = np.asarray(res)
        scale = max(1.0, float(np.abs(obs_np).max()),
                    float(np.max(np.abs(goal))))
        tol = self.feas_tol * (scale if self.feas_tol_relative else 1.0)
        feasible = np.isfinite(res_np) & (res_np < tol)
        return np.asarray(u0), feasible

    # ------------------------------------------------------------------
    def select_action(self, obs, info=None):
        """Warm-started receding-horizon solve (mpc.py:257-332)."""
        import time as _time
        _t0 = _time.perf_counter()
        nx, nu, T = self.model.nx, self.model.nu, self.T
        step = self.extract_step(info)
        goal_states = self.get_references(step)  # (nx, T+1)
        # LATENCY NOTE: everything below stays NUMPY until the jitted call —
        # eager jnp.asarray() conversions each pay a separate host->device
        # transfer round-trip through the remote-dispatch tunnel, while
        # numpy arguments passed straight to a jitted function are shipped
        # with the dispatch itself (measured: 123 -> ~50 ms/step for fused
        # GP-MPC on v5e). Outputs come back in ONE device_get.
        goal_j = np.asarray(goal_states.T, np.float32)
        obs_j = np.asarray(obs, np.float32)
        if self.warmstart and self.x_prev is not None and self.u_prev is not None:
            x_guess = np.roll(self.x_prev, -1, axis=1)
            x_guess[:, -1] = self.x_prev[:, -1]
            u_guess = np.roll(np.atleast_2d(self.u_prev), -1, axis=-1)
            X0 = np.asarray(x_guess.T, np.float32)
            U0 = np.asarray(u_guess.reshape(nu, T).T, np.float32)
            z0, y0 = self._qp_warm
        else:
            X0 = np.tile(obs_j, (T + 1, 1))
            U0 = np.tile(np.asarray(self.U_EQ, np.float32), (T, 1))
            z0 = np.zeros((self._n_z,), np.float32)
            y0 = np.zeros((self._m_rows,), np.float32)
        used_warmstart = (self.warmstart and self.x_prev is not None
                          and self.u_prev is not None)
        X, U, z, y, res = self._dispatch_solve(obs_j, goal_j, X0, U0, z0, y0,
                                               step)
        # z/y ride the same fetch so next step's warm start is numpy like
        # every other argument — mixing committed device arrays with numpy
        # args makes pjit cache a second (identical) executable.
        fetched = jax.device_get(
            (X, U, res, z, y) + tuple(getattr(self, '_dispatch_aux', ())))
        X_np, U_np, res_v, z, y = fetched[:5]
        self._dispatch_aux_host = tuple(fetched[5:])
        tol = self.feas_tol
        if self.feas_tol_relative:
            tol = tol * max(1.0, float(np.max(np.abs(obs_j))),
                            float(np.max(np.abs(goal_states))))
        feasible = bool(np.isfinite(float(res_v)) and float(res_v) < tol)
        if not feasible and used_warmstart:
            # First fallback rung: a poisoned/stale warm start must not be
            # mistaken for true infeasibility — retry cold-started before
            # declaring failure (IPOPT retry semantics, mpc.py:298-316).
            X0 = np.tile(obs_j, (T + 1, 1))
            U0 = np.tile(np.asarray(self.U_EQ, np.float32), (T, 1))
            z0 = np.zeros((self._n_z,), np.float32)
            y0 = np.zeros((self._m_rows,), np.float32)
            X, U, z, y, res = self._dispatch_solve(obs_j, goal_j, X0, U0,
                                                   z0, y0, step)
            fetched = jax.device_get(
                (X, U, res, z, y)
                + tuple(getattr(self, '_dispatch_aux', ())))
            X_np, U_np, res_v, z, y = fetched[:5]
            self._dispatch_aux_host = tuple(fetched[5:])
            feasible = bool(np.isfinite(float(res_v))
                            and float(res_v) < tol)
        if feasible:
            x_val = X_np.T                # (nx, T+1) like the reference
            u_val = U_np.T.squeeze()      # (nu, T) -> squeeze like opti
            self._qp_warm = (z, y)
        else:
            # Fallback ladder (mpc.py:298-316).
            if self.u_prev is None:
                u_val = np.zeros((nu, T)).squeeze()
                x_val = np.zeros((nx, T + 1))
            else:
                u_val = self.u_prev
                x_val = self.x_prev
            self.terminate_loop = True
        self.x_prev = x_val
        self.u_prev = u_val
        self.results_dict['horizon_states'].append(deepcopy(self.x_prev))
        self.results_dict['horizon_inputs'].append(deepcopy(self.u_prev))
        self.results_dict['goal_states'].append(deepcopy(goal_states))
        # Per-solve wall time (t_wall parity, mpc.py:322-323).
        self.results_dict['t_wall'].append(_time.perf_counter() - _t0)
        u_arr = np.atleast_2d(u_val)
        if u_arr.shape[0] != nu:
            u_arr = u_arr.reshape(nu, -1)
        action = np.array(u_arr[:, 0]).reshape(nu)
        if self.use_lqr_gain_and_terminal_cost:
            action = action + self.lqr_gain @ (np.asarray(obs) - x_val[:, 0])
        self.prev_action = action
        return action

    def _dispatch_solve(self, obs_j, goal_j, X0, U0, z0, y0, step):
        """One device dispatch for the receding-horizon solve. Subclasses
        that derive per-step tightening from device state (GP-MPC) override
        this so tightening + SQP fuse into a single jitted program.

        Subclasses may set ``self._dispatch_aux`` to a tuple of extra
        device values; select_action fetches them in the SAME device_get
        as (X, U, res) — a separate scalar fetch costs a full tunnel
        round-trip (~29 ms measured) — and exposes the host values as
        ``self._dispatch_aux_host``."""
        self._dispatch_aux = ()
        tight_s, tight_u = self._constraint_tightening(step)
        dp = getattr(self, 'dynamics_params', None)
        return self._solve_jit(obs_j, goal_j, X0, U0, z0, y0,
                               tight_s, tight_u, dp)

    def _constraint_tightening(self, step):
        """Per-step constraint bound tightening (zeros by default;
        GP-MPC overrides with chance-constraint offsets). Cached NUMPY
        zeros so they ship inside the dispatch like every other argument
        — eagerly-created device arrays here would pay separate tunnel
        round-trips per control step and make pjit cache a second
        executable for the mixed committed/uncommitted argument set."""
        cached = getattr(self, '_zero_tightening', None)
        if (cached is None or cached[0].shape != (self.T + 1, self._ms)
                or cached[1].shape != (self.T, self._mu)):
            cached = (np.zeros((self.T + 1, self._ms), np.float32),
                      np.zeros((self.T, self._mu), np.float32))
            self._zero_tightening = cached
        return cached

    def get_references(self, step):
        """Reference window over the horizon, (nx, T+1) (mpc.py:334-357)."""
        if self.env.TASK == Task.STABILIZATION:
            goal_states = np.tile(self.env.X_GOAL.reshape(-1, 1),
                                  (1, self.T + 1))
        elif self.env.TASK == Task.TRAJ_TRACKING:
            start = min(step, self.traj.shape[-1])
            end = min(step + self.T + 1, self.traj.shape[-1])
            remain = max(0, self.T + 1 - (end - start))
            goal_states = np.concatenate([
                self.traj[:, start:end],
                np.tile(self.traj[:, -1:], (1, remain))], -1)
        else:
            raise Exception('Reference for this mode is not implemented.')
        return goal_states

    def setup_results_dict(self):
        self.results_dict = {'obs': [], 'reward': [], 'done': [], 'info': [],
                             'action': [], 'horizon_inputs': [],
                             'horizon_states': [], 'goal_states': [],
                             'frames': [], 'state_mse': [], 'common_cost': [],
                             'state': [], 'state_error': [], 't_wall': []}

    def learn(self, env=None, **kwargs):
        return

    def run(self, env=None, render=False, logging=False, max_steps=None,
            terminate_run_on_done=None):
        """Closed-loop evaluation with the current policy
        (gp_mpc.py:1033-1131; the reference defines it on GPMPC but it is
        generic MPC machinery). Returns the populated results dict."""
        from safe_control_gym_tpu.controllers.mpc.mpc_utils import \
            compute_state_rmse
        if env is None:
            env = self.env
        if terminate_run_on_done is None:
            terminate_run_on_done = getattr(self, 'terminate_run_on_done',
                                            True)
        # Full pre-run reset (not just the warm-start fields): subclasses
        # extend reset_before_run with their own per-run state — GPMPC
        # clears last_obs/last_action there, and skipping it would leak a
        # cross-episode transition into the online-learning GP update on
        # the first step of the next run.
        self.reset_before_run()
        obs, info = env.reset()
        self.setup_results_dict()
        self.results_dict['obs'].append(obs)
        self.results_dict['state'].append(env.state)
        if max_steps is None:
            if env.TASK == Task.TRAJ_TRACKING:
                max_steps = self.traj.shape[1]
            else:
                max_steps = int(env.CTRL_FREQ * env.EPISODE_LEN_SEC)
        self.terminate_loop = False
        done = False
        i = 0
        common_metric = 0.0
        while (not (done and terminate_run_on_done) and i < max_steps
               and not self.terminate_loop):
            action = self.select_action(obs, info)
            if self.terminate_loop:
                break
            obs, reward, done, info = env.step(action)
            self.results_dict['obs'].append(obs)
            self.results_dict['reward'].append(reward)
            self.results_dict['done'].append(done)
            self.results_dict['info'].append(info)
            self.results_dict['action'].append(action)
            self.results_dict['state'].append(env.state)
            self.results_dict['state_mse'].append(info['mse'])
            goal_i = (env.X_GOAL[i, :] if env.X_GOAL.ndim > 1 else env.X_GOAL)
            self.results_dict['state_error'].append(env.state - goal_i)
            common_metric += info['mse']
            if render:
                self.results_dict['frames'].append(env.render('rgb_array'))
            i += 1
        self.results_dict['obs'] = np.vstack(self.results_dict['obs'])
        self.results_dict['state'] = np.vstack(self.results_dict['state'])
        try:
            self.results_dict['reward'] = np.vstack(
                self.results_dict['reward'])
            self.results_dict['action'] = np.vstack(
                self.results_dict['action'])
            self.results_dict['full_traj_common_cost'] = common_metric
            # The reference feeds raw states/obs here (gp_mpc.py:1126-1127),
            # not the error arrays — kept for metric parity.
            self.results_dict['total_rmse_state_error'] = compute_state_rmse(
                self.results_dict['state'])
            self.results_dict['total_rmse_obs_error'] = compute_state_rmse(
                self.results_dict['obs'])
        except ValueError as exc:
            raise RuntimeError(
                '[ERROR] mpc.run(): MPC could not find a solution for the '
                'first step given the initial conditions. Check that the '
                'initial conditions are feasible.') from exc
        return deepcopy(self.results_dict)
