"""Linear Model Predictive Safety Certification — rebuild of
safety_filters/mpsc/linear_mpsc.py (362 LoC reference).

* ``learn()`` samples n_samples one-step residuals w = x_next_real -
  x_next_model (linear_mpsc.py:115-135) and computes the ellipsoidal RPI set
  P on device (penalized log-det descent replacing the cvxpy+MOSEK LMI,
  mpsc_utils.py:21-61);
* constraint tightening via exact AABB Pontryagin differences
  (linear_mpsc.py:224-268);
* optional terminal-set learning by growing a polytope from feasible solves
  (linear_mpsc.py:143-178; qhull replaces pytope);
* the tube-MPC certification problem (z/v variables, omega-constraint on
  x_init - z_0, tightened constraints, terminal set, next_u = v_0 + U_EQ +
  K(x_init - z_0), linear_mpsc.py:269-345) is solved by the same on-device
  SQP+ADMM machinery as the MPC family — one jitted solve per certification;
* per-step re-linearization point X_EQ from the current obs
  (linear_mpsc.py:347-362);
* save/load of P + terminal set via pickle (linear_mpsc.py:180-222).
"""

from __future__ import annotations

import pickle
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.lqr.lqr_utils import \
    discretize_linear_system
from safe_control_gym_tpu.controllers.mpc.mpc_utils import rk_discrete
from safe_control_gym_tpu.envs.benchmark_env import Environment, Task
from safe_control_gym_tpu.envs.constraints import (ConstrainedVariableType,
                                                   LinearConstraint,
                                                   QuadraticConstraint)
from safe_control_gym_tpu.ops.qp import admm_qp
from safe_control_gym_tpu.safety_filters.mpsc.mpsc import MPSC
from safe_control_gym_tpu.safety_filters.mpsc.mpsc_utils import (
    Cost_Function, compute_RPI_set, ellipse_bounding_box,
    pontryagin_difference_AABB, vertices_to_halfspaces)

__all__ = ['LINEAR_MPSC']


class LINEAR_MPSC(MPSC):
    """Model Predictive Safety Certification."""

    def __init__(self, env_func, horizon: int = 10, q_lin: list = None,
                 r_lin: list = None, integration_algo: str = 'rk4',
                 n_samples: int = 600, n_samples_terminal_set: int = 100,
                 tau: float = 0.95, warmstart: bool = True,
                 additional_constraints: list = None,
                 use_terminal_set: bool = True,
                 learn_terminal_set: bool = False,
                 sqp_iters: int = 2, qp_iters: int = 1000,
                 feas_tol: float = 5e-3, feas_tol_relative: bool = True,
                 cost_function: str = Cost_Function.ONE_STEP_COST, **kwargs):
        self.n_samples = n_samples
        self.n_samples_terminal_set = n_samples_terminal_set
        self.tau = tau
        self.learn_terminal_set = learn_terminal_set
        self.sqp_iters = int(sqp_iters)
        self.qp_iters = int(qp_iters)
        # Certification feasibility is judged by the final ADMM primal
        # residual; with feas_tol_relative the tolerance scales with the
        # problem data (OSQP's eps_abs + eps_rel convention) so large
        # states aren't spuriously rejected. A mis-declared 'feasible' is
        # a safety-filter false positive — keep the default tight.
        self.feas_tol = float(feas_tol)
        self.feas_tol_relative = bool(feas_tol_relative)
        super().__init__(env_func, horizon, q_lin, r_lin, integration_algo,
                         warmstart, additional_constraints, use_terminal_set,
                         cost_function, **kwargs)
        self.terminal_set_verts = None
        self._solve_jit = None

    # ------------------------------------------------------------------
    def set_dynamics(self):
        """Linear or rk4 delta-coordinate dynamics (linear_mpsc.py:73-107)."""
        df = self.model.df_func(x=np.zeros(self.model.nx),
                                u=np.atleast_1d(np.asarray(self.model.U_EQ)))
        dfdx = np.asarray(df['dfdx'])
        dfdu = np.asarray(df['dfdu'])
        Ad, Bd = discretize_linear_system(dfdx, dfdu, self.model.dt)
        self.discrete_dfdx, self.discrete_dfdu = np.asarray(Ad), np.asarray(Bd)
        if self.integration_algo == 'LTI':
            Ad_j = jnp.asarray(self.discrete_dfdx, jnp.float32)
            Bd_j = jnp.asarray(self.discrete_dfdu, jnp.float32)

            def dynamics_func(z, v):
                return Ad_j @ z + Bd_j @ v
        else:  # 'rk4' on the full nonlinear delta dynamics
            U_EQ = jnp.asarray(np.atleast_1d(np.asarray(self.model.U_EQ)),
                               jnp.float32)
            rk = rk_discrete(self.model.fc_fn, self.model.nx, self.model.nu,
                             self.model.dt)

            def dynamics_func(z, v):
                # delta-state propagation: translate by the (position-only)
                # linearization point handled by the caller; inputs are
                # absolute u = v + U_EQ in rk4 mode (linear_mpsc.py:92-97).
                return rk(z, v + U_EQ)

        self.dynamics_func = dynamics_func

    def _dynamics_for_residual(self, x0_delta, u):
        """x_next prediction used for residual collection (learn()).

        Both integration modes consume delta inputs v = u - U_EQ: the LTI
        map is defined in delta coordinates, and the rk4 closure adds U_EQ
        back internally (set_dynamics above) — so a single call serves
        both."""
        return np.asarray(self.dynamics_func(
            jnp.asarray(x0_delta, jnp.float32),
            jnp.asarray(u - self.U_EQ, jnp.float32)))

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Sample residuals -> RPI set -> tightening -> optimizer
        (linear_mpsc.py:109-178)."""
        if env is None:
            env = self.training_env
        nx, nu = self.model.nx, self.model.nu
        self._learn_rng = np.random.default_rng(self.seed)
        w = np.zeros((nx, self.n_samples))
        for i in range(self.n_samples):
            init_state, _ = env.reset()
            init_state = init_state[:nx]
            # Seeded generator, NOT the global numpy RNG (the reference
            # uses np.random here, linear_mpsc.py:126 — which makes the
            # learned tube depend on whatever consumed the global stream
            # earlier in the process).
            if self.env.NAME == Environment.QUADROTOR:
                u = self._learn_rng.random(nu) / 20 - 1 / 40 + self.U_EQ
            else:
                u = env.action_space.sample()
            x_next_obs, _, _, _ = env.step(u)
            x_next_linear = self._dynamics_for_residual(
                init_state - self.X_EQ, u) + self.X_EQ
            w[:, i] = x_next_obs[:nx] - x_next_linear
        A_cl = self.discrete_dfdx + self.discrete_dfdu @ self.lqr_gain
        self.P = compute_RPI_set(A_cl, w, self.tau)
        self.omega_AABB_verts = ellipse_bounding_box(self.P)
        self.tighten_state_and_input_constraints()
        self.omega_constraint = QuadraticConstraint(
            self.env, self.P, 1.0,
            constrained_variable=ConstrainedVariableType.STATE)
        self.setup_optimizer()

        if self.learn_terminal_set:
            self._learn_terminal_set(env)

    def _learn_terminal_set(self, env):
        """Grow a terminal polytope from feasible solves
        (linear_mpsc.py:143-178)."""
        nx, nu = self.model.nx, self.model.nu
        if self.env.TASK == Task.TRAJ_TRACKING:
            verts = np.asarray(self.env.X_GOAL)
        else:
            verts = None
        points = None
        for _ in range(self.n_samples_terminal_set):
            if verts is None:
                init_state = np.asarray(self.X_EQ, dtype=float).copy()
            else:
                init_state = verts[np.random.choice(verts.shape[0])].copy()
            init_state = init_state + (np.random.rand(nx) - 0.5) / 2
            if self.env.NAME == Environment.QUADROTOR:
                u = np.random.rand(nu) / 6 - 1 / 12 + self.U_EQ
            else:
                u = env.action_space.sample()
            _, feasible = self.solve_optimization(obs=init_state,
                                                  uncertified_action=u)
            if feasible:
                new_pts = self.z_prev.T
                points = (new_pts if points is None
                          else np.vstack((points, new_pts)))
                if verts is not None:
                    points = np.vstack((points, verts))
                try:
                    A, b = vertices_to_halfspaces(points)
                    self.terminal_set = (A, b)
                    self.setup_optimizer()
                except Exception:
                    pass
        self.terminal_set_verts = points

    # ------------------------------------------------------------------
    def load(self, path):
        with open(path, 'rb') as f:
            parameters = pickle.load(f)
        self.P = parameters['P']
        self.omega_AABB_verts = ellipse_bounding_box(self.P)
        self.tighten_state_and_input_constraints()
        self.omega_constraint = QuadraticConstraint(
            self.env, self.P, 1.0,
            constrained_variable=ConstrainedVariableType.STATE)
        if self.learn_terminal_set and 'terminal_set' in parameters:
            self.terminal_set_verts = parameters['terminal_set']
            A, b = vertices_to_halfspaces(self.terminal_set_verts)
            self.terminal_set = (A, b)
        self.setup_optimizer()

    def save(self, path):
        parameters = {'P': self.P}
        if self.learn_terminal_set and self.terminal_set_verts is not None:
            parameters['terminal_set'] = self.terminal_set_verts
        with open(path, 'wb') as f:
            pickle.dump(parameters, f)

    # ------------------------------------------------------------------
    def tighten_state_and_input_constraints(self):
        """Pontryagin-difference tightening (linear_mpsc.py:224-268)."""
        K_verts_raw = (self.lqr_gain @ self.omega_AABB_verts.T).T
        lims = np.array([np.amax(K_verts_raw, axis=0),
                         np.amin(K_verts_raw, axis=0)])
        self.K_omega_AABB_verts = np.vstack(list(product(*(lims.T))))
        input_constraint = self.constraints.input_constraints
        if len(input_constraint) > 1:
            raise NotImplementedError("MPSC currently can't handle more than 1 constraint")
        input_constraint = input_constraint[0]
        if self.training_env.NAME != Environment.QUADROTOR:
            U_verts_raw = [(input_constraint.upper_bounds[i],
                            input_constraint.lower_bounds[i])
                           for i in range(self.model.nu)]
        else:
            U_verts_raw = [(input_constraint.upper_bounds[i],
                            -input_constraint.upper_bounds[i])
                           for i in range(self.model.nu)]
        self.U_vertices = np.clip(np.vstack(list(product(*U_verts_raw))),
                                  -100, 100)
        (self.tightened_input_constraint_verts,
         tightened_input_func) = pontryagin_difference_AABB(
            self.U_vertices, self.K_omega_AABB_verts)
        if self.training_env.NAME == Environment.QUADROTOR:
            min_input = (input_constraint.lower_bounds[0]
                         + np.max(self.U_vertices)
                         - np.max(self.tightened_input_constraint_verts))
            self.tightened_input_constraint_verts = np.clip(
                self.tightened_input_constraint_verts, min_input, 100)
        self.tightened_input_constraint = tightened_input_func(
            env=self.env, constrained_variable=ConstrainedVariableType.INPUT)
        state_constraints = self.constraints.state_constraints
        if len(state_constraints) > 1:
            raise NotImplementedError("MPSC currently can't handle more than 1 constraint")
        state_constraints = state_constraints[0]
        X_verts_raw = [(state_constraints.upper_bounds[i],
                        state_constraints.lower_bounds[i])
                       for i in range(self.model.nx)]
        self.X_vertices = np.clip(np.vstack(list(product(*X_verts_raw))),
                                  -100, 100)
        (self.tightened_state_constraint_verts,
         tightened_state_func) = pontryagin_difference_AABB(
            self.X_vertices, self.omega_AABB_verts)
        self.tightened_state_constraint = tightened_state_func(
            env=self.env, constrained_variable=ConstrainedVariableType.STATE)
        self.simple_terminal_set = QuadraticConstraint(
            env=self.env, P=np.eye(self.model.nx),
            b=float(self.env.TASK_INFO['stabilization_goal_tolerance']),
            constrained_variable=ConstrainedVariableType.STATE)

    # ------------------------------------------------------------------
    def setup_optimizer(self):
        """Compile the jitted tube-MPC solve (linear_mpsc.py:269-345)."""
        H = self.horizon
        nx, nu = self.model.nx, self.model.nu
        nZ = (H + 1) * nx
        nV = H * nu
        n_z = nZ + nV
        fd = self.dynamics_func
        U_EQ = jnp.asarray(self.U_EQ, jnp.float32)
        K = jnp.asarray(self.lqr_gain, jnp.float32)
        # Tightened linear constraints.
        A_u = jnp.asarray(self.tightened_input_constraint.A, jnp.float32)
        b_u = jnp.asarray(self.tightened_input_constraint.b, jnp.float32)
        m_u = A_u.shape[0]
        A_s = jnp.asarray(self.tightened_state_constraint.A, jnp.float32)
        b_s = jnp.asarray(self.tightened_state_constraint.b, jnp.float32)
        m_s = A_s.shape[0]
        use_terminal = self.use_terminal_set
        if use_terminal and self.terminal_set is not None:
            A_t = jnp.asarray(self.terminal_set[0], jnp.float32)
            b_t = jnp.asarray(self.terminal_set[1], jnp.float32)
            terminal_quadratic = False
            m_t = A_t.shape[0]
        elif use_terminal:
            # Quadratic terminal ball ||z_T||^2 <= tol: like omega, a
            # convex constraint whose SQP linearization is a RELAXATION —
            # 'can stop within the horizon' certifications were false
            # positives that let a diving quad through until too late.
            # Enforce the certified inner box |z_T_i| <= sqrt(tol/nx)
            # instead; the true ball is re-validated before 'feasible'.
            terminal_quadratic = True
            term_tol = float(self.env.TASK_INFO['stabilization_goal_tolerance'])
            term_hw = float(np.sqrt(max(term_tol, 0.0) / nx))
            m_t = nx
        else:
            terminal_quadratic = False
            m_t = 0
        self._terminal_quadratic = terminal_quadratic
        self._term_tol = (term_tol if terminal_quadratic else None)
        # Cost (one-step): ||c0 + M d||^2, d = [z0; v0].
        M_cost = jnp.asarray(self.cost_function.get_cost(
            {'lqr_gain': self.lqr_gain}), jnp.float32)
        P_qp = np.zeros((n_z, n_z), np.float32)
        # 2 M'M into (z0, v0) cross-blocks.
        Mnp = np.asarray(M_cost)
        MtM = 2.0 * Mnp.T @ Mnp  # over [z0; v0] stacked dims (nx+nu)
        P_qp[:nx, :nx] += MtM[:nx, :nx]
        P_qp[:nx, nZ:nZ + nu] += MtM[:nx, nx:]
        P_qp[nZ:nZ + nu, :nx] += MtM[nx:, :nx]
        P_qp[nZ:nZ + nu, nZ:nZ + nu] += MtM[nx:, nx:]
        # Tiny regularization on all variables for ADMM conditioning.
        P_qp += np.eye(n_z, dtype=np.float32) * 1e-6
        # Omega-centering tie-break: the one-step cost is DEGENERATE in z0
        # (any z0 with K(x_init - z0) ~ const is cost-equivalent), so the
        # QP is free to park z0 at the edge of — or outside — the cut
        # relaxation of the ellipse. A small pull of z0 toward x_init
        # (weight w on (z0 - x_init)'P(z0 - x_init)) selects the tube
        # center among cost-equivalent optima; w is sized so the bias adds
        # <= w * 1 to the squared action error whenever omega is actually
        # slack.
        w_omega = 1e-2
        P_qp[:nx, :nx] += 2.0 * w_omega * np.asarray(self.P, np.float32)
        P_qp_j = jnp.asarray(P_qp)
        P_omega_w = jnp.asarray(2.0 * w_omega * np.asarray(self.P),
                                jnp.float32)
        sqp_iters = self.sqp_iters
        qp_iters = self.qp_iters
        # Omega handling: the ellipse (x_init - z0)'P(x_init - z0) <= 1 is
        # CONVEX, so any SQP linearization is a RELAXATION — and at the
        # cold start e = 0 the gradient vanishes and the row is vacuous,
        # letting z0 leave the true ellipse while the QP reports feasible
        # (observed on the 12-state quadrotor: |x_init - z0| 10x the tube,
        # corrupting the tube feedback K(x_init - z0)). Instead enforce the
        # certified EIGEN-ALIGNED inner box: with P = V diag(lam) V' and
        # xi = V'e, the rows |xi_i| <= 1/sqrt(nx*lam_i) imply
        # e'Pe = sum lam_i xi_i^2 <= 1. Exact linear rows (no relaxation),
        # uniformly sqrt(nx)-conservative along the ellipse's own axes
        # (a coordinate-aligned box can be nx-fold tighter in single dims,
        # which blocked boundary certifications). solve_optimization still
        # validates the true quadratic as a final invariant check.
        lam, Vp = np.linalg.eigh(np.asarray(self.P, np.float64))
        omega_rows = jnp.asarray(Vp.T, jnp.float32)          # (nx, nx)
        omega_inner_hw = jnp.asarray(
            1.0 / np.sqrt(nx * np.clip(lam, 1e-12, None)), jnp.float32)
        # dyn, state, input, terminal, omega inner box on V'(x_init - z0)
        m_rows = H * nx + (H * m_s) + (H * m_u) + m_t + nx
        big = 1e8

        def build_and_solve(x_init, u_L, xeq, Z, V, z_ws, y_ws,
                            do_polish=True):
            A_k = jax.vmap(jax.jacfwd(fd, argnums=0))(Z[:-1], V)
            B_k = jax.vmap(jax.jacfwd(fd, argnums=1))(Z[:-1], V)
            f_k = jax.vmap(fd)(Z[:-1], V)
            c_k = f_k - jnp.einsum('kij,kj->ki', A_k, Z[:-1]) \
                - jnp.einsum('kij,kj->ki', B_k, V)
            A_mat = jnp.zeros((m_rows, n_z), jnp.float32)
            l = jnp.full((m_rows,), -big, jnp.float32)
            u = jnp.full((m_rows,), big, jnp.float32)
            # Dynamics rows.
            for k in range(H):
                r = k * nx
                A_mat = A_mat.at[r:r + nx, k * nx:(k + 1) * nx].set(-A_k[k])
                A_mat = A_mat.at[r:r + nx, nZ + k * nu:nZ + (k + 1) * nu].set(-B_k[k])
                A_mat = A_mat.at[r:r + nx, (k + 1) * nx:(k + 2) * nx].set(
                    jnp.eye(nx))
                l = l.at[r:r + nx].set(c_k[k])
                u = u.at[r:r + nx].set(c_k[k])
            r0 = H * nx
            # State constraints on z_k + X_EQ handled by caller shifting b.
            # xeq is an ARGUMENT, not a captured constant: per-step
            # re-linearization (before_optimization) must reach the
            # compiled program — a closure capture here bakes the FIRST
            # step's X_EQ into the trace forever.
            for k in range(H):
                r = r0 + k * m_s
                A_mat = A_mat.at[r:r + m_s, k * nx:(k + 1) * nx].set(A_s)
                u = u.at[r:r + m_s].set(b_s - A_s @ xeq)
            r1 = r0 + H * m_s
            for k in range(H):
                r = r1 + k * m_u
                A_mat = A_mat.at[r:r + m_u, nZ + k * nu:nZ + (k + 1) * nu].set(A_u)
                u = u.at[r:r + m_u].set(b_u - A_u @ U_EQ)
            r2 = r1 + H * m_u
            if m_t:
                if terminal_quadratic:
                    A_mat = A_mat.at[r2:r2 + nx,
                                     H * nx:(H + 1) * nx].set(jnp.eye(nx))
                    l = l.at[r2:r2 + nx].set(-term_hw)
                    u = u.at[r2:r2 + nx].set(term_hw)
                else:
                    A_mat = jax.lax.dynamic_update_slice(
                        A_mat, A_t, (r2, H * nx))
                    u = jax.lax.dynamic_update_slice(u, b_t, (r2,))
            r3 = r2 + m_t
            # Omega inner box in eigencoords: |V'(x_init - z0)| <= hw.
            xi_c = omega_rows @ x_init
            A_mat = A_mat.at[r3:r3 + nx, :nx].set(omega_rows)
            l = l.at[r3:r3 + nx].set(xi_c - omega_inner_hw)
            u = u.at[r3:r3 + nx].set(xi_c + omega_inner_hw)
            # Linear cost: from ||c0 + M d||^2 with c0 = u_L - U_EQ - K x_init.
            c0 = u_L - U_EQ - K @ x_init
            q_d = 2.0 * (M_cost.T @ c0)
            q = jnp.zeros((n_z,), jnp.float32)
            q = q.at[:nx].set(q_d[:nx] - P_omega_w @ x_init)
            q = q.at[nZ:nZ + nu].set(q_d[nx:])
            # Budgeted with early exit at 0.1*feas_tol (see ops/qp.py).
            sol = admm_qp(P_qp_j, q, A_mat, l, u, x0=z_ws, y0=y_ws,
                          iters=qp_iters, tol=0.1 * float(self.feas_tol),
                          polish=do_polish)
            Z_new = sol.x[:nZ].reshape(H + 1, nx)
            V_new = sol.x[nZ:nZ + nV].reshape(H, nu)
            return Z_new, V_new, sol.x, sol.y, sol.prim_res

        def solve(x_init, u_L, xeq, Z0, V0, z0, y0):
            # Polish (3 active-set LU solves, pure latency at these sizes)
            # only on the FINAL iterate — earlier iterations just continue
            # the warm-started ADMM and their polish is discarded.
            Z, V, z, y = Z0, V0, z0, y0
            if sqp_iters > 1:
                def body(carry, _):
                    Z, V, z, y = carry
                    Z, V, z, y, res = build_and_solve(x_init, u_L, xeq,
                                                      Z, V, z, y,
                                                      do_polish=False)
                    return (Z, V, z, y), res
                (Z, V, z, y), _ = jax.lax.scan(body, (Z, V, z, y), None,
                                               length=sqp_iters - 1)
            Z, V, z, y, res = build_and_solve(x_init, u_L, xeq, Z, V, z, y,
                                              do_polish=True)
            return Z, V, z, y, res

        self._n_z = n_z
        self._m_rows = m_rows
        self._solve_raw = solve
        self._solve_jit = jax.jit(solve)
        self._solve_batch = None
        self._qp_warm = None

    def shard_over(self, mesh, axis_name: str = 'data'):
        """Distribute ``certify_action_batch`` over a device mesh: the B
        independent tube solves are split across chips inside one SPMD
        program (batch axis sharded, tube/constraint constants replicated;
        embarrassingly parallel — zero collectives). The multi-chip path
        for mass certification sweeps; mirrors the RL controllers' and
        MPC's shard_over."""
        self._solve_mesh = mesh
        self._solve_mesh_axis = axis_name

    def _place_batched(self, *arrays):
        mesh = getattr(self, '_solve_mesh', None)
        if mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec(self._solve_mesh_axis))
        return tuple(jax.device_put(a, sh) for a in arrays)

    def _xeq_for(self, obs):
        """Re-linearization point for one observation (the
        before_optimization rule, shape-polymorphic for batching)."""
        obs = np.asarray(obs)
        if self.env.NAME == Environment.CARTPOLE:
            out = np.zeros(4, np.float32)
            out[0] = obs[0]
            return out
        if self.env.NAME == Environment.QUADROTOR and self.model.nx == 6:
            out = np.zeros(6, np.float32)
            out[0], out[2] = obs[0], obs[2]
            return out
        return np.zeros(self.model.nx, np.float32)

    def certify_action_batch(self, states, uncertified_actions):
        """Vectorized certification: B independent cold-started tube
        solves in ONE device program (``jax.vmap`` over the whole
        SQP+ADMM+polish solve — the batched-solver counterpart of
        examples/mpc/batched_mpc_demo.py, with no reference equivalent:
        the reference runs one CasADi solve per certification).

        Infeasible rows fall back to the clipped-LQR last rung of the
        kinf ladder (batch elements are independent states, so there is
        no per-element plan history to replay). Returns
        ``(certified_actions (B, nu), success (B,) bool)``.
        """
        nx, nu, H = self.model.nx, self.model.nu, self.horizon
        states = np.atleast_2d(np.asarray(states, np.float32))[:, :nx]
        acts = np.atleast_2d(np.asarray(uncertified_actions, np.float32))
        acts = np.clip(acts, self.env.physical_action_bounds[0],
                       self.env.physical_action_bounds[1])
        B = states.shape[0]
        xeqs = np.stack([self._xeq_for(s) for s in states])
        x_inits = jnp.asarray(states - xeqs)
        if self._solve_batch is None:
            self._solve_batch = jax.jit(jax.vmap(self._solve_raw))
        Z0 = jnp.tile(x_inits[:, None, :], (1, H + 1, 1))
        V0 = jnp.zeros((B, H, nu), jnp.float32)
        zw = jnp.zeros((B, self._n_z), jnp.float32)
        yw = jnp.zeros((B, self._m_rows), jnp.float32)
        batch_args = self._place_batched(
            x_inits, jnp.asarray(acts), jnp.asarray(xeqs), Z0, V0, zw, yw)
        Z, V, z, y, res = self._solve_batch(*batch_args)
        res = np.asarray(res)
        scale = np.maximum(1.0, np.maximum(np.abs(states).max(axis=1),
                                           np.abs(acts).max(axis=1)))
        tol = self.feas_tol * (scale if self.feas_tol_relative
                               else np.ones(B))
        e = np.asarray(x_inits) - np.asarray(Z)[:, 0]
        slack = tol * float(np.sum(np.sqrt(np.clip(np.diag(self.P),
                                                   0, None))))
        omega_ok = (np.einsum('bi,ij,bj->b', e, np.asarray(self.P), e)
                    <= (1.0 + slack) ** 2 + 1e-6)
        feasible = np.isfinite(res) & (res < tol) & omega_ok
        K = np.asarray(self.lqr_gain)
        u_eq = np.atleast_1d(np.asarray(self.U_EQ, np.float32))
        next_u = np.asarray(V)[:, 0] + u_eq[None, :] + e @ K.T
        # Fallback rows: clipped LQR toward the re-linearization point
        # (+ U_EQ in both modes — see the certify_action fallback note).
        lqr_u = (states - xeqs) @ K.T + u_eq[None, :]
        in_con = self.constraints.input_constraints[0]
        lqr_u = np.clip(lqr_u, in_con.lower_bounds, in_con.upper_bounds)
        certified = np.where(feasible[:, None], next_u, lqr_u)
        return certified, feasible

    def before_optimization(self, obs):
        """Per-step re-linearization point (linear_mpsc.py:347-362)."""
        obs = np.asarray(obs)
        if self.env.NAME == Environment.CARTPOLE:
            self.X_EQ = np.array([obs[0], 0, 0, 0], dtype=np.float32)
        elif self.env.NAME == Environment.QUADROTOR:
            if self.model.nx == 6:
                self.X_EQ = np.array([obs[0], 0, obs[2], 0, 0, 0],
                                     dtype=np.float32)
            else:
                self.X_EQ = np.zeros(self.model.nx, dtype=np.float32)

    def solve_optimization(self, obs, uncertified_action, iteration=None):
        """One certification solve (mpsc.py:110-169 flow, jitted)."""
        if self._solve_jit is None:
            raise RuntimeError('[ERROR] LINEAR_MPSC must run learn() or '
                               'load() before certification.')
        nx, nu, H = self.model.nx, self.model.nu, self.horizon
        obs = np.asarray(obs).reshape(nx)
        # LATENCY NOTE: numpy arguments ship WITH the jit dispatch; eager
        # jnp.asarray() conversions each pay a separate transfer round-trip
        # through the remote-dispatch tunnel, and every np.asarray() on a
        # result is a separate download. One upload batch + one device_get.
        x_init = np.asarray(obs - self.X_EQ, np.float32)
        u_L = np.asarray(np.atleast_1d(uncertified_action), np.float32)
        if (self.warmstart and self.z_prev is not None
                and self.v_prev is not None and self._qp_warm is not None):
            z_guess = np.roll(self.z_prev, -1, axis=1)
            z_guess[:, -1] = self.z_prev[:, -1]
            v_guess = np.roll(self.v_prev, -1, axis=1)
            Z0 = np.asarray(z_guess.T, np.float32)
            V0 = np.asarray(v_guess.T, np.float32)
            z_ws, y_ws = self._qp_warm
        else:
            Z0 = np.tile(x_init, (H + 1, 1))
            V0 = np.zeros((H, nu), np.float32)
            z_ws = np.zeros((self._n_z,), np.float32)
            y_ws = np.zeros((self._m_rows,), np.float32)
        Z, V, z, y, res = self._solve_jit(
            x_init, u_L, np.asarray(self.X_EQ, np.float32),
            Z0, V0, z_ws, y_ws)
        # z/y ride the same fetch so the next warm start is numpy like the
        # other args (mixed committed/uncommitted args would cache a second
        # identical executable).
        Z_np, V_np, res_v, z, y = jax.device_get((Z, V, res, z, y))
        tol = self.feas_tol
        if self.feas_tol_relative:
            tol = tol * max(1.0, float(np.max(np.abs(obs))),
                            float(np.max(np.abs(u_L))))
        feasible = bool(np.isfinite(float(res_v)) and float(res_v) < tol)
        if feasible:
            # Invariant check on the TRUE omega constraint (the QP enforces
            # its inner box): a residual-tol violation of the box rows can
            # inflate ||e||_P by at most tol * sum_i sqrt(P_ii), so accept
            # up to that and reject anything grosser — a false 'feasible'
            # is a safety false positive (the tube feedback guarantee
            # needs x_init - z0 inside omega).
            e = x_init - Z_np[0]
            slack = tol * float(np.sum(np.sqrt(np.clip(np.diag(self.P),
                                                       0, None))))
            feasible = bool(float(e @ self.P @ e) <= (1.0 + slack) ** 2
                            + 1e-6)
        if feasible and getattr(self, '_terminal_quadratic', False):
            zT = Z_np[-1]
            feasible = bool(float(zT @ zT)
                            <= self._term_tol + 2.0 * tol + 1e-6)
        if not feasible:
            return None, False
        self.z_prev = Z_np.T
        self.v_prev = V_np.T.reshape(nu, H)
        self._qp_warm = (z, y)
        next_u = (V_np[0] + self.U_EQ
                  + np.asarray(self.lqr_gain) @ (obs - self.X_EQ
                                                 - Z_np[0]))
        self.next_u_prev = next_u
        self.prev_action = next_u
        return next_u, True
