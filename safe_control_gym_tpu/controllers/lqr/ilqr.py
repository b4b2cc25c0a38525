"""Iterative LQR — rebuild of controllers/lqr/ilqr.py (389 LoC reference).

Algorithm parity: iteration 0 rolls out the LQR policy; each subsequent
iteration runs a backward pass over the realized trajectory using the
analytic model's cost derivatives and per-step discretized Jacobians
(ilqr.py:185-278), with eigenvalue-clipped, lambda-regularized H inversion
(:251-257); lambda x= lamb_factor on cost increase with revert-to-best
(:138-176); convergence when |delta cost| < epsilon twice in a row.

TPU-native difference: the entire backward pass — per-step Jacobians
(vmapped jacfwd), discretization, cost quadraticization, and the regularized
Riccati-like recursion — is ONE jitted ``lax.scan`` instead of a Python loop
with per-step CasADi calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.lqr.lqr import LQR
from safe_control_gym_tpu.math.linalg import full_matmul_precision
from safe_control_gym_tpu.envs.benchmark_env import Task

__all__ = ['iLQR']


class iLQR(LQR):
    """Iterative linear quadratic regulator."""

    def __init__(self, env_func, q_lqr=None, r_lqr=None,
                 discrete_dynamics=True, max_iterations=15, lamb_factor=10,
                 lamb_max=1000, epsilon=0.01, fused_solve=False, **kwargs):
        super().__init__(env_func, q_lqr=q_lqr, r_lqr=r_lqr,
                         discrete_dynamics=discrete_dynamics, **kwargs)
        self.max_iterations = max_iterations
        self.lamb_factor = lamb_factor
        self.lamb_max = lamb_max
        self.epsilon = epsilon
        # fused_solve=True routes learn() through the single-dispatch
        # device solve (learn_fused) instead of the host iteration loop.
        self.fused_solve = bool(fused_solve)
        self._fused = None
        # Iteration state.
        self.ite_counter = 0
        self.traj_step = 0
        self.input_ff = None
        self.gains_fb = None
        self.input_ff_best = None
        self.gains_fb_best = None
        self.lamb = 1.0
        self.update_unstable = False
        self._backward_jit = jax.jit(
            full_matmul_precision(self._make_backward()))

    # ------------------------------------------------------------------
    def _make_backward(self):
        """Jitted backward pass over a (T, nx)/(T, nu) trajectory."""
        model = self.model
        fc = model.fc_fn
        dt = model.dt
        nx, nu = model.nx, model.nu
        Q = jnp.asarray(self.Q, jnp.float32)
        R = jnp.asarray(self.R, jnp.float32)
        U_EQ = jnp.asarray(np.atleast_1d(self.model.U_EQ), jnp.float32)
        task = self.env.TASK

        def backward(states, inputs, x_goal_seq, x_goal_term, lamb):
            T = states.shape[0]

            # Per-step continuous Jacobians, vmapped, then Euler-discretized
            # (discretize_linear_system default, lqr_utils.py:42-74).
            def jac(x, u):
                A = jax.jacfwd(fc, argnums=0)(x, u)
                B = jax.jacfwd(fc, argnums=1)(x, u)
                return jnp.eye(nx) + dt * A, dt * B

            Ad, Bd = jax.vmap(jac)(states, inputs)

            def cost_terms(x, u, xr):
                dx = x - xr
                du = u - U_EQ
                Qv = Q @ dx
                Rv = R @ du
                return Qv, Rv

            Qv_seq, Rv_seq = jax.vmap(cost_terms)(states, inputs, x_goal_seq)

            # Terminal cost-to-go from the final state (ilqr.py:196-212).
            Sv0 = Q @ (states[-1] - x_goal_term)
            Sm0 = Q

            def body(carry, xs):
                Sv, Sm = carry
                A, B, Qv, Rv, x_k, u_k = xs
                g = Rv[:, None] + B.T @ Sv[:, None]
                G = B.T @ (Sm @ A)
                H = R + B.T @ (Sm @ B)
                H = 0.5 * (H + H.T)
                # Eigenvalue clip + lambda regularization (ilqr.py:251-257).
                evals, evecs = jnp.linalg.eigh(H)
                evals = jnp.clip(evals, 0.0, None) + lamb
                H_inv = (evecs * (1.0 / evals)) @ evecs.T
                duff = -H_inv @ g
                K = -H_inv @ G
                input_ff = u_k + duff[:, 0] - K @ x_k
                Sm_new = (Q + A.T @ (Sm @ A) + K.T @ (H @ K)
                          + K.T @ G + G.T @ K)
                Sv_new = (Qv + A.T @ Sv + (K.T @ (H @ duff) + K.T @ g
                                           + G.T @ duff)[:, 0])
                ok = jnp.isfinite(H).all()
                return (Sv_new, Sm_new), (K, input_ff, ok)

            xs = (Ad[::-1], Bd[::-1], Qv_seq[::-1], Rv_seq[::-1],
                  states[::-1], inputs[::-1])
            (_, _), (K_rev, ff_rev, ok_rev) = jax.lax.scan(
                body, (Sv0, Sm0), xs)
            return K_rev[::-1], ff_rev[::-1], jnp.all(ok_rev)

        return backward

    def update_policy(self, env):
        """Backward pass updating gains_fb / input_ff (ilqr.py:185-278)."""
        T = self.input_stack.shape[0]
        states = jnp.asarray(self.state_stack[:T], jnp.float32)
        inputs = jnp.asarray(np.atleast_2d(self.input_stack)[:T].reshape(T, -1),
                             jnp.float32)
        goals, goal_term = self._goal_sequences(T)
        K, ff, ok = self._backward_jit(states, inputs, goals, goal_term,
                                       jnp.float32(self.lamb))
        if bool(ok):
            self.gains_fb = np.asarray(K)
            self.input_ff = np.asarray(ff).T  # (nu, T) like the reference
        else:
            self.update_unstable = True

    # ------------------------------------------------------------------
    # Fused device solve: the ENTIRE iLQR optimization — max_iterations x
    # (closed-loop rollout via func.step under lax.scan + backward pass +
    # lambda adaptation + revert-to-best + convergence freeze) — is ONE
    # jitted program, where the host loop above pays one dispatch per env
    # step per iteration. vmap of the same program = batched trajectory
    # optimization (solve_batch). Semantics parity with learn()
    # (ilqr.py:96-183): identical improve/revert/convergence ladder; the
    # one deliberate difference is that an unstable backward pass is
    # reverted in the same iteration rather than after one more rollout.
    # ------------------------------------------------------------------
    def _goal_sequences(self, T):
        if self.env.TASK == Task.STABILIZATION:
            goals = np.broadcast_to(
                np.asarray(self.env.X_GOAL, np.float32),
                (T, self.model.nx)).copy()
            goal_term = np.asarray(self.env.X_GOAL, np.float32)
        else:
            X_GOAL = np.asarray(self.env.X_GOAL, np.float32)
            idx = np.clip(np.arange(T), 0, X_GOAL.shape[0] - 1)
            goals = X_GOAL[idx]
            goal_term = X_GOAL[-1]
        return jnp.asarray(goals), jnp.asarray(goal_term)

    def _make_fused_solve(self):
        func = self.env.func
        backward = self._make_backward()
        T = int(self.env.CTRL_FREQ * self.env.EPISODE_LEN_SEC)
        nx, nu = self.model.nx, self.model.nu
        goals, goal_term = self._goal_sequences(T)
        gain = jnp.asarray(self.gain, jnp.float32)
        U_EQ = jnp.asarray(np.atleast_1d(self.model.U_EQ), jnp.float32)
        # Iteration-0 policy == calculate_lqr_action (ilqr.py:314-343).
        K0 = jnp.broadcast_to(-gain, (T, nu, nx))
        ff0 = jax.vmap(lambda g: gain @ g + U_EQ)(goals)        # (T, nu)
        oob_breaks = bool(getattr(self.env, 'done_on_out_of_bound', False))
        lamb_factor = jnp.float32(self.lamb_factor)
        lamb_max = jnp.float32(self.lamb_max)
        eps = jnp.float32(self.epsilon)
        max_iter = int(self.max_iterations)

        def rollout(est0, obs0, K_seq, ff_seq):
            """Closed-loop rollout; freezes after done (host loop breaks)."""
            def body(carry, xs):
                est, obs, done, total, oob = carry
                K_t, ff_t = xs
                a = K_t @ obs[:nx] + ff_t
                est2, out = func.step(est, a)
                est2 = jax.tree.map(
                    lambda n, o: jnp.where(done, o, n), est2, est)
                total = total + jnp.where(done, 0.0, -out.reward)
                oob = jnp.logical_or(
                    oob, jnp.logical_and(jnp.logical_not(done),
                                         out.out_of_bounds))
                new_obs = jnp.where(done, obs, out.obs)
                done2 = jnp.logical_or(done, out.done)
                return (est2, new_obs, done2, total, oob), (obs[:nx], a)

            init = (est0, obs0, jnp.zeros((), bool), jnp.float32(0.0),
                    jnp.zeros((), bool))
            (_, _, _, total, oob), (states, inputs) = jax.lax.scan(
                body, init, (K_seq, ff_seq))
            return states, inputs, total, oob

        def solve(est0, obs0):
            def it_body(carry, i):
                K, ff, Kb, ffb, prev_cost, lamb, prev_imp, conv, abort = carry
                frozen = jnp.logical_or(conv, abort)
                states, inputs, cost, oob = rollout(est0, obs0, K, ff)
                first = i == 0
                stop0 = jnp.logical_and(first, oob) if oob_breaks \
                    else jnp.zeros((), bool)
                delta = cost - prev_cost
                K_new, ff_new, ok = backward(states, inputs, goals,
                                             goal_term, lamb)
                improved = jnp.logical_or(
                    first, jnp.logical_and(delta <= 0.0, ok))
                lamb2 = jnp.where(improved, lamb,
                                  jnp.minimum(lamb * lamb_factor, lamb_max))
                Kb2 = jnp.where(improved, K, Kb)
                ffb2 = jnp.where(improved, ff, ffb)
                prev2 = jnp.where(improved, cost, prev_cost)
                newconv = (jnp.logical_not(first) & improved
                           & (jnp.abs(delta) < eps) & prev_imp)
                prev_imp2 = jnp.logical_and(improved, jnp.logical_not(first))
                K2 = jnp.where(improved, K_new, Kb2)
                ff2 = jnp.where(improved, ff_new, ffb2)
                new = (K2, ff2, Kb2, ffb2, prev2, lamb2, prev_imp2,
                       conv | newconv, abort | stop0)
                # Freeze everything once converged or aborted (host loop
                # breaks; iteration-0 out-of-bounds abort is the host's
                # break-without-policy case, ilqr.py:157-159).
                out_carry = jax.tree.map(
                    lambda o, n: jnp.where(frozen, o, n), carry, new)
                return out_carry, (jnp.where(frozen, prev_cost, cost),
                                   frozen)

            init = (K0, ff0, K0, ff0, jnp.float32(jnp.inf),
                    jnp.float32(1.0), jnp.zeros((), bool),
                    jnp.zeros((), bool), jnp.zeros((), bool))
            (K, ff, Kb, ffb, best_cost, _, _, conv, abort), \
                (costs, frozen_seq) = jax.lax.scan(
                    it_body, init, jnp.arange(max_iter))
            n_iters = jnp.sum(jnp.logical_not(frozen_seq))
            return Kb, ffb, best_cost, costs, conv, abort, n_iters

        return full_matmul_precision(solve)

    def _fused_solve_fn(self):
        if self._fused is None:
            solve = self._make_fused_solve()
            self._fused = jax.jit(solve)
            self._fused_batch = jax.jit(jax.vmap(solve))
            self._reset_batch_jit = jax.jit(self.env.func.reset_batch,
                                            static_argnums=1)
        return self._fused

    def learn_fused(self, env=None, **kwargs):
        """learn() as one device dispatch; sets the same best-policy
        attributes select_action consumes.

        Two deliberate differences from the host loop on stochastic
        envs: (a) randomized-init envs — the host loop re-randomizes the
        initial state every iteration (run() calls env.reset(),
        ilqr.py:349-389) while the fused solve optimizes ONE trajectory
        from a single sampled initial state; (b) disturbed envs — every
        fused iteration replays the SAME noise realization (rollouts
        restart from est0), giving a deterministic optimization, where
        the host loop redraws noise each iteration. They coincide for
        deterministic envs (randomized_init=False, no disturbances)."""
        solve = self._fused_solve_fn()
        est0, obs0 = self.env._reset_jit(self.env._next_key())
        K, ff, cost, costs, conv, abort, n_it = jax.device_get(
            solve(est0, obs0))
        self.gains_fb_best = np.asarray(K)
        self.input_ff_best = np.asarray(ff).T                    # (nu, T)
        self.gains_fb = self.gains_fb_best
        self.input_ff = self.input_ff_best
        self.total_cost = float(cost)
        self.ite_counter = int(n_it)
        self.solve_aborted = bool(abort)
        self.traj_step = 0
        self.max_steps = int(self.env.CTRL_FREQ * self.env.EPISODE_LEN_SEC)
        return float(cost)

    def solve_batch(self, x0s):
        """Batched trajectory optimization: one device call running B
        independent iLQR solves (vmap of the fused program) from initial
        states ``x0s`` (B, nx). Returns dict with stacked per-problem
        feedback gains (B, T, nu, nx), feedforwards (B, nu, T), best
        costs (B,) and per-iteration cost curves (B, max_iterations).
        No reference equivalent (one CasADi process per problem)."""
        assert self.env.COST.value == 'quadratic', \
            'solve_batch assumes quadratic-cost envs (obs == state).'
        self._fused_solve_fn()
        x0s = jnp.asarray(np.atleast_2d(x0s), jnp.float32)
        n = x0s.shape[0]
        est, _obs = self._reset_batch_jit(self.env._next_key(), n)
        est = est.replace(state=x0s,
                          ctrl_step=jnp.zeros((n,), jnp.int32))
        K, ff, cost, costs, conv, abort, n_it = jax.device_get(
            self._fused_batch(est, x0s))
        return {'gains_fb': np.asarray(K),
                'input_ff': np.transpose(np.asarray(ff), (0, 2, 1)),
                'cost': np.asarray(cost),
                'cost_curves': np.asarray(costs),
                'converged': np.asarray(conv),
                'aborted': np.asarray(abort),
                'iterations': np.asarray(n_it)}

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Outer iLQR iteration loop (ilqr.py:96-183)."""
        if self.fused_solve and (env is None or env is self.env):
            # The fused program closes over self.env.func — an explicit
            # different training env must use the host loop.
            return self.learn_fused(**kwargs)
        if env is None:
            env = self.env
        self.lamb = 1.0
        self.ite_counter = 0
        self.update_unstable = False
        previous_total_cost = -float('inf')
        prev_ite_improved = False
        self.max_steps = int(env.CTRL_FREQ * env.EPISODE_LEN_SEC)
        while self.ite_counter < self.max_iterations:
            self.traj_step = 0
            self.run(env=env, max_steps=self.max_steps, training=True)
            self.state_stack = np.vstack((self.state_stack, self.final_obs))
            if (self.ite_counter == 0 and env.done_on_out_of_bound
                    and self.final_info.get('out_of_bounds', False)):
                break
            self.num_steps = np.shape(self.input_stack)[0]
            delta_cost = self.total_cost - previous_total_cost
            if self.ite_counter == 0:
                previous_total_cost = self.total_cost
                self.input_ff_best = np.copy(self.input_ff)
                self.gains_fb_best = np.copy(self.gains_fb)
                self.update_policy(env)
                prev_ite_improved = False
            elif delta_cost > 0.0 or self.update_unstable:
                # Cost increased: revert + raise lambda (ilqr.py:138-160).
                self.lamb *= self.lamb_factor
                self.input_ff = np.copy(self.input_ff_best)
                self.gains_fb = np.copy(self.gains_fb_best)
                prev_ite_improved = False
                if self.lamb > self.lamb_max:
                    self.lamb = self.lamb_max
                self.update_unstable = False
            else:
                previous_total_cost = self.total_cost
                self.input_ff_best = np.copy(self.input_ff)
                self.gains_fb_best = np.copy(self.gains_fb)
                if abs(delta_cost) < self.epsilon and prev_ite_improved:
                    break
                prev_ite_improved = True
                self.update_policy(env)
            self.ite_counter += 1
        self.reset()

    # ------------------------------------------------------------------
    def select_action(self, obs, info=None, training=False):
        """Time-indexed feedback + feedforward (ilqr.py:280-312)."""
        if training:
            if self.ite_counter == 0:
                action, gains_fb, input_ff = self.calculate_lqr_action(
                    obs, self.traj_step)
                if self.traj_step == 0:
                    self.gains_fb = gains_fb.reshape(
                        (1, self.model.nu, self.model.nx))
                    self.input_ff = input_ff.reshape(self.model.nu, 1)
                else:
                    self.gains_fb = np.append(
                        self.gains_fb,
                        gains_fb.reshape((1, self.model.nu, self.model.nx)),
                        axis=0)
                    self.input_ff = np.append(
                        self.input_ff, input_ff.reshape(self.model.nu, 1),
                        axis=1)
            else:
                # Clamp: a previous iteration that ended early (done) leaves
                # fewer recorded gains than this rollout may need.
                step = min(self.traj_step, len(self.gains_fb) - 1)
                action = (self.gains_fb[step] @ obs
                          + self.input_ff[:, step])
        elif self.gains_fb_best is not None:
            step = min(self.traj_step, len(self.gains_fb_best) - 1)
            action = (self.gains_fb_best[step] @ obs
                      + self.input_ff_best[:, step])
        else:
            action, _, _ = self.calculate_lqr_action(obs, self.traj_step)
        if self.traj_step < self.max_steps - 1:
            self.traj_step += 1
        return np.asarray(action)

    def calculate_lqr_action(self, obs, step):
        """Initial-iteration LQR policy (ilqr.py:314-343)."""
        if self.env.TASK == Task.STABILIZATION:
            gains_fb = -self.gain
            input_ff = self.gain @ self.env.X_GOAL + np.atleast_1d(self.model.U_EQ)
        else:
            idx = min(step, len(self.env.X_GOAL) - 1)
            gains_fb = -self.gain
            input_ff = self.gain @ self.env.X_GOAL[idx] + np.atleast_1d(self.model.U_EQ)
        action = gains_fb @ obs + input_ff
        return action, gains_fb, input_ff

    def reset(self):
        self.env.reset()
        self.ite_counter = 0
        self.traj_step = 0
        if not hasattr(self, 'max_steps'):
            self.max_steps = int(self.env.CTRL_FREQ * self.env.EPISODE_LEN_SEC)

    def reset_before_run(self, obs=None, info=None, env=None):
        self.traj_step = 0
        self.setup_results_dict()

    def run(self, env=None, max_steps=500, training=True):
        """Roll out current policy (ilqr.py:349-389)."""
        if env is None:
            env = self.env
        obs, info = env.reset()
        total_cost = 0.0
        for step in range(max_steps):
            action = self.select_action(obs=obs, info=info, training=training)
            if step == 0:
                self.state_stack = obs
                self.input_stack = action
            else:
                self.state_stack = np.vstack((self.state_stack, obs))
                self.input_stack = np.vstack((self.input_stack, action))
            obs, cost, done, info = env.step(action)
            total_cost -= cost
            if done:
                break
        self.final_obs = obs
        self.final_info = info
        self.total_cost = total_cost
