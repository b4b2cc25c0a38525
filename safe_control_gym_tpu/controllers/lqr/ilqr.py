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
                 lamb_max=1000, epsilon=0.01, **kwargs):
        super().__init__(env_func, q_lqr=q_lqr, r_lqr=r_lqr,
                         discrete_dynamics=discrete_dynamics, **kwargs)
        self.max_iterations = max_iterations
        self.lamb_factor = lamb_factor
        self.lamb_max = lamb_max
        self.epsilon = epsilon
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
        if env.TASK == Task.STABILIZATION:
            goals = jnp.broadcast_to(
                jnp.asarray(self.env.X_GOAL, jnp.float32), states.shape)
            goal_term = jnp.asarray(self.env.X_GOAL, jnp.float32)
        else:
            X_GOAL = np.asarray(self.env.X_GOAL)
            idx = np.clip(np.arange(T), 0, X_GOAL.shape[0] - 1)
            goals = jnp.asarray(X_GOAL[idx], jnp.float32)
            goal_term = jnp.asarray(X_GOAL[-1], jnp.float32)
        K, ff, ok = self._backward_jit(states, inputs, goals, goal_term,
                                       jnp.float32(self.lamb))
        if bool(ok):
            self.gains_fb = np.asarray(K)
            self.input_ff = np.asarray(ff).T  # (nu, T) like the reference
        else:
            self.update_unstable = True

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Outer iLQR iteration loop (ilqr.py:96-183)."""
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
