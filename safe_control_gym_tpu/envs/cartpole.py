"""CartPole environment — TPU-native rebuild of
envs/gym_control/cartpole.py (775 LoC reference).

The reference simulates a URDF cartpole in PyBullet (rewriting the URDF XML
each reset for pole-length randomization, cartpole.py:719-775) and carries a
separate CasADi prior. Here the ground-truth simulation is the analytic
cartpole ODE (identical to the reference's symbolic model, cartpole.py:
411-414) integrated with ``PYB_STEPS_PER_CTRL`` semi-implicit-Euler substeps
under ``lax.scan`` — PyBullet's integrator on the same mechanism — and domain
randomization is just resampling the parameter pytree (no XML, no reload).

Parity map:
* action pipeline / scale 10 / normalization (cartpole.py:439-447, 479-502,
  505-530);
* obs space thresholds x 2.4, theta 90deg, x2 margin (:449-473);
* "tab force" dynamics disturbance + adversary on the pole COM (:532-583)
  via :func:`cartpole_dynamics_forced`;
* RL exp reward with wrapped angle / quadratic cost (:611-652);
* done on goal-reached / out-of-bounds (:654-672);
* weighted-MSE info (:674-696);
* randomization specs (:75-113), symbolic model (:390-437).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from safe_control_gym_tpu.envs.benchmark_env import (BenchmarkEnv, Cost, Task)
from safe_control_gym_tpu.envs.benchmark_env import _compile_rand_sampler
from safe_control_gym_tpu.envs import constraints as constraints_mod
from safe_control_gym_tpu.envs.dynamics import (CartPoleParams,
                                                cartpole_dynamics,
                                                cartpole_dynamics_forced)
from safe_control_gym_tpu.envs.symbolic import AnalyticModel
from safe_control_gym_tpu.math.linalg import get_cost_weight_matrix
from safe_control_gym_tpu.math.rotations import normalize_angle

__all__ = ['CartPole']


class CartPole(BenchmarkEnv):
    """Cartpole stabilization/tracking benchmark task."""

    NAME = 'cartpole'

    AVAILABLE_CONSTRAINTS = dict(
        abs_bound=constraints_mod.SymmetricStateConstraint,
        **constraints_mod.GENERAL_CONSTRAINTS,
    )

    DISTURBANCE_MODES = {'observation': {'dim': 4}, 'action': {'dim': 1},
                         'dynamics': {'dim': 2}}

    INERTIAL_PROP_RAND_INFO = {
        'pole_length': {'distrib': 'choice', 'args': [[1, 5, 10]]},
        'cart_mass': {'distrib': 'uniform', 'low': 0.5, 'high': 1.5},
        'pole_mass': {'distrib': 'uniform', 'low': 0.05, 'high': 0.15},
    }

    INIT_STATE_RAND_INFO = {
        'init_x': {'distrib': 'uniform', 'low': -0.05, 'high': 0.05},
        'init_x_dot': {'distrib': 'uniform', 'low': -0.05, 'high': 0.05},
        'init_theta': {'distrib': 'uniform', 'low': -0.05, 'high': 0.05},
        'init_theta_dot': {'distrib': 'uniform', 'low': -0.05, 'high': 0.05},
    }

    TASK_INFO = {
        'stabilization_goal': [0],
        'stabilization_goal_tolerance': 0.05,
        'trajectory_type': 'circle',
        'num_cycles': 1,
        'trajectory_plane': 'zx',
        'trajectory_position_offset': [0, 0],
        'trajectory_scale': 0.2,
    }

    def __init__(self,
                 init_state=None,
                 inertial_prop=None,
                 obs_goal_horizon: int = 0,
                 obs_wrap_angle: bool = False,
                 rew_state_weight=1.0,
                 rew_act_weight=0.0001,
                 rew_exponential: bool = True,
                 done_on_out_of_bound: bool = True,
                 info_mse_metric_state_weight=None,
                 **kwargs):
        self.obs_goal_horizon = obs_goal_horizon
        self.obs_wrap_angle = obs_wrap_angle
        self.rew_state_weight = np.array(rew_state_weight, ndmin=1, dtype=float)
        self.rew_act_weight = np.array(rew_act_weight, ndmin=1, dtype=float)
        self.Q = get_cost_weight_matrix(self.rew_state_weight, 4)
        self.R = get_cost_weight_matrix(self.rew_act_weight, 1)
        self.rew_exponential = rew_exponential
        self.done_on_out_of_bound = done_on_out_of_bound
        if info_mse_metric_state_weight is None:
            self.info_mse_metric_state_weight = np.array([1, 0, 1, 0], dtype=float)
        else:
            if len(info_mse_metric_state_weight) != 4:
                raise ValueError('[ERROR] in CartPole.__init__(), wrong info_mse_metric_state_weight argument size.')
            self.info_mse_metric_state_weight = np.array(
                info_mse_metric_state_weight, ndmin=1, dtype=float)

        # Default physical parameters (cartpole_template.urdf; cartpole.py:200-211).
        self.GRAVITY_ACC = 9.8
        EFFECTIVE_POLE_LENGTH, POLE_MASS, CART_MASS = 0.5, 0.1, 1.0
        if inertial_prop is None:
            self.EFFECTIVE_POLE_LENGTH = EFFECTIVE_POLE_LENGTH
            self.POLE_MASS = POLE_MASS
            self.CART_MASS = CART_MASS
        elif isinstance(inertial_prop, dict):
            self.EFFECTIVE_POLE_LENGTH = inertial_prop.get('pole_length', EFFECTIVE_POLE_LENGTH)
            self.POLE_MASS = inertial_prop.get('pole_mass', POLE_MASS)
            self.CART_MASS = inertial_prop.get('cart_mass', CART_MASS)
        else:
            raise ValueError('[ERROR] in CartPole.__init__(), inertial_prop incorrect format.')

        # Initial state config (cartpole.py:185-197).
        if init_state is None:
            self.INIT_X = self.INIT_X_DOT = self.INIT_THETA = self.INIT_THETA_DOT = 0.0
        elif isinstance(init_state, (np.ndarray, list, tuple)):
            self.INIT_X, self.INIT_X_DOT, self.INIT_THETA, self.INIT_THETA_DOT = init_state
        elif isinstance(init_state, dict):
            self.INIT_X = init_state.get('init_x', 0)
            self.INIT_X_DOT = init_state.get('init_x_dot', 0)
            self.INIT_THETA = init_state.get('init_theta', 0)
            self.INIT_THETA_DOT = init_state.get('init_theta_dot', 0)
        else:
            raise ValueError('[ERROR] in CartPole.__init__(), init_state incorrect format.')

        super().__init__(init_state=init_state, inertial_prop=inertial_prop,
                         **kwargs)

        self._set_action_space()
        self._set_observation_space()
        self._setup_task_references()
        self._setup_symbolic()
        self._setup_constraints()
        self._setup_disturbances()
        self._compile_samplers()
        self._install_pallas_advance()
        self._build_functional()

    # ------------------------------------------------------------------
    # Spaces (cartpole.py:439-473)
    # ------------------------------------------------------------------
    def _set_action_space(self):
        self.action_scale = 10
        self.physical_action_bounds = (-np.atleast_1d(float(self.action_scale)),
                                       np.atleast_1d(float(self.action_scale)))
        self.action_threshold = 1 if self.NORMALIZED_RL_ACTION_SPACE else self.action_scale
        self.action_space = spaces.Box(low=-self.action_threshold,
                                       high=self.action_threshold, shape=(1,))
        self.ACTION_LABELS = ['U']
        self.ACTION_UNITS = ['N'] if not self.NORMALIZED_RL_ACTION_SPACE else ['-']

    def _set_observation_space(self):
        self.x_threshold = 2.4
        self.x_dot_threshold = 20
        self.theta_threshold_radians = 90 * math.pi / 180
        self.theta_dot_threshold = 20
        obs_bound = np.array([self.x_threshold * 2, self.x_dot_threshold,
                              self.theta_threshold_radians * 2,
                              self.theta_dot_threshold])
        self.state_space = spaces.Box(low=-obs_bound, high=obs_bound,
                                      dtype=np.float32)
        if self.COST == Cost.RL_REWARD and self.TASK == Task.TRAJ_TRACKING \
                and self.obs_goal_horizon > 0:
            obs_bound = np.concatenate([obs_bound] * (1 + self.obs_goal_horizon))
        elif self.COST == Cost.RL_REWARD and self.TASK == Task.STABILIZATION \
                and self.obs_goal_horizon > 0:
            obs_bound = np.concatenate([obs_bound] * 2)
        self.observation_space = spaces.Box(low=-obs_bound, high=obs_bound,
                                            dtype=np.float32)
        self.STATE_LABELS = ['x', 'x_dot', 'theta', 'theta_dot']
        self.STATE_UNITS = ['m', 'm/s', 'rad', 'rad/s']

    # ------------------------------------------------------------------
    # Task references (cartpole.py:215-233)
    # ------------------------------------------------------------------
    def _setup_task_references(self):
        self.U_GOAL = np.zeros(1)
        if self.TASK == Task.STABILIZATION:
            self.X_GOAL = np.hstack(
                [self.TASK_INFO['stabilization_goal'][0], 0.0, 0.0, 0.0])
        elif self.TASK == Task.TRAJ_TRACKING:
            POS_REF, VEL_REF, _ = self._generate_trajectory(
                traj_type=self.TASK_INFO['trajectory_type'],
                traj_length=self.EPISODE_LEN_SEC,
                num_cycles=self.TASK_INFO['num_cycles'],
                traj_plane=self.TASK_INFO['trajectory_plane'],
                position_offset=np.array(self.TASK_INFO['trajectory_position_offset']),
                scaling=self.TASK_INFO['trajectory_scale'],
                sample_time=self.CTRL_TIMESTEP)
            self.X_GOAL = np.vstack([
                POS_REF[:, 0], VEL_REF[:, 0],
                np.zeros(POS_REF.shape[0]), np.zeros(VEL_REF.shape[0]),
            ]).T

    # ------------------------------------------------------------------
    # Symbolic prior (cartpole.py:390-437)
    # ------------------------------------------------------------------
    def _setup_symbolic(self, prior_prop={}, **kwargs):
        length = prior_prop.get('pole_length', self.EFFECTIVE_POLE_LENGTH)
        m = prior_prop.get('pole_mass', self.POLE_MASS)
        M = prior_prop.get('cart_mass', self.CART_MASS)
        params = CartPoleParams(
            pole_length=jnp.float32(length), pole_mass=jnp.float32(m),
            cart_mass=jnp.float32(M), gravity=jnp.float32(self.GRAVITY_ACC))
        self.symbolic = AnalyticModel(
            dyn_fn=lambda x, u: cartpole_dynamics(x, u, params),
            nx=4, nu=1, dt=self.CTRL_TIMESTEP,
            params={
                'pole_length': length, 'pole_mass': m, 'cart_mass': M,
                'X_EQ': np.zeros(4),
                'U_EQ': np.atleast_2d(self.U_GOAL)[0, :],
            })

    # ------------------------------------------------------------------
    # Functional-core hooks
    # ------------------------------------------------------------------
    def _compile_samplers(self):
        self._prop_sampler = _compile_rand_sampler(
            self.INERTIAL_PROP_RAND_INFO, ['pole_length', 'cart_mass', 'pole_mass'])
        self._init_sampler = _compile_rand_sampler(
            self.INIT_STATE_RAND_INFO,
            ['init_x', 'init_x_dot', 'init_theta', 'init_theta_dot'])

    def _nominal_dyn_params(self):
        return CartPoleParams(
            pole_length=jnp.float32(self.EFFECTIVE_POLE_LENGTH),
            pole_mass=jnp.float32(self.POLE_MASS),
            cart_mass=jnp.float32(self.CART_MASS),
            gravity=jnp.float32(self.GRAVITY_ACC))

    def _sample_dyn_params(self, key, nominal: CartPoleParams):
        base = {'pole_length': nominal.pole_length,
                'cart_mass': nominal.cart_mass,
                'pole_mass': nominal.pole_mass}
        drawn = self._prop_sampler(key, base)
        return nominal.replace(pole_length=jnp.asarray(drawn['pole_length'], jnp.float32),
                               cart_mass=jnp.asarray(drawn['cart_mass'], jnp.float32),
                               pole_mass=jnp.asarray(drawn['pole_mass'], jnp.float32))

    def _nominal_init_state(self):
        return np.array([self.INIT_X, self.INIT_X_DOT, self.INIT_THETA,
                         self.INIT_THETA_DOT], dtype=np.float32)

    def _sample_init_state(self, key, nominal):
        base = {'init_x': nominal[0], 'init_x_dot': nominal[1],
                'init_theta': nominal[2], 'init_theta_dot': nominal[3]}
        d = self._init_sampler(key, base)
        return jnp.stack([jnp.asarray(d['init_x'], jnp.float32),
                          jnp.asarray(d['init_x_dot'], jnp.float32),
                          jnp.asarray(d['init_theta'], jnp.float32),
                          jnp.asarray(d['init_theta_dot'], jnp.float32)])

    def _denormalize_action_pure(self, action):
        if self.NORMALIZED_RL_ACTION_SPACE:
            return self.action_scale * action
        return action

    def denormalize_action(self, action):
        if self.NORMALIZED_RL_ACTION_SPACE:
            return self.action_scale * action
        return action

    def normalize_action(self, action):
        if self.NORMALIZED_RL_ACTION_SPACE:
            return action / self.action_scale
        return action

    def _advance_pure(self, x, clipped_action, dyn_force, params):
        """PYB_STEPS_PER_CTRL semi-implicit-Euler substeps with held force
        and tab-force disturbance (cartpole.py:532-583) fused in one scan."""
        dt = self.PYB_TIMESTEP

        def substep(carry, _):
            xdot = cartpole_dynamics_forced(carry, clipped_action, dyn_force, params)
            # Semi-implicit Euler: velocities first, positions from new vel.
            v = jnp.stack([carry[1] + dt * xdot[1], carry[3] + dt * xdot[3]])
            nxt = jnp.stack([carry[0] + dt * v[0], v[0],
                             carry[2] + dt * v[1], v[1]])
            return nxt, None

        out, _ = jax.lax.scan(substep, x, None,
                              length=self.PYB_STEPS_PER_CTRL)
        return out

    def _install_pallas_advance(self):
        """Route the BATCHED physics advance through the fused Pallas kernel.

        ``jax.vmap(step_fn)`` normally turns the per-env substep scan into
        batched VPU ops with an HBM round-trip per substep; the Pallas
        kernel (ops/pallas_kernels.py) keeps the whole control step in VMEM
        and measures ~4x the XLA path (313M vs 79M ctrl steps/s at 4096
        envs). A ``custom_vmap`` rule swaps it in transparently whenever the
        step is vmapped — single-env semantics and gradients are untouched
        (the rule only covers the forward batched eval; to differentiate
        THROUGH a vmapped rollout on TPU, construct the env with
        ``pallas_physics=False`` — single-env ``jax.grad`` needs no opt-out).

        Installed only on the TPU backend with shared (non-randomized)
        inertial parameters — the kernel broadcasts one parameter vector.
        """
        if (not getattr(self, 'pallas_physics', True)
                or jax.default_backend() != 'tpu'
                or self.RANDOMIZED_INERTIAL_PROP):
            return
        try:
            from jax import custom_batching

            from safe_control_gym_tpu.ops.pallas_kernels import \
                cartpole_advance_pallas
        except Exception:
            return
        n_sub = int(self.PYB_STEPS_PER_CTRL)
        dt = float(self.PYB_TIMESTEP)
        single = self._advance_pure

        adv = custom_batching.custom_vmap(
            lambda x, u, f, p: single(x, u, f, p))

        @adv.def_vmap
        def _rule(axis_size, in_batched, x, u, f, params):
            # ``in_batched`` mirrors each argument's pytree structure:
            # broadcast leaf-wise (params carries per-leaf flags).
            def bcast(v, b):
                return jax.tree.map(
                    lambda l, bl: l if bl else jnp.broadcast_to(
                        jnp.asarray(l), (axis_size,) + jnp.shape(l)), v, b)
            x = bcast(x, in_batched[0])
            u = bcast(u, in_batched[1])
            f = bcast(f, in_batched[2])
            p0 = (jax.tree.map(lambda l: l[0], params)
                  if all(jax.tree.leaves(in_batched[3])) else params)
            pv = jnp.stack([p0.pole_mass, p0.cart_mass,
                            p0.pole_length, p0.gravity]).astype(jnp.float32)
            B = x.shape[0]
            block = max(128, min(1024, ((B + 127) // 128) * 128))
            out = cartpole_advance_pallas(x, u.reshape(B), f, pv, n_sub, dt,
                                          block_b=block)
            return out, True

        self._advance_pure = adv

    def _obs_transform_pure(self, state, key):
        if self.obs_wrap_angle:
            return state.at[2].set(normalize_angle(state[2]))
        return state

    def _rl_reward_pure(self, state, noisy_action, step):
        """Negative quadratic reward with wrapped angle (cartpole.py:611-635).
        Note: state weights apply to the wrapped state, action term uses the
        raw action quadratic (not action error)."""
        wrapped = state.at[2].set(normalize_angle(state[2]))
        X_GOAL = jnp.asarray(np.atleast_2d(self.X_GOAL), jnp.float32)
        if self.TASK == Task.STABILIZATION:
            ref = X_GOAL[0]
        else:
            wp = jnp.clip(step + 1, 0, X_GOAL.shape[0] - 1)
            ref = X_GOAL[wp]
        err = wrapped - ref
        w_s = jnp.asarray(self.rew_state_weight
                          if len(self.rew_state_weight) == 4
                          else np.full(4, self.rew_state_weight[0]), jnp.float32)
        w_a = jnp.asarray(self.rew_act_weight
                          if len(self.rew_act_weight) == 1
                          else self.rew_act_weight, jnp.float32)
        dist = jnp.sum(w_s * err * err) + jnp.sum(w_a * noisy_action * noisy_action)
        rew = -dist
        if self.rew_exponential:
            rew = jnp.exp(rew)
        return rew

    def _quadratic_reward_pure(self, state, clipped_action, step):
        """-symbolic loss (cartpole.py:636-652)."""
        X_GOAL = jnp.asarray(np.atleast_2d(self.X_GOAL), jnp.float32)
        if self.TASK == Task.STABILIZATION:
            ref = X_GOAL[0]
        else:
            wp = jnp.clip(step, 0, X_GOAL.shape[0] - 1)
            ref = X_GOAL[wp]
        Q = jnp.asarray(self.Q, jnp.float32)
        R = jnp.asarray(self.R, jnp.float32)
        dx = state - ref
        du = clipped_action - jnp.asarray(self.U_GOAL, jnp.float32)
        return -(0.5 * dx @ Q @ dx + 0.5 * du @ R @ du)

    def _oob_pure(self, state):
        """x/theta out of bounds (cartpole.py:662-670)."""
        return jnp.logical_or(
            jnp.abs(state[0]) > self.x_threshold,
            jnp.abs(state[2]) > self.theta_threshold_radians)

    def _draw_state(self, ax):
        """Draw the actual scene — track, cart body, pole, axle, goal —
        for render()/GUI frames (the PyBullet scene render's role,
        cartpole.py:173-180)."""
        from matplotlib.patches import Circle, Rectangle
        x, _, theta, _ = np.asarray(self.state)
        L = 2 * float(self.EFFECTIVE_POLE_LENGTH)
        ax.plot([-2.5, 2.5], [0, 0], 'k-', lw=1)
        for thr in (-self.x_threshold, self.x_threshold):
            ax.plot([thr, thr], [-0.08, 0.08], 'k:', lw=1)
        if self.TASK == Task.TRAJ_TRACKING and np.ndim(self.X_GOAL) == 2:
            ax.plot(self.X_GOAL[:, 0], np.full(self.X_GOAL.shape[0], -0.12),
                    'g--', lw=0.8)
            wp = min(int(self.ctrl_step_counter), self.X_GOAL.shape[0] - 1)
            ax.plot([self.X_GOAL[wp, 0]], [-0.12], 'g^', ms=6)
        else:
            g = np.atleast_2d(self.X_GOAL)[0]
            ax.plot([g[0]], [-0.12], 'g*', ms=10)
        ax.add_patch(Rectangle((x - 0.15, -0.05), 0.3, 0.1,
                               color='tab:blue'))
        ax.plot([x, x + L * np.sin(theta)], [0.05, 0.05 + L * np.cos(theta)],
                'r-', lw=3, solid_capstyle='round')
        ax.add_patch(Circle((x, 0.05), 0.03, color='k', zorder=3))
        ax.set_xlim(-2.6, 2.6)
        ax.set_ylim(-0.5, 1.5)

    def _mse_pure(self, state, step):
        """Weighted MSE info (cartpole.py:674-696)."""
        X_GOAL = jnp.asarray(np.atleast_2d(self.X_GOAL), jnp.float32)
        if self.TASK == Task.STABILIZATION:
            err = state - X_GOAL[0]
        else:
            wrapped = state.at[2].set(normalize_angle(state[2]))
            wp = jnp.clip(step + 1, 0, X_GOAL.shape[0] - 1)
            err = wrapped - X_GOAL[wp]
        w = jnp.asarray(self.info_mse_metric_state_weight, jnp.float32)
        err = err * w
        return jnp.sum(err ** 2)
