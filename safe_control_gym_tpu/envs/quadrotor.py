"""Quadrotor environments (1D / 2D / 3D) — TPU-native rebuild of
envs/gym_pybullet_drones/{base_aviary.py, quadrotor.py, quadrotor_utils.py}
(580 + 941 + 60 LoC reference).

The reference simulates a CF2X Crazyflie URDF in PyBullet with selectable
physics modes (base_aviary.py:26-40) and exposes reduced 2/6/12-dim states.
Here the ground truth is the analytic rigid-body ODE in the reduced
coordinates, integrated with ``PYB_STEPS_PER_CTRL`` semi-implicit-Euler
substeps (PyBullet's scheme) fused in one ``lax.scan``; the commanded thrust
passes through the same motor model (thrust -> PWM -> RPM -> per-motor
forces, quadrotor_utils.py:16-60) so motor saturation is preserved.

Physics modes map as:
* ``pyb``      — semi-implicit Euler on the analytic ODE (default);
* ``dyn``      — explicit Euler (base_aviary.py:462-511 semantics);
* ``pyb_gnd`` / ``pyb_drag`` / ``pyb_dw`` / ``pyb_gnd_drag_dw`` — add the
  analytic ground-effect / drag models (base_aviary.py:386-441). Downwash is
  a no-op for single-drone envs in the reference (delta z of a drone with
  itself is 0, base_aviary.py:443-460) and therefore here too.

Parity map (cited where implemented): QUAD_TYPE-dependent spaces and
randomization (quadrotor.py:179-259), X_GOAL/U_GOAL (:261-323), symbolic
models (:468-604), action preprocessing with motor model (:722-747),
observation (:777-817), RL reward on action error (:819-845), done mask
(:864-894), MSE weights (:186-199).
"""

from __future__ import annotations

import math
from copy import deepcopy
from enum import IntEnum

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from safe_control_gym_tpu.envs.benchmark_env import (BenchmarkEnv, Cost, Task,
                                                     _compile_rand_sampler)
from safe_control_gym_tpu.envs import constraints as constraints_mod
from safe_control_gym_tpu.envs.dynamics import (QuadParams, cmd2pwm, pwm2rpm,
                                                quad1d_dynamics,
                                                quad2d_dynamics,
                                                quad3d_dynamics)
from safe_control_gym_tpu.envs.symbolic import AnalyticModel
from safe_control_gym_tpu.math.linalg import get_cost_weight_matrix
from safe_control_gym_tpu.math.rotations import (normalize_angle, rot_xyz,
                                                 transform_trajectory)

__all__ = ['QuadType', 'Quadrotor']


class QuadType(IntEnum):
    """Quadrotor motion types (quadrotor_utils.py:8-13)."""
    ONE_D = 1
    TWO_D = 2
    THREE_D = 3


GROUND_PLANE_Z = -0.05  # base_aviary.py:107


class Quadrotor(BenchmarkEnv):
    """1D/2D/3D quadrotor stabilization & tracking benchmark."""

    NAME = 'quadrotor'

    AVAILABLE_CONSTRAINTS = dict(constraints_mod.GENERAL_CONSTRAINTS)

    DISTURBANCE_MODES = {  # dims set at runtime from QUAD_TYPE (quadrotor.py:714-720)
        'observation': {'dim': -1}, 'action': {'dim': -1}, 'dynamics': {'dim': -1}}

    BASE_INERTIAL_PROP_RAND_INFO = {
        'M': {'distrib': 'uniform', 'low': 0.022, 'high': 0.032},
        'Ixx': {'distrib': 'uniform', 'low': 1.3e-5, 'high': 1.5e-5},
        'Iyy': {'distrib': 'uniform', 'low': 1.3e-5, 'high': 1.5e-5},
        'Izz': {'distrib': 'uniform', 'low': 2.07e-5, 'high': 2.27e-5},
    }

    BASE_INIT_STATE_RAND_INFO = {
        'init_x': {'distrib': 'uniform', 'low': -0.5, 'high': 0.5},
        'init_x_dot': {'distrib': 'uniform', 'low': -0.01, 'high': 0.01},
        'init_y': {'distrib': 'uniform', 'low': -0.5, 'high': 0.5},
        'init_y_dot': {'distrib': 'uniform', 'low': -0.01, 'high': 0.01},
        'init_z': {'distrib': 'uniform', 'low': 0.1, 'high': 1.5},
        'init_z_dot': {'distrib': 'uniform', 'low': -0.01, 'high': 0.01},
        'init_phi': {'distrib': 'uniform', 'low': -0.3, 'high': 0.3},
        'init_theta': {'distrib': 'uniform', 'low': -0.3, 'high': 0.3},
        'init_psi': {'distrib': 'uniform', 'low': -0.3, 'high': 0.3},
        'init_p': {'distrib': 'uniform', 'low': -0.01, 'high': 0.01},
        'init_theta_dot': {'distrib': 'uniform', 'low': -0.01, 'high': 0.01},
        'init_q': {'distrib': 'uniform', 'low': -0.01, 'high': 0.01},
        'init_r': {'distrib': 'uniform', 'low': -0.01, 'high': 0.01},
    }

    INIT_STATE_LABELS = {
        QuadType.ONE_D: ['init_x', 'init_x_dot'],
        QuadType.TWO_D: ['init_x', 'init_x_dot', 'init_z', 'init_z_dot',
                         'init_theta', 'init_theta_dot'],
        QuadType.THREE_D: ['init_x', 'init_x_dot', 'init_y', 'init_y_dot',
                           'init_z', 'init_z_dot', 'init_phi', 'init_theta',
                           'init_psi', 'init_p', 'init_q', 'init_r'],
    }

    TASK_INFO = {
        'stabilization_goal': [0, 1],
        'stabilization_goal_tolerance': 0.05,
        'trajectory_type': 'circle',
        'num_cycles': 1,
        'trajectory_plane': 'zx',
        'trajectory_position_offset': [0.5, 0],
        'trajectory_scale': -0.5,
        'proj_point': [0, 0, 0.5],
        'proj_normal': [0, 1, 1],
    }

    def __init__(self,
                 init_state=None,
                 inertial_prop=None,
                 quad_type: QuadType = QuadType.TWO_D,
                 physics: str = 'pyb',
                 norm_act_scale: float = 0.1,
                 obs_goal_horizon: int = 0,
                 rew_state_weight=1.0,
                 rew_act_weight=0.0001,
                 rew_exponential: bool = True,
                 done_on_out_of_bound: bool = True,
                 info_mse_metric_state_weight=None,
                 **kwargs):
        self.QUAD_TYPE = QuadType(quad_type)
        self.PHYSICS = physics
        self.norm_act_scale = norm_act_scale
        self.obs_goal_horizon = obs_goal_horizon
        self.rew_state_weight = np.array(rew_state_weight, ndmin=1, dtype=float)
        self.rew_act_weight = np.array(rew_act_weight, ndmin=1, dtype=float)
        self.rew_exponential = rew_exponential
        self.done_on_out_of_bound = done_on_out_of_bound

        nx = {QuadType.ONE_D: 2, QuadType.TWO_D: 6, QuadType.THREE_D: 12}[self.QUAD_TYPE]
        if info_mse_metric_state_weight is None:
            default_w = {
                QuadType.ONE_D: [1, 0],
                QuadType.TWO_D: [1, 0, 1, 0, 0, 0],
                QuadType.THREE_D: [1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0],
            }[self.QUAD_TYPE]
            self.info_mse_metric_state_weight = np.array(default_w, dtype=float)
        else:
            if len(info_mse_metric_state_weight) != nx:
                raise ValueError('[ERROR] in Quadrotor.__init__(), wrong info_mse_metric_state_weight argument size.')
            self.info_mse_metric_state_weight = np.array(
                info_mse_metric_state_weight, ndmin=1, dtype=float)

        # CF2X physical constants (cf2x.urdf + base_aviary.py:123-131).
        self.GRAVITY_ACC = 9.8
        self.MASS = 0.027
        self.L = 0.0397
        self.J = np.diag([1.4e-5, 1.4e-5, 2.17e-5])
        self.KF = 3.16e-10
        self.KM = 7.94e-12
        self.THRUST2WEIGHT_RATIO = 2.25
        self.GND_EFF_COEFF = 11.36859
        self.PROP_RADIUS = 2.31348e-2
        self.DRAG_COEFF = np.array([9.1785e-7, 9.1785e-7, 10.311e-7])
        self.PWM2RPM_SCALE = 0.2685
        self.PWM2RPM_CONST = 4070.3
        self.MIN_PWM = 20000.0
        self.MAX_PWM = 65535.0
        self.GROUND_PLANE_Z = GROUND_PLANE_Z

        # Inertial prop overrides (quadrotor.py:240-259).
        if inertial_prop is None:
            pass
        elif self.QUAD_TYPE == QuadType.ONE_D and np.array(inertial_prop).shape == (1,):
            self.MASS = float(np.array(inertial_prop)[0])
        elif self.QUAD_TYPE == QuadType.TWO_D and np.array(inertial_prop).shape == (2,):
            self.MASS, self.J[1, 1] = np.array(inertial_prop)
        elif self.QUAD_TYPE == QuadType.THREE_D and np.array(inertial_prop).shape == (4,):
            self.MASS, self.J[0, 0], self.J[1, 1], self.J[2, 2] = np.array(inertial_prop)
        elif isinstance(inertial_prop, dict):
            self.MASS = inertial_prop.get('M', self.MASS)
            self.J[0, 0] = inertial_prop.get('Ixx', self.J[0, 0])
            self.J[1, 1] = inertial_prop.get('Iyy', self.J[1, 1])
            self.J[2, 2] = inertial_prop.get('Izz', self.J[2, 2])
        else:
            raise ValueError('[ERROR] in Quadrotor.__init__(), inertial_prop incorrect format.')

        # Derived motor constants (base_aviary.py:123-131).
        self.GRAVITY = self.GRAVITY_ACC * self.MASS
        self.HOVER_RPM = np.sqrt(self.GRAVITY / (4 * self.KF))
        self.MAX_RPM = np.sqrt((self.THRUST2WEIGHT_RATIO * self.GRAVITY) / (4 * self.KF))
        self.MAX_THRUST = 4 * self.KF * self.MAX_RPM ** 2
        self.GND_EFF_H_CLIP = 0.25 * self.PROP_RADIUS * np.sqrt(
            (15 * self.MAX_RPM ** 2 * self.KF * self.GND_EFF_COEFF) / self.MAX_THRUST)

        # Initial state (quadrotor.py:208-231).
        labels = self.INIT_STATE_LABELS[self.QUAD_TYPE]
        if init_state is None:
            for name in labels:
                setattr(self, name.upper(), 0.0)
        elif isinstance(init_state, (np.ndarray, list, tuple)):
            for i, name in enumerate(labels):
                setattr(self, name.upper(), float(np.asarray(init_state)[i]))
        elif isinstance(init_state, dict):
            for name in labels:
                setattr(self, name.upper(), float(init_state.get(name, 0.0)))
        else:
            raise ValueError('[ERROR] in Quadrotor.__init__(), init_state incorrect format.')

        # Randomization info filtered by quad type (quadrotor.py:208-238).
        self.INIT_STATE_RAND_INFO = {
            k: v for k, v in deepcopy(self.BASE_INIT_STATE_RAND_INFO).items()
            if k in labels}
        self.INERTIAL_PROP_RAND_INFO = deepcopy(self.BASE_INERTIAL_PROP_RAND_INFO)
        if self.QUAD_TYPE == QuadType.ONE_D:
            for k in ('Ixx', 'Iyy', 'Izz'):
                self.INERTIAL_PROP_RAND_INFO.pop(k, None)
        elif self.QUAD_TYPE == QuadType.TWO_D:
            for k in ('Ixx', 'Izz'):
                self.INERTIAL_PROP_RAND_INFO.pop(k, None)

        # Disturbance dims per quad type (quadrotor.py:714-720).
        nu = {QuadType.ONE_D: 1, QuadType.TWO_D: 2, QuadType.THREE_D: 4}[self.QUAD_TYPE]
        dyn_dim = {QuadType.ONE_D: 1, QuadType.TWO_D: 2, QuadType.THREE_D: 3}[self.QUAD_TYPE]
        self.DISTURBANCE_MODES = {
            'observation': {'dim': nx}, 'action': {'dim': nu},
            'dynamics': {'dim': dyn_dim}}

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
    # Spaces (quadrotor.py:606-712)
    # ------------------------------------------------------------------
    def _set_action_space(self):
        action_dim = {QuadType.ONE_D: 1, QuadType.TWO_D: 2,
                      QuadType.THREE_D: 4}[self.QUAD_TYPE]
        self.ACTION_LABELS = ['T'] if action_dim == 1 else \
            [f'T{i + 1}' for i in range(action_dim)]
        self.ACTION_UNITS = (['N'] * action_dim
                             if not self.NORMALIZED_RL_ACTION_SPACE
                             else ['-'] * action_dim)
        n_mot = 4 / action_dim
        a_low = self.KF * n_mot * (self.PWM2RPM_SCALE * self.MIN_PWM + self.PWM2RPM_CONST) ** 2
        a_high = self.KF * n_mot * (self.PWM2RPM_SCALE * self.MAX_PWM + self.PWM2RPM_CONST) ** 2
        self.physical_action_bounds = (np.full(action_dim, a_low, np.float32),
                                       np.full(action_dim, a_high, np.float32))
        self.hover_thrust = self.GRAVITY_ACC * self.MASS / action_dim
        if self.NORMALIZED_RL_ACTION_SPACE:
            self.action_space = spaces.Box(low=-np.ones(action_dim),
                                           high=np.ones(action_dim),
                                           dtype=np.float32)
        else:
            self.action_space = spaces.Box(low=self.physical_action_bounds[0],
                                           high=self.physical_action_bounds[1],
                                           dtype=np.float32)

    def _set_observation_space(self):
        self.x_threshold = 2
        self.y_threshold = 2
        self.z_threshold = 2
        self.x_dot_threshold = 30
        self.y_dot_threshold = 30
        self.z_dot_threshold = 30
        self.phi_threshold_radians = 85 * math.pi / 180
        self.theta_threshold_radians = 85 * math.pi / 180
        self.psi_threshold_radians = 180 * math.pi / 180
        ang_dot = 500 * math.pi / 180
        if self.QUAD_TYPE == QuadType.ONE_D:
            low = np.array([self.GROUND_PLANE_Z, -self.z_dot_threshold])
            high = np.array([self.z_threshold, self.z_dot_threshold])
            self.STATE_LABELS = ['z', 'z_dot']
            self.STATE_UNITS = ['m', 'm/s']
        elif self.QUAD_TYPE == QuadType.TWO_D:
            low = np.array([-self.x_threshold, -self.x_dot_threshold,
                            self.GROUND_PLANE_Z, -self.z_dot_threshold,
                            -self.theta_threshold_radians, -ang_dot])
            high = np.array([self.x_threshold, self.x_dot_threshold,
                             self.z_threshold, self.z_dot_threshold,
                             self.theta_threshold_radians, ang_dot])
            self.STATE_LABELS = ['x', 'x_dot', 'z', 'z_dot', 'theta', 'theta_dot']
            self.STATE_UNITS = ['m', 'm/s', 'm', 'm/s', 'rad', 'rad/s']
        else:
            low = np.array([-self.x_threshold, -self.x_dot_threshold,
                            -self.y_threshold, -self.y_dot_threshold,
                            self.GROUND_PLANE_Z, -self.z_dot_threshold,
                            -self.phi_threshold_radians,
                            -self.theta_threshold_radians,
                            -self.psi_threshold_radians,
                            -ang_dot, -ang_dot, -ang_dot])
            high = np.array([self.x_threshold, self.x_dot_threshold,
                             self.y_threshold, self.y_dot_threshold,
                             self.z_threshold, self.z_dot_threshold,
                             self.phi_threshold_radians,
                             self.theta_threshold_radians,
                             self.psi_threshold_radians,
                             ang_dot, ang_dot, ang_dot])
            self.STATE_LABELS = ['x', 'x_dot', 'y', 'y_dot', 'z', 'z_dot',
                                 'phi', 'theta', 'psi', 'p', 'q', 'r']
            self.STATE_UNITS = ['m', 'm/s', 'm', 'm/s', 'm', 'm/s',
                                'rad', 'rad', 'rad', 'rad/s', 'rad/s', 'rad/s']
        self.state_space = spaces.Box(low=low, high=high, dtype=np.float32)
        if self.COST == Cost.RL_REWARD and self.TASK == Task.TRAJ_TRACKING \
                and self.obs_goal_horizon > 0:
            mul = 1 + self.obs_goal_horizon
            low = np.concatenate([low] * mul)
            high = np.concatenate([high] * mul)
        elif self.COST == Cost.RL_REWARD and self.TASK == Task.STABILIZATION \
                and self.obs_goal_horizon > 0:
            low = np.concatenate([low] * 2)
            high = np.concatenate([high] * 2)
        self.observation_space = spaces.Box(low=low, high=high, dtype=np.float32)

    # ------------------------------------------------------------------
    # Task references (quadrotor.py:261-323)
    # ------------------------------------------------------------------
    def _setup_task_references(self):
        self.U_GOAL = np.ones(self.action_dim) * self.MASS * self.GRAVITY_ACC / self.action_dim
        if self.TASK == Task.STABILIZATION:
            goal = self.TASK_INFO['stabilization_goal']
            if self.QUAD_TYPE == QuadType.ONE_D:
                self.X_GOAL = np.hstack([goal[1], 0.0])
            elif self.QUAD_TYPE == QuadType.TWO_D:
                self.X_GOAL = np.hstack([goal[0], 0.0, goal[1], 0.0, 0.0, 0.0])
            else:
                self.X_GOAL = np.hstack([goal[0], 0.0, goal[1], 0.0, goal[2],
                                         0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
        else:
            POS_REF, VEL_REF, _ = self._generate_trajectory(
                traj_type=self.TASK_INFO['trajectory_type'],
                traj_length=self.EPISODE_LEN_SEC,
                num_cycles=self.TASK_INFO['num_cycles'],
                traj_plane=self.TASK_INFO['trajectory_plane'],
                position_offset=np.asarray(self.TASK_INFO['trajectory_position_offset']),
                scaling=self.TASK_INFO['trajectory_scale'],
                sample_time=self.CTRL_TIMESTEP)
            T = POS_REF.shape[0]
            z = np.zeros(T)
            if self.QUAD_TYPE == QuadType.ONE_D:
                self.X_GOAL = np.vstack([POS_REF[:, 2], VEL_REF[:, 2]]).T
            elif self.QUAD_TYPE == QuadType.TWO_D:
                self.X_GOAL = np.vstack([POS_REF[:, 0], VEL_REF[:, 0],
                                         POS_REF[:, 2], VEL_REF[:, 2], z, z]).T
            else:
                POS_T, VEL_T = transform_trajectory(
                    POS_REF, VEL_REF, trans_info={
                        'point': self.TASK_INFO['proj_point'],
                        'normal': self.TASK_INFO['proj_normal']})
                POS_T, VEL_T = np.asarray(POS_T), np.asarray(VEL_T)
                self.X_GOAL = np.vstack([
                    POS_T[:, 0], VEL_T[:, 0], POS_T[:, 1], VEL_T[:, 1],
                    POS_T[:, 2], VEL_T[:, 2], z, z, z, z, z, z]).T

    # ------------------------------------------------------------------
    # Symbolic prior (quadrotor.py:468-604)
    # ------------------------------------------------------------------
    def _setup_symbolic(self, prior_prop={}, **kwargs):
        m = prior_prop.get('M', self.MASS)
        Iyy = prior_prop.get('Iyy', self.J[1, 1])
        Ixx = prior_prop.get('Ixx', self.J[0, 0])
        Izz = prior_prop.get('Izz', self.J[2, 2])
        params = QuadParams(
            mass=jnp.float32(m), Ixx=jnp.float32(Ixx), Iyy=jnp.float32(Iyy),
            Izz=jnp.float32(Izz), arm_length=jnp.float32(self.L),
            kf=jnp.float32(self.KF), km=jnp.float32(self.KM),
            gravity=jnp.float32(self.GRAVITY_ACC))
        if self.QUAD_TYPE == QuadType.ONE_D:
            nx, nu = 2, 1
            dyn = lambda x, u: quad1d_dynamics(x, u, params)
        elif self.QUAD_TYPE == QuadType.TWO_D:
            nx, nu = 6, 2
            dyn = lambda x, u: quad2d_dynamics(x, u, params)
        else:
            nx, nu = 12, 4
            dyn = lambda x, u: quad3d_dynamics(x, u, params)
        self.Q = get_cost_weight_matrix(self.rew_state_weight, nx)
        self.R = get_cost_weight_matrix(self.rew_act_weight, nu)
        X_EQ = np.zeros(nx)
        U_EQ = np.ones(nu) * m * self.GRAVITY_ACC / nu
        self.symbolic = AnalyticModel(
            dyn_fn=dyn, nx=nx, nu=nu, dt=self.CTRL_TIMESTEP,
            params={
                'quad_mass': m, 'quad_Iyy': Iyy,
                'quad_Ixx': Ixx if self.QUAD_TYPE == QuadType.THREE_D else None,
                'quad_Izz': Izz if self.QUAD_TYPE == QuadType.THREE_D else None,
                'X_EQ': X_EQ, 'U_EQ': U_EQ,
            })

    # ------------------------------------------------------------------
    # Functional-core hooks
    # ------------------------------------------------------------------
    def _compile_samplers(self):
        self._prop_sampler = _compile_rand_sampler(
            self.INERTIAL_PROP_RAND_INFO, ['M', 'Ixx', 'Iyy', 'Izz'])
        self._init_sampler = _compile_rand_sampler(
            self.INIT_STATE_RAND_INFO, self.INIT_STATE_LABELS[self.QUAD_TYPE])

    def _nominal_dyn_params(self):
        return QuadParams(
            mass=jnp.float32(self.MASS),
            Ixx=jnp.float32(self.J[0, 0]), Iyy=jnp.float32(self.J[1, 1]),
            Izz=jnp.float32(self.J[2, 2]), arm_length=jnp.float32(self.L),
            kf=jnp.float32(self.KF), km=jnp.float32(self.KM),
            gravity=jnp.float32(self.GRAVITY_ACC))

    def _sample_dyn_params(self, key, nominal: QuadParams):
        base = {'M': nominal.mass, 'Ixx': nominal.Ixx,
                'Iyy': nominal.Iyy, 'Izz': nominal.Izz}
        d = self._prop_sampler(key, base)
        return nominal.replace(mass=jnp.asarray(d['M'], jnp.float32),
                               Ixx=jnp.asarray(d['Ixx'], jnp.float32),
                               Iyy=jnp.asarray(d['Iyy'], jnp.float32),
                               Izz=jnp.asarray(d['Izz'], jnp.float32))

    def _nominal_init_state(self):
        labels = self.INIT_STATE_LABELS[self.QUAD_TYPE]
        return np.array([getattr(self, n.upper()) for n in labels],
                        dtype=np.float32)

    def _sample_init_state(self, key, nominal):
        labels = self.INIT_STATE_LABELS[self.QUAD_TYPE]
        base = {n: nominal[i] for i, n in enumerate(labels)}
        d = self._init_sampler(key, base)
        return jnp.stack([jnp.asarray(d[n], jnp.float32) for n in labels])

    def _denormalize_action_pure(self, action):
        """Normalized action = +-norm_act_scale around hover thrust
        (quadrotor.py:766-775)."""
        if self.NORMALIZED_RL_ACTION_SPACE:
            return (1 + self.norm_act_scale * action) * self.hover_thrust
        return action

    def denormalize_action(self, action):
        if self.NORMALIZED_RL_ACTION_SPACE:
            return (1 + self.norm_act_scale * action) * self.hover_thrust
        return action

    def normalize_action(self, action):
        if self.NORMALIZED_RL_ACTION_SPACE:
            return (action / self.hover_thrust - 1) / self.norm_act_scale
        return action

    # -- physics ---------------------------------------------------------
    def _motor_forces(self, thrust, params: QuadParams):
        """Commanded thrust -> realized per-motor forces + yaw torque via the
        PWM/RPM motor model (quadrotor.py:741-747), preserving saturation."""
        pwm = cmd2pwm(thrust, params)
        rpm = pwm2rpm(pwm, params)
        forces = rpm ** 2 * params.kf
        z_torques = rpm ** 2 * params.km
        z_torque = -z_torques[0] + z_torques[1] - z_torques[2] + z_torques[3]
        return forces, z_torque, rpm

    def _sim_xdot(self, x, forces, z_torque, rpm, dyn_force, p: QuadParams):
        """Continuous dynamics for the sim path, incl. optional aero models."""
        qt = self.QUAD_TYPE
        use_gnd = self.PHYSICS in ('pyb_gnd', 'pyb_gnd_drag_dw')
        use_drag = self.PHYSICS in ('pyb_drag', 'pyb_gnd_drag_dw')
        if qt == QuadType.ONE_D:
            T = jnp.sum(forces)
            if use_gnd:
                z = jnp.clip(x[0], self.GND_EFF_H_CLIP, None)
                T = T + jnp.sum(forces * self.GND_EFF_COEFF
                                * (p.prop_radius / (4 * z)) ** 2)
            acc = T / p.mass - p.gravity + dyn_force[0] / p.mass
            return jnp.stack([x[1], acc])
        if qt == QuadType.TWO_D:
            theta = x[4]
            T1 = forces[0] + forces[3]
            T2 = forces[1] + forces[2]
            total = T1 + T2
            if use_gnd:
                z = jnp.clip(x[2], self.GND_EFF_H_CLIP, None)
                total = total + jnp.sum(forces * self.GND_EFF_COEFF
                                        * (p.prop_radius / (4 * z)) ** 2)
            sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
            x_ddot = sin_t * total / p.mass + dyn_force[0] / p.mass
            z_ddot = cos_t * total / p.mass - p.gravity + dyn_force[1] / p.mass
            if use_drag:
                # base_aviary.py:421-441 structure, reduced to the xz plane.
                omega_sum = jnp.sum(2 * jnp.pi * rpm / 60.0)
                df = -jnp.asarray(self.DRAG_COEFF) * omega_sum
                drag_link = jnp.stack([df[0] * x[1], 0.0 * x[1], df[2] * x[3]])
                R = rot_xyz(0.0, theta, 0.0)
                drag_world = R @ drag_link
                x_ddot = x_ddot + drag_world[0] / p.mass
                z_ddot = z_ddot + drag_world[2] / p.mass
            theta_ddot = p.arm_length * (T2 - T1) / p.Iyy / jnp.sqrt(2.0)
            return jnp.stack([x[1], x_ddot, x[3], z_ddot, x[5], theta_ddot])
        # THREE_D: full rigid body on per-motor forces.
        phi, theta, psi = x[6], x[7], x[8]
        omega = x[9:12]
        R = rot_xyz(phi, theta, psi)
        total = jnp.sum(forces)
        if use_gnd:
            z = jnp.clip(x[4], self.GND_EFF_H_CLIP, None)
            gnd = jnp.sum(forces * self.GND_EFF_COEFF * (p.prop_radius / (4 * z)) ** 2)
            in_range = jnp.logical_and(jnp.abs(phi) < jnp.pi / 2,
                                       jnp.abs(theta) < jnp.pi / 2)
            total = total + jnp.where(in_range, gnd, 0.0)
        thrust_world = R @ jnp.stack([0.0 * total, 0.0 * total, total])
        acc = thrust_world / p.mass - jnp.array([0.0, 0.0, 1.0]) * p.gravity
        acc = acc + jnp.stack([dyn_force[0], dyn_force[1], dyn_force[2]]) / p.mass
        if use_drag:
            omega_sum = jnp.sum(2 * jnp.pi * rpm / 60.0)
            df = -jnp.asarray(self.DRAG_COEFF) * omega_sum
            vel_world = jnp.stack([x[1], x[3], x[5]])
            drag_world = R @ (df * vel_world)
            acc = acc + drag_world / p.mass
        l_sq2 = p.arm_length / jnp.sqrt(2.0)
        J = jnp.diag(jnp.stack([p.Ixx, p.Iyy, p.Izz]))
        Jinv = jnp.diag(1.0 / jnp.stack([p.Ixx, p.Iyy, p.Izz]))
        Mb = jnp.stack([
            l_sq2 * (forces[0] + forces[1] - forces[2] - forces[3]),
            l_sq2 * (-forces[0] + forces[1] + forces[2] - forces[3]),
            z_torque,
        ])
        rate_dot = Jinv @ (Mb - jnp.cross(omega, J @ omega))
        sphi, cphi = jnp.sin(phi), jnp.cos(phi)
        tth, cth = jnp.tan(theta), jnp.cos(theta)
        W = jnp.stack([
            jnp.stack([jnp.ones_like(phi), sphi * tth, cphi * tth]),
            jnp.stack([jnp.zeros_like(phi), cphi, -sphi]),
            jnp.stack([jnp.zeros_like(phi), sphi / cth, cphi / cth]),
        ])
        ang_dot = W @ omega
        return jnp.concatenate([
            jnp.stack([x[1], acc[0], x[3], acc[1], x[5], acc[2]]),
            ang_dot, rate_dot])

    def _advance_pure(self, x, clipped_action, dyn_force, params):
        """Substeps with held RPM + disturbance force in one scan
        (base_aviary.py:232-286)."""
        dt = self.PYB_TIMESTEP
        forces, z_torque, rpm = self._motor_forces(clipped_action, params)
        qt = self.QUAD_TYPE
        explicit = (self.PHYSICS == 'dyn')
        if qt == QuadType.ONE_D:
            vel_idx, pos_idx = [1], [0]
        elif qt == QuadType.TWO_D:
            vel_idx, pos_idx = [1, 3, 5], [0, 2, 4]
        else:
            vel_idx, pos_idx = [1, 3, 5, 9, 10, 11], [0, 2, 4, 6, 7, 8]
        vel_idx = jnp.asarray(vel_idx)
        pos_idx = jnp.asarray(pos_idx)

        def substep(carry, _):
            xdot = self._sim_xdot(carry, forces, z_torque, rpm, dyn_force, params)
            if explicit:
                nxt = carry + dt * xdot
            else:
                # Semi-implicit Euler: velocities first; positions advance
                # with the new velocities; Euler angles advance with rates
                # recomputed from the new body rates.
                v_new = carry[vel_idx] + dt * xdot[vel_idx]
                x_mid = carry.at[vel_idx].set(v_new)
                pos_rates = self._sim_pos_rates(x_mid, params)
                nxt = x_mid.at[pos_idx].set(carry[pos_idx] + dt * pos_rates)
            return nxt, None

        out, _ = jax.lax.scan(substep, x, None, length=self.PYB_STEPS_PER_CTRL)
        return out

    def _install_pallas_advance(self):
        """Route the batched 2D-quad physics advance through the fused
        Pallas kernel (same custom_vmap mechanism and gating as
        CartPole._install_pallas_advance; plain 'pyb' physics only — the
        aero-augmented modes keep the XLA scan). The THREE_D kernel is a
        ~33x win (92M vs 2.9M steps/s: under vmap the XLA path's per-
        substep 3x3 rotation/inertia matmuls become batched dots that map
        terribly onto the hardware, while the kernel keeps everything in
        VMEM lanes). Numerical deviation vs the scan path is ~2e-5 per
        control step (analytic R·e3 column vs matmul ordering)."""
        if (not getattr(self, 'pallas_physics', True)
                or jax.default_backend() != 'tpu'
                or self.RANDOMIZED_INERTIAL_PROP
                or self.QUAD_TYPE not in (QuadType.TWO_D, QuadType.THREE_D)
                or self.PHYSICS != 'pyb'):
            return
        try:
            from jax import custom_batching

            from safe_control_gym_tpu.ops.pallas_kernels import (
                quad2d_advance_pallas, quad3d_advance_pallas)
        except Exception:
            return
        n_sub = int(self.PYB_STEPS_PER_CTRL)
        dt = float(self.PYB_TIMESTEP)
        single = self._advance_pure
        motor_forces = self._motor_forces
        three_d = self.QUAD_TYPE == QuadType.THREE_D

        adv = custom_batching.custom_vmap(
            lambda x, u, f, p: single(x, u, f, p))

        @adv.def_vmap
        def _rule(axis_size, in_batched, x, u, f, params):
            # ``in_batched`` mirrors each argument's pytree structure, so a
            # partially/un-batched params pytree carries PER-LEAF flags —
            # broadcast leaf-wise (an ``if`` on a namedtuple of Falses is
            # truthy and would skip the broadcast).
            def bcast(v, b):
                return jax.tree.map(
                    lambda l, bl: l if bl else jnp.broadcast_to(
                        jnp.asarray(l), (axis_size,) + jnp.shape(l)), v, b)
            x = bcast(x, in_batched[0])
            u = bcast(u, in_batched[1])
            f = bcast(f, in_batched[2])
            params_b = bcast(params, in_batched[3])
            forces, z_torque, _ = jax.vmap(motor_forces)(u, params_b)
            p0 = jax.tree.map(lambda l: l[0], params_b)
            B = x.shape[0]
            block = max(128, min(1024, ((B + 127) // 128) * 128))
            if three_d:
                pv = jnp.stack([p0.mass, p0.Ixx, p0.Iyy, p0.Izz,
                                p0.arm_length, p0.gravity]).astype(jnp.float32)
                out = quad3d_advance_pallas(x, forces, z_torque, f, pv,
                                            n_sub, dt, block_b=block)
            else:
                t1 = forces[:, 0] + forces[:, 3]
                t2 = forces[:, 1] + forces[:, 2]
                pv = jnp.stack([p0.mass, p0.Iyy, p0.arm_length,
                                p0.gravity]).astype(jnp.float32)
                out = quad2d_advance_pallas(x, t1, t2, f, pv, n_sub, dt,
                                            block_b=block)
            return out, True

        self._advance_pure = adv

    def _sim_pos_rates(self, x, p: QuadParams):
        """Position-coordinate rates from (possibly updated) velocities."""
        qt = self.QUAD_TYPE
        if qt == QuadType.ONE_D:
            return jnp.stack([x[1]])
        if qt == QuadType.TWO_D:
            return jnp.stack([x[1], x[3], x[5]])
        phi, theta = x[6], x[7]
        omega = x[9:12]
        sphi, cphi = jnp.sin(phi), jnp.cos(phi)
        tth, cth = jnp.tan(theta), jnp.cos(theta)
        W = jnp.stack([
            jnp.stack([jnp.ones_like(phi), sphi * tth, cphi * tth]),
            jnp.stack([jnp.zeros_like(phi), cphi, -sphi]),
            jnp.stack([jnp.zeros_like(phi), sphi / cth, cphi / cth]),
        ])
        ang_dot = W @ omega
        return jnp.concatenate([jnp.stack([x[1], x[3], x[5]]), ang_dot])

    # -- reward / done / info -------------------------------------------
    def _rl_reward_pure(self, state, noisy_action, step):
        """Quadratic on state error and ACTION ERROR vs U_GOAL
        (quadrotor.py:819-845)."""
        X_GOAL = jnp.asarray(np.atleast_2d(self.X_GOAL), jnp.float32)
        U_GOAL = jnp.asarray(self.U_GOAL, jnp.float32)
        nx = self.state_dim
        nu = self.action_dim
        if self.TASK == Task.STABILIZATION:
            ref = X_GOAL[0]
        else:
            wp = jnp.clip(step + 1, 0, X_GOAL.shape[0] - 1)
            ref = X_GOAL[wp]
        err = state - ref
        act_err = noisy_action - U_GOAL
        w_s = jnp.asarray(self.rew_state_weight if len(self.rew_state_weight) == nx
                          else np.full(nx, self.rew_state_weight[0]), jnp.float32)
        w_a = jnp.asarray(self.rew_act_weight if len(self.rew_act_weight) == nu
                          else np.full(nu, self.rew_act_weight[0]), jnp.float32)
        dist = jnp.sum(w_s * err * err) + jnp.sum(w_a * act_err * act_err)
        rew = -dist
        if self.rew_exponential:
            rew = jnp.exp(rew)
        return rew

    def _quadratic_reward_pure(self, state, clipped_action, step):
        """-symbolic loss; tracking uses step+1 (quadrotor.py:848-862)."""
        X_GOAL = jnp.asarray(np.atleast_2d(self.X_GOAL), jnp.float32)
        if self.TASK == Task.STABILIZATION:
            ref = X_GOAL[0]
        else:
            wp = jnp.clip(step + 1, 0, X_GOAL.shape[0] - 1)
            ref = X_GOAL[wp]
        Q = jnp.asarray(self.Q, jnp.float32)
        R = jnp.asarray(self.R, jnp.float32)
        dx = state - ref
        du = clipped_action - jnp.asarray(self.U_GOAL, jnp.float32)
        return -(0.5 * dx @ Q @ dx + 0.5 * du @ R @ du)

    def _oob_pure(self, state):
        """Masked position/angle out-of-bound (quadrotor.py:875-891)."""
        mask = {
            QuadType.ONE_D: np.array([1, 0]),
            QuadType.TWO_D: np.array([1, 0, 1, 0, 1, 0]),
            QuadType.THREE_D: np.array([1, 0, 1, 0, 1, 0, 1, 1, 1, 0, 0, 0]),
        }[self.QUAD_TYPE]
        lo = jnp.asarray(self.state_space.low, jnp.float32)
        hi = jnp.asarray(self.state_space.high, jnp.float32)
        oob = jnp.logical_or(state < lo, state > hi)
        return jnp.any(oob * jnp.asarray(mask, jnp.float32) > 0)

    def render(self, mode='rgb_array'):
        """3D quads render an orientation-aware 3D frame (the PyBullet
        camera's role, base_aviary.py:333-347); 1D/2D keep the parent's
        planar rasterization."""
        if self.QUAD_TYPE != QuadType.THREE_D or mode == 'human':
            return super().render(mode)
        import matplotlib
        if self._viewer is None or not self._viewer.interactive:
            matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from safe_control_gym_tpu.math.rotations import rot_xyz
        fig = plt.figure(figsize=(4, 3), dpi=80)
        ax = fig.add_subplot(111, projection='3d')
        s = np.asarray(self.state)
        pos = np.array([s[0], s[2], s[4]])
        R = np.asarray(rot_xyz(s[6], s[7], s[8]))
        # CF2X wireframe: X-configuration arms (45 deg off the body axes,
        # cf2x.urdf geometry) with a rotor disk at each tip, drawn in the
        # body plane and rotated into the world frame — the true-3D drone
        # view whose role the PyBullet camera played
        # (base_aviary.py:333-347).
        arm = 0.12
        r_rot = 0.045
        c45 = np.sqrt(0.5)
        tips = arm * np.array([[c45, c45, 0], [-c45, c45, 0],
                               [-c45, -c45, 0], [c45, -c45, 0]])
        th = np.linspace(0, 2 * np.pi, 17)
        circle = np.stack([r_rot * np.cos(th), r_rot * np.sin(th),
                           np.zeros_like(th)], axis=1)
        for i, tip in enumerate(tips):
            a = R @ tip
            ax.plot([pos[0], pos[0] + a[0]], [pos[1], pos[1] + a[1]],
                    [pos[2], pos[2] + a[2]], color='k', lw=2)
            ring = (R @ (tip + circle).T).T + pos
            # Front rotors (body +x side) in red, rear in blue — the
            # orientation cue the CF2X LEDs give.
            ax.plot(ring[:, 0], ring[:, 1], ring[:, 2],
                    color=('r' if tip[0] > 0 else 'b'), lw=1.2)
        up = R @ np.array([0, 0, 0.06])
        ax.plot([pos[0], pos[0] + up[0]], [pos[1], pos[1] + up[1]],
                [pos[2], pos[2] + up[2]], color='g', lw=2)
        if self.TASK == Task.TRAJ_TRACKING and np.ndim(self.X_GOAL) == 2:
            ax.plot(self.X_GOAL[:, 0], self.X_GOAL[:, 2],
                    self.X_GOAL[:, 4], 'g--', lw=0.7)
        elif self.TASK == Task.STABILIZATION:
            g = np.atleast_2d(self.X_GOAL)[0]
            ax.scatter([g[0]], [g[2]], [g[4]], color='g', marker='*', s=30)
        ax.set_xlim(-2, 2)
        ax.set_ylim(-2, 2)
        ax.set_zlim(0, 2.5)
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
        plt.close(fig)
        return frame

    def _draw_state(self, ax):
        """Draw the actual scene — ground, CF2X frame with rotor disks,
        goal — in the xz plane for render()/GUI frames (the PyBullet
        scene render's role, base_aviary.py:333-347)."""
        from matplotlib.patches import Circle
        s = np.asarray(self.state)
        if self.QUAD_TYPE == QuadType.ONE_D:
            x, z, th = 0.0, s[0], 0.0
        elif self.QUAD_TYPE == QuadType.TWO_D:
            x, z, th = s[0], s[2], s[4]
        else:
            x, z, th = s[0], s[4], s[7]
        ax.axhspan(-0.2, 0.0, color='0.85', zorder=0)  # ground plane
        ax.plot([-2.2, 2.2], [0, 0], 'k-', lw=1)
        arm = 0.12
        r_rot = 0.045
        dx, dz = arm * np.cos(th), arm * np.sin(th)
        ax.plot([x - dx, x + dx], [z + dz, z - dz], 'k-', lw=3,
                solid_capstyle='round')
        # Rotor disks at the arm tips (front red / rear blue, the CF2X
        # LED orientation cue) drawn perpendicular to the body axis.
        ux, uz = -np.sin(th), np.cos(th)  # body-up in the xz plane
        for sgn, col in ((1.0, 'r'), (-1.0, 'b')):
            cx, cz = x + sgn * dx, z - sgn * dz
            ax.add_patch(Circle((cx + 0.02 * ux, cz + 0.02 * uz), r_rot,
                                fill=False, color=col, lw=1.2, zorder=3))
        ax.plot([x], [z], 'ko', ms=3)
        if self.TASK == Task.TRAJ_TRACKING and np.ndim(self.X_GOAL) == 2:
            if self.QUAD_TYPE == QuadType.ONE_D:
                ax.plot(np.zeros(self.X_GOAL.shape[0]), self.X_GOAL[:, 0],
                        'g--', lw=0.7)
            elif self.QUAD_TYPE == QuadType.TWO_D:
                ax.plot(self.X_GOAL[:, 0], self.X_GOAL[:, 2], 'g--', lw=0.7)
            else:
                ax.plot(self.X_GOAL[:, 0], self.X_GOAL[:, 4], 'g--', lw=0.7)
        else:
            g = np.atleast_2d(self.X_GOAL)[0]
            gx, gz = {QuadType.ONE_D: (0.0, g[0]),
                      QuadType.TWO_D: (g[0], g[2]),
                      QuadType.THREE_D: (g[0], g[4])}[self.QUAD_TYPE]
            ax.plot([gx], [gz], 'g*', ms=10)
        ax.set_xlim(-2.2, 2.2)
        ax.set_ylim(-0.2, 2.2)

    def _mse_pure(self, state, step):
        """Weighted MSE with wrapped angles in tracking (quadrotor.py:895-923)."""
        X_GOAL = jnp.asarray(np.atleast_2d(self.X_GOAL), jnp.float32)
        if self.TASK == Task.STABILIZATION:
            err = state - X_GOAL[0]
        else:
            s = state
            if self.QUAD_TYPE == QuadType.TWO_D:
                s = s.at[4].set(normalize_angle(s[4]))
            elif self.QUAD_TYPE == QuadType.THREE_D:
                s = s.at[6].set(normalize_angle(s[6]))
                s = s.at[7].set(normalize_angle(s[7]))
                s = s.at[8].set(normalize_angle(s[8]))
            wp = jnp.clip(step + 1, 0, X_GOAL.shape[0] - 1)
            err = s - X_GOAL[wp]
        w = jnp.asarray(self.info_mse_metric_state_weight, jnp.float32)
        return jnp.sum((err * w) ** 2)
