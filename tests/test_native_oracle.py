"""Cross-validation of the JAX simulation core against the independent C++
dynamics oracle (native/dynamics_oracle.cpp) — the ground-truth role the
PyBullet C++ engine played for the reference. Trajectory RMSE tolerance
mirrors the BASELINE target (<= 1e-3 over multi-step rollouts)."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which('g++') is None,
                                reason='g++ not available')

from safe_control_gym_tpu.utils import native
from safe_control_gym_tpu.utils.registration import make


def test_cartpole_sim_matches_cpp_oracle():
    env = make('cartpole', seed=0, randomized_init=False,
               init_state={'init_theta': 0.15}, ctrl_freq=50, pyb_freq=1000)
    env.reset()
    params = np.array([env.POLE_MASS, env.CART_MASS,
                       env.EFFECTIVE_POLE_LENGTH, env.GRAVITY_ACC])
    state_cpp = np.array([0.0, 0.0, 0.15, 0.0])
    rng = np.random.default_rng(0)
    errs = []
    for _ in range(50):
        force = float(rng.uniform(-5, 5))
        obs, *_ = env.step(np.array([force]))
        state_cpp = native.cartpole_advance_oracle(
            state_cpp, force, np.zeros(2), params, env.PYB_TIMESTEP,
            env.PYB_STEPS_PER_CTRL)
        errs.append(np.abs(np.asarray(env.state) - state_cpp).max())
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse <= 1e-3, rmse


def test_cartpole_rk4_prior_matches_cpp():
    env = make('cartpole', seed=0)
    params = np.array([env.POLE_MASS, env.CART_MASS,
                       env.EFFECTIVE_POLE_LENGTH, env.GRAVITY_ACC])
    x = np.array([0.1, -0.2, 0.3, 0.4])
    u = 2.5
    jax_next = np.asarray(env.symbolic.fd_func(jnp.asarray(x, jnp.float32),
                                               jnp.asarray([u], jnp.float32)))
    cpp_next = native.cartpole_rk4_oracle(x, u, params, env.CTRL_TIMESTEP)
    assert np.abs(jax_next - cpp_next).max() < 1e-5


def test_quad2d_sim_matches_cpp_oracle():
    ti = {'stabilization_goal': [1, 1.5], 'stabilization_goal_tolerance': 0.001}
    env = make('quadrotor', seed=0, quad_type=2, randomized_init=False,
               init_state={'init_z': 1.0}, task_info=ti,
               ctrl_freq=50, pyb_freq=1000)
    env.reset()
    params = np.array([env.MASS, env.J[1, 1], env.L, env.GRAVITY_ACC])
    state_cpp = np.array([0, 0, 1.0, 0, 0, 0], dtype=float)
    hover = env.U_GOAL
    errs = []
    for i in range(30):
        u = hover * (1 + 0.05 * np.sin(i / 3) * np.array([1, -1]))
        obs, *_ = env.step(u)
        # The env realizes thrust through the motor (PWM) model; feed the
        # realized pair thrusts to the oracle for apples-to-apples.
        from safe_control_gym_tpu.envs.dynamics import cmd2pwm, pwm2rpm
        p = env._nominal_dyn_params()
        pwm = cmd2pwm(jnp.asarray(u, jnp.float32), p)
        rpm = pwm2rpm(pwm, p)
        forces = np.asarray(rpm) ** 2 * env.KF
        T1, T2 = forces[0] + forces[3], forces[1] + forces[2]
        state_cpp = native.quad2d_advance_oracle(
            state_cpp, np.array([T1, T2]), params, env.PYB_TIMESTEP,
            env.PYB_STEPS_PER_CTRL)
        errs.append(np.abs(np.asarray(env.state) - state_cpp).max())
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse <= 1e-3, rmse


def test_quad3d_sim_matches_cpp_oracle():
    ti = {'stabilization_goal': [1, 1, 1.5],
          'stabilization_goal_tolerance': 0.001}
    env = make('quadrotor', seed=0, quad_type=3, randomized_init=False,
               init_state={'init_z': 1.0}, task_info=ti,
               ctrl_freq=50, pyb_freq=1000)
    env.reset()
    params = np.array([env.MASS, env.J[0, 0], env.J[1, 1], env.J[2, 2],
                       env.L, env.KF, env.KM, env.GRAVITY_ACC])
    state_cpp = np.zeros(12)
    state_cpp[4] = 1.0
    hover = env.U_GOAL
    errs = []
    for i in range(20):
        u = hover * (1 + 0.03 * np.sin(i / 2) * np.array([1, -1, 1, -1]))
        obs, *_ = env.step(u)
        from safe_control_gym_tpu.envs.dynamics import cmd2pwm, pwm2rpm
        p = env._nominal_dyn_params()
        pwm = cmd2pwm(jnp.asarray(u, jnp.float32), p)
        rpm = pwm2rpm(pwm, p)
        forces = np.asarray(rpm) ** 2 * env.KF
        state_cpp = native.quad3d_advance_oracle(
            state_cpp, forces, params, env.PYB_TIMESTEP,
            env.PYB_STEPS_PER_CTRL)
        errs.append(np.abs(np.asarray(env.state) - state_cpp).max())
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse <= 1e-3, rmse
