"""Dynamics correctness: analytic Jacobians vs finite differences, forced
vs closed-form cartpole consistency, integrator sanity, motor model."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs import dynamics as dyn


def _fd_jac(f, x, u, eps=1e-4):
    n = len(x)
    J = np.zeros((len(f(x, u)), n))
    for i in range(n):
        dx = np.zeros(n)
        dx[i] = eps
        J[:, i] = (np.array(f(x + dx, u)) - np.array(f(x - dx, u))) / (2 * eps)
    return J


def test_cartpole_jacobian_fd():
    p = dyn.CartPoleParams()
    f = lambda x, u: dyn.cartpole_dynamics(jnp.asarray(x, jnp.float32),
                                           jnp.asarray(u, jnp.float32), p)
    x = np.array([0.1, -0.2, 0.3, 0.05], np.float64)
    u = np.array([2.0])
    A_ad = np.array(jax.jacfwd(lambda s: f(s, u))(jnp.asarray(x, jnp.float32)))
    A_fd = _fd_jac(f, x, u)
    assert np.allclose(A_ad, A_fd, atol=1e-2)


def test_cartpole_forced_reduces_to_unforced():
    p = dyn.CartPoleParams()
    x = jnp.array([0.1, -0.2, 0.3, 0.05])
    u = jnp.array([2.0])
    xd0 = dyn.cartpole_dynamics(x, u, p)
    xdf = dyn.cartpole_dynamics_forced(x, u, jnp.zeros(2), p)
    assert np.allclose(np.array(xd0), np.array(xdf), atol=1e-5)


def test_cartpole_forced_fx_pushes_cart():
    p = dyn.CartPoleParams()
    x = jnp.zeros(4)
    u = jnp.zeros(1)
    xd = dyn.cartpole_dynamics_forced(x, u, jnp.array([1.0, 0.0]), p)
    assert float(xd[1]) > 0  # positive x force accelerates cart forward


def test_quad2d_hover_equilibrium():
    p = dyn.QuadParams()
    hover = float(p.mass) * 9.8 / 2
    x = jnp.zeros(6)
    xd = dyn.quad2d_dynamics(x, jnp.array([hover, hover]), p)
    assert np.allclose(np.array(xd), 0.0, atol=1e-6)


def test_quad3d_hover_equilibrium():
    p = dyn.QuadParams()
    hover = float(p.mass) * 9.8 / 4
    x = jnp.zeros(12)
    xd = dyn.quad3d_dynamics(x, jnp.full(4, hover), p)
    assert np.allclose(np.array(xd), 0.0, atol=1e-6)


def test_quad3d_yaw_torque_sign():
    # Motors 2 & 4 spun up -> positive yaw moment (gamma*(-f1+f2-f3+f4)).
    p = dyn.QuadParams()
    hover = float(p.mass) * 9.8 / 4
    f = jnp.array([hover * 0.9, hover * 1.1, hover * 0.9, hover * 1.1])
    xd = dyn.quad3d_dynamics(jnp.zeros(12), f, p)
    assert float(xd[11]) > 0  # r_dot > 0


def test_rk4_convergence():
    # RK4 on the cartpole should agree with finely-substepped Euler.
    p = dyn.CartPoleParams()
    x0 = jnp.array([0.0, 0.0, 0.2, 0.0])
    u = jnp.array([1.0])
    dt = 0.02
    x_rk4 = dyn.rk4_step(dyn.cartpole_dynamics, x0, u, dt, p)
    x_fine = x0
    n = 2000
    for _ in range(n):
        x_fine = dyn.euler_step(dyn.cartpole_dynamics, x_fine, u, dt / n, p)
    assert np.allclose(np.array(x_rk4), np.array(x_fine), atol=1e-5)


def test_integrate_substeps_matches_loop():
    p = dyn.CartPoleParams()
    x0 = jnp.array([0.0, 0.0, 0.2, 0.0])
    u = jnp.array([1.0])
    step = lambda x, a: dyn.euler_step(dyn.cartpole_dynamics, x, a, 0.001, p)
    x_scan = dyn.integrate_substeps(step, x0, u, 20)
    x_loop = x0
    for _ in range(20):
        x_loop = step(x_loop, u)
    assert np.allclose(np.array(x_scan), np.array(x_loop), atol=1e-6)


def test_motor_model_roundtrip():
    # cmd2pwm/pwm2rpm semantics (quadrotor_utils.py:16-60): hover thrust for
    # the 2D quad maps to the hover RPM on all four motors.
    p = dyn.QuadParams()
    mass, g = float(p.mass), 9.8
    hover_per_pair = mass * g / 2
    pwm = dyn.cmd2pwm(jnp.array([hover_per_pair, hover_per_pair]), p)
    assert pwm.shape == (4,)
    rpm = dyn.pwm2rpm(pwm, p)
    forces, z_torque = dyn.rpm2forces(rpm, p)
    assert np.allclose(float(jnp.sum(forces)), mass * g, rtol=1e-5)
    assert abs(float(z_torque)) < 1e-9
    # 2D pairing: [p1, p2, p2, p1].
    pwm2 = dyn.cmd2pwm(jnp.array([0.1, 0.2]), p)
    assert np.allclose(float(pwm2[0]), float(pwm2[3]))
    assert np.allclose(float(pwm2[1]), float(pwm2[2]))
