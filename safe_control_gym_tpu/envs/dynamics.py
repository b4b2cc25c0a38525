"""Analytic rigid-body dynamics for all benchmark systems — pure JAX.

This module is the TPU-native replacement for BOTH of the reference's model
layers at once:

* the PyBullet ground-truth simulation (envs/gym_control/cartpole.py:532-583,
  envs/gym_pybullet_drones/base_aviary.py:232-511), and
* the CasADi symbolic prior (cartpole.py:390-437, quadrotor.py:468-604).

In the reference those are two different engines (C++ physics vs. CasADi
graphs) bridged by ~1000 Python<->C++ FFI crossings per simulated second. Here
they are the *same pure function* ``f(x, u, params) -> x_dot``, so the
simulator is differentiable by construction and the "prior model" for
model-based controllers is obtained by evaluating the same function with
(possibly perturbed) prior parameters.

Fidelity structure is preserved: the ground-truth path integrates the ODE with
``pyb_steps_per_ctrl`` semi-implicit-Euler substeps (PyBullet's integrator, at
``pyb_freq``), while prior discrete models use RK4 at the control timestep —
so prior/simulation mismatch exists exactly as in the reference.

All functions are jit/vmap/grad-compatible: states are flat f32 vectors,
parameters are dataclass pytrees, and there is no data-dependent Python
control flow.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from safe_control_gym_tpu.math.rotations import rot_xyz, skew

__all__ = [
    'CartPoleParams', 'QuadParams',
    'cartpole_dynamics', 'quad1d_dynamics', 'quad2d_dynamics',
    'quad3d_dynamics',
    'rk4_step', 'euler_step', 'symplectic_euler_step', 'integrate_substeps',
    'cmd2pwm', 'pwm2rpm', 'rpm2forces',
]


@struct.dataclass
class CartPoleParams:
    """Inertial parameters of the cartpole (reference cartpole.py:196-211).

    Defaults parsed from cartpole_template.urdf: pole full length 1.0 m
    (effective = half = 0.5), pole mass 0.1, cart mass 1.0, g = 9.8.
    """
    pole_length: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.5))
    pole_mass: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    cart_mass: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))
    gravity: jax.Array = struct.field(default_factory=lambda: jnp.float32(9.8))


@struct.dataclass
class QuadParams:
    """Crazyflie 2.x (CF2X) parameters (assets/cf2x.urdf properties line and
    base_aviary.py:123-131 derived constants)."""
    mass: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.027))
    Ixx: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.4e-5))
    Iyy: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.4e-5))
    Izz: jax.Array = struct.field(default_factory=lambda: jnp.float32(2.17e-5))
    arm_length: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0397))
    kf: jax.Array = struct.field(default_factory=lambda: jnp.float32(3.16e-10))
    km: jax.Array = struct.field(default_factory=lambda: jnp.float32(7.94e-12))
    gravity: jax.Array = struct.field(default_factory=lambda: jnp.float32(9.8))
    # Motor model (quadrotor_utils.py:16-60).
    pwm2rpm_scale: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.2685))
    pwm2rpm_const: jax.Array = struct.field(default_factory=lambda: jnp.float32(4070.3))
    pwm_min: jax.Array = struct.field(default_factory=lambda: jnp.float32(20000.0))
    pwm_max: jax.Array = struct.field(default_factory=lambda: jnp.float32(65535.0))
    # Aerodynamic extras (base_aviary.py:386-441) for the optional
    # pyb_drag / pyb_gnd physics modes.
    thrust2weight: jax.Array = struct.field(default_factory=lambda: jnp.float32(2.25))
    gnd_eff_coeff: jax.Array = struct.field(default_factory=lambda: jnp.float32(11.36859))
    prop_radius: jax.Array = struct.field(default_factory=lambda: jnp.float32(2.31348e-2))
    drag_coeff_xy: jax.Array = struct.field(default_factory=lambda: jnp.float32(9.1785e-7))
    drag_coeff_z: jax.Array = struct.field(default_factory=lambda: jnp.float32(10.311e-7))


# ---------------------------------------------------------------------------
# Continuous-time dynamics f(x, u, params) -> x_dot
# ---------------------------------------------------------------------------

def cartpole_dynamics(x: jax.Array, u: jax.Array, p: CartPoleParams) -> jax.Array:
    """Cartpole ODE. State [x, x_dot, theta, theta_dot], input [force].

    Equations identical to the reference symbolic model (cartpole.py:411-414):
    classic pole-on-cart with uniform-rod pole (4/3 factor).
    """
    x_dot, theta, theta_dot = x[1], x[2], x[3]
    force = u[0]
    m, M, L, g = p.pole_mass, p.cart_mass, p.pole_length, p.gravity
    Mm = m + M
    ml = m * L
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    temp = (force + ml * theta_dot ** 2 * sin_t) / Mm
    theta_ddot = (g * sin_t - cos_t * temp) / (L * (4.0 / 3.0 - m * cos_t ** 2 / Mm))
    x_ddot = temp - ml * theta_ddot * cos_t / Mm
    return jnp.stack([x_dot, x_ddot, theta_dot, theta_ddot])


def cartpole_dynamics_forced(x: jax.Array, u: jax.Array, tab_force: jax.Array,
                             p: CartPoleParams) -> jax.Array:
    """Cartpole ODE with an external (fx, fz) force at the pole COM.

    This is the analytic counterpart of the reference's "tab force" dynamics
    disturbance (cartpole.py:532-583: p.applyExternalForce on the pole link
    at its COM, world frame). Solved in manipulator form

        [M+m,      m l cos(th)] [x_dd ]   [F + fx + m l th_d^2 sin(th)]
        [m l cos,  4/3 m l^2  ] [th_dd] = [m g l sin + fx l cos - fz l sin]

    which reduces exactly to :func:`cartpole_dynamics` when tab_force = 0
    (the generalized force of a force at the pole COM is
    Q_x = fx, Q_theta = fx l cos(th) - fz l sin(th)).
    """
    x_dot, theta, theta_dot = x[1], x[2], x[3]
    force = u[0]
    fx, fz = tab_force[0], tab_force[1]
    m, M, L, g = p.pole_mass, p.cart_mass, p.pole_length, p.gravity
    ml = m * L
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    a11 = M + m
    a12 = ml * cos_t
    a22 = (4.0 / 3.0) * m * L ** 2
    b1 = force + fx + ml * theta_dot ** 2 * sin_t
    b2 = m * g * L * sin_t + fx * L * cos_t - fz * L * sin_t
    det = a11 * a22 - a12 * a12
    x_ddot = (a22 * b1 - a12 * b2) / det
    theta_ddot = (a11 * b2 - a12 * b1) / det
    return jnp.stack([x_dot, x_ddot, theta_dot, theta_ddot])


def quad1d_dynamics(x: jax.Array, u: jax.Array, p: QuadParams) -> jax.Array:
    """1D quadrotor: state [z, z_dot], input [total thrust T].

    Reference quadrotor.py:482-491: z_ddot = T/m - g.
    """
    return jnp.stack([x[1], u[0] / p.mass - p.gravity])


def quad2d_dynamics(x: jax.Array, u: jax.Array, p: QuadParams) -> jax.Array:
    """2D planar quadrotor: state [x, x_dot, z, z_dot, theta, theta_dot],
    input [T1, T2] (left/right rotor-pair thrusts).

    Reference quadrotor.py:493-511:
      x_ddot = sin(theta) (T1+T2)/m, z_ddot = cos(theta)(T1+T2)/m - g,
      theta_ddot = L (T2 - T1) / (Iyy sqrt(2)).
    """
    theta = x[4]
    T1, T2 = u[0], u[1]
    total = (T1 + T2) / p.mass
    x_ddot = jnp.sin(theta) * total
    z_ddot = jnp.cos(theta) * total - p.gravity
    theta_ddot = p.arm_length * (T2 - T1) / p.Iyy / jnp.sqrt(2.0)
    return jnp.stack([x[1], x_ddot, x[3], z_ddot, x[5], theta_ddot])


def quad3d_dynamics(x: jax.Array, u: jax.Array, p: QuadParams) -> jax.Array:
    """3D quadrotor rigid body, CF2X mixer.

    State [x, x_dot, y, y_dot, z, z_dot, phi, theta, psi, p, q, r]
    (body rates p,q,r), input per-motor thrusts [f1, f2, f3, f4].
    Reference quadrotor.py:513-570 (Luis & Le Ny 2016, Ch. 2) with the
    SDFormat rotation convention R = Rz Ry Rx.
    """
    phi, theta, psi = x[6], x[7], x[8]
    omega = x[9:12]
    f = u
    m, g, L = p.mass, p.gravity, p.arm_length
    J = jnp.diag(jnp.stack([p.Ixx, p.Iyy, p.Izz]))
    Jinv = jnp.diag(1.0 / jnp.stack([p.Ixx, p.Iyy, p.Izz]))
    gamma = p.km / p.kf
    R = rot_xyz(phi, theta, psi)
    thrust = jnp.stack([0.0 * f[0], 0.0 * f[0], f[0] + f[1] + f[2] + f[3]])
    acc = R @ thrust / m - jnp.array([0.0, 0.0, 1.0]) * g
    l_sq2 = L / jnp.sqrt(2.0)
    Mb = jnp.stack([
        l_sq2 * (f[0] + f[1] - f[2] - f[3]),
        l_sq2 * (-f[0] + f[1] + f[2] - f[3]),
        gamma * (-f[0] + f[1] - f[2] + f[3]),
    ])
    rate_dot = Jinv @ (Mb - skew(omega) @ (J @ omega))
    # Euler-angle kinematics (body rates -> Euler rates).
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    tth = jnp.tan(theta)
    cth = jnp.cos(theta)
    W = jnp.stack([
        jnp.stack([jnp.ones_like(phi), sphi * tth, cphi * tth]),
        jnp.stack([jnp.zeros_like(phi), cphi, -sphi]),
        jnp.stack([jnp.zeros_like(phi), sphi / cth, cphi / cth]),
    ])
    ang_dot = W @ omega
    return jnp.concatenate([
        jnp.stack([x[1], acc[0], x[3], acc[1], x[5], acc[2]]),
        ang_dot,
        rate_dot,
    ])


# ---------------------------------------------------------------------------
# Integrators
# ---------------------------------------------------------------------------

def rk4_step(f: Callable, x: jax.Array, u: jax.Array, dt: float, params) -> jax.Array:
    """Classic RK4 step with zero-order-hold input.

    Semantics of the reference's ``rk_discrete`` (mpc_utils.py:42-64), used
    for prior discrete dynamics in MPC and for fd_func in the analytic model.
    """
    k1 = f(x, u, params)
    k2 = f(x + 0.5 * dt * k1, u, params)
    k3 = f(x + 0.5 * dt * k2, u, params)
    k4 = f(x + dt * k3, u, params)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def euler_step(f: Callable, x: jax.Array, u: jax.Array, dt: float, params) -> jax.Array:
    """Explicit Euler step (base_aviary.py:462-511 DYN semantics)."""
    return x + dt * f(x, u, params)


def symplectic_euler_step(f: Callable, x: jax.Array, u: jax.Array, dt: float,
                          params, vel_idx, pos_idx) -> jax.Array:
    """Semi-implicit Euler: update velocities first, then positions from the
    *new* velocities — PyBullet's integration scheme, used for the
    ground-truth simulation path so the sim/prior mismatch structure of the
    reference (Bullet vs. CasADi-RK4) is reproduced.

    ``vel_idx``/``pos_idx`` are index arrays pairing each position coordinate
    with its velocity coordinate.
    """
    xdot = f(x, u, params)
    # Velocity update from current-state accelerations.
    v_new = x[vel_idx] + dt * xdot[vel_idx]
    x_new = x.at[vel_idx].set(v_new)
    # Position update from new velocities.
    x_new = x_new.at[pos_idx].set(x[pos_idx] + dt * v_new)
    return x_new


def integrate_substeps(step_fn: Callable, x: jax.Array, u: jax.Array,
                       n_substeps: int) -> jax.Array:
    """Run ``n_substeps`` inner physics steps with held input via lax.scan.

    Mirrors the PYB_STEPS_PER_CTRL loop (cartpole.py:532-583,
    base_aviary.py:232-286) — but as one fused XLA computation instead of
    n x 3 Python->C++ FFI calls.
    """
    def body(carry, _):
        return step_fn(carry, u), None

    x_final, _ = jax.lax.scan(body, x, None, length=n_substeps)
    return x_final


# ---------------------------------------------------------------------------
# Motor model (quadrotor_utils.py:16-60)
# ---------------------------------------------------------------------------

def cmd2pwm(thrust: jax.Array, p: QuadParams) -> jax.Array:
    """Thrust command(s) -> per-motor PWM, clipped.

    ``thrust`` of length 1 (total), 2 (motor pairs) or 4 (per motor).
    Mirrors quadrotor_utils.py:16-45 including the 2D [m, m[::-1]] pairing.
    """
    n = thrust.shape[0]
    n_motor = 4 // n
    thrust = jnp.clip(thrust, 0.0, None)
    motor_pwm = (jnp.sqrt(thrust / n_motor / p.kf) - p.pwm2rpm_const) / p.pwm2rpm_scale
    if n == 1:
        motor_pwm = jnp.repeat(motor_pwm, 4)
    elif n == 2:
        motor_pwm = jnp.concatenate([motor_pwm, motor_pwm[::-1]])
    return jnp.clip(motor_pwm, p.pwm_min, p.pwm_max)


def pwm2rpm(pwm: jax.Array, p: QuadParams) -> jax.Array:
    """Affine PWM -> RPM map (quadrotor_utils.py:48-60)."""
    return p.pwm2rpm_scale * pwm + p.pwm2rpm_const


def rpm2forces(rpm: jax.Array, p: QuadParams):
    """Per-motor forces and z-torque from RPMs (base_aviary.py:364-384)."""
    forces = rpm ** 2 * p.kf
    torques = rpm ** 2 * p.km
    z_torque = -torques[0] + torques[1] - torques[2] + torques[3]
    return forces, z_torque
