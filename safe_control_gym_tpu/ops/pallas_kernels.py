"""Pallas TPU kernels for the simulation hot loop.

The batched env step is launch-bound at high env counts: each of the
``pyb_steps_per_ctrl`` physics substeps inside the ``lax.scan`` becomes at
least one XLA kernel launch over tiny (B, 4) tensors. This module fuses ALL
substeps of a control step into ONE Pallas kernel: the state lives in VMEM
registers for the whole inner loop, eliminating per-substep HBM round trips
and launch overhead.

Layout: the batch is the LANE dimension. State/action rows are stacked into
an (8, B) f32 block — row 0..3 = [x, x_dot, theta, theta_dot], row 4 = force,
rows 5..6 = tab-force disturbance (fx, fz), row 7 = padding to the f32
sublane tile (8, 128). The kernel computes the same forced cartpole dynamics
as :func:`safe_control_gym_tpu.envs.dynamics.cartpole_dynamics_forced`
with semi-implicit Euler, unrolled ``n_substeps`` times on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['cartpole_advance_pallas', 'quad2d_advance_pallas', 'quad3d_advance_pallas',
           'cartpole_substeps', 'quad2d_substeps', 'quad3d_substeps']


def cartpole_substeps(x, xd, th, thd, force, fx, fz, m, M, L, g,
                      n_substeps, dt):
    """``n_substeps`` fused semi-implicit-Euler cartpole updates on VPU
    vectors (manipulator form incl. the pole-COM tab force). Shared by the
    per-step advance kernel and the whole-rollout kernel
    (ops/rollout_kernels.py)."""
    Mm = m + M
    ml = m * L
    a11 = Mm
    a22 = (4.0 / 3.0) * m * L * L
    # Loop invariants hoisted; per-substep divides collapse to ONE
    # reciprocal (VPU divides are multi-cycle — measurable at 20
    # substeps x 300M steps/s).
    f1 = force + fx
    mgL = m * g * L
    fxL = fx * L
    fzL = fz * L

    for _ in range(n_substeps):
        sin_t = jnp.sin(th)
        cos_t = jnp.cos(th)
        a12 = ml * cos_t
        b1 = f1 + ml * thd * thd * sin_t
        b2 = mgL * sin_t + fxL * cos_t - fzL * sin_t
        inv_det = 1.0 / (a11 * a22 - a12 * a12)
        x_dd = (a22 * b1 - a12 * b2) * inv_det
        th_dd = (a11 * b2 - a12 * b1) * inv_det
        # Semi-implicit Euler (PyBullet's scheme): velocities first.
        xd = xd + dt * x_dd
        thd = thd + dt * th_dd
        x = x + dt * xd
        th = th + dt * thd
    return x, xd, th, thd


def _cartpole_kernel(params_ref, in_ref, out_ref, *, n_substeps, dt):
    """One fused control step: n_substeps semi-implicit-Euler updates."""
    x, xd, th, thd = cartpole_substeps(
        in_ref[0, :], in_ref[1, :], in_ref[2, :], in_ref[3, :],
        in_ref[4, :], in_ref[5, :], in_ref[6, :],
        params_ref[0, 0], params_ref[0, 1], params_ref[0, 2],
        params_ref[0, 3], n_substeps, dt)

    out_ref[0, :] = x
    out_ref[1, :] = xd
    out_ref[2, :] = th
    out_ref[3, :] = thd
    out_ref[4, :] = in_ref[4, :]
    out_ref[5, :] = in_ref[5, :]
    out_ref[6, :] = in_ref[6, :]
    out_ref[7, :] = in_ref[7, :]


@functools.partial(jax.jit, static_argnames=('n_substeps', 'dt', 'block_b'))
def cartpole_advance_pallas(states, forces, tab_forces, params,
                            n_substeps: int, dt: float,
                            block_b: int = 1024):
    """Advance a batch of cartpole states by one control step.

    Args:
        states: (B, 4) f32 [x, x_dot, theta, theta_dot].
        forces: (B,) f32 applied cart forces (already clipped).
        tab_forces: (B, 2) f32 pole-COM disturbance forces (fx, fz).
        params: (4,) f32 [pole_mass, cart_mass, pole_length, gravity]
            (shared across the batch).
        n_substeps / dt: inner physics steps and their timestep.

    Returns:
        (B, 4) f32 new states.
    """
    B = states.shape[0]
    pad = (-B) % block_b
    Bp = B + pad
    # Stack into the (8, Bp) lane-major block.
    stacked = jnp.zeros((8, Bp), jnp.float32)
    stacked = stacked.at[0:4, :B].set(states.T)
    stacked = stacked.at[4, :B].set(forces)
    stacked = stacked.at[5:7, :B].set(tab_forces.T)
    params2d = params.reshape(1, 4).astype(jnp.float32)

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_cartpole_kernel, n_substeps=n_substeps, dt=dt),
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(params2d, stacked)
    return out[0:4, :B].T


def quad2d_substeps(x, xd, z, zd, th, thd, T1, T2, fx, fz, m, Iyy, L, g,
                    n_substeps, dt):
    """``n_substeps`` fused semi-implicit 2D-quad updates on VPU vectors.
    Mirrors Quadrotor._sim_xdot for the plain 'pyb' physics mode
    (quadrotor.py:476-498 of this repo; reference base_aviary.py:364-384).
    Shared by the per-step advance kernel and the whole-rollout kernel."""
    # Torque is state-independent: constant angular acceleration. All
    # divides are loop-invariant — hoisted out of the substep loop.
    th_dd = L * (T2 - T1) / Iyy / jnp.sqrt(2.0)
    inv_m = 1.0 / m
    tom = (T1 + T2) * inv_m
    fxm = fx * inv_m
    fzm_g = fz * inv_m - g

    for _ in range(n_substeps):
        sin_t = jnp.sin(th)
        cos_t = jnp.cos(th)
        x_dd = sin_t * tom + fxm
        z_dd = cos_t * tom + fzm_g
        xd = xd + dt * x_dd
        zd = zd + dt * z_dd
        thd = thd + dt * th_dd
        x = x + dt * xd
        z = z + dt * zd
        th = th + dt * thd
    return x, xd, z, zd, th, thd


def _quad2d_kernel(params_ref, in_ref, out_ref, *, n_substeps, dt):
    """Fused 2D-quadrotor control step: n_substeps semi-implicit updates.

    Rows: 0..5 = [x, x_dot, z, z_dot, theta, theta_dot], 6 = T1 (front
    rotor-pair thrust), 7 = T2, 8..9 = world disturbance force (fx, fz),
    10..15 = padding.
    """
    x, xd, z, zd, th, thd = quad2d_substeps(
        in_ref[0, :], in_ref[1, :], in_ref[2, :], in_ref[3, :],
        in_ref[4, :], in_ref[5, :], in_ref[6, :], in_ref[7, :],
        in_ref[8, :], in_ref[9, :],
        params_ref[0, 0], params_ref[0, 1], params_ref[0, 2],
        params_ref[0, 3], n_substeps, dt)

    out_ref[0, :] = x
    out_ref[1, :] = xd
    out_ref[2, :] = z
    out_ref[3, :] = zd
    out_ref[4, :] = th
    out_ref[5, :] = thd
    out_ref[6, :] = in_ref[6, :]
    out_ref[7, :] = in_ref[7, :]
    out_ref[8, :] = in_ref[8, :]
    out_ref[9, :] = in_ref[9, :]
    out_ref[10, :] = in_ref[10, :]
    out_ref[11, :] = in_ref[11, :]
    out_ref[12, :] = in_ref[12, :]
    out_ref[13, :] = in_ref[13, :]
    out_ref[14, :] = in_ref[14, :]
    out_ref[15, :] = in_ref[15, :]


@functools.partial(jax.jit, static_argnames=('n_substeps', 'dt', 'block_b'))
def quad2d_advance_pallas(states, t1, t2, dyn_forces, params,
                          n_substeps: int, dt: float, block_b: int = 1024):
    """Advance a batch of 2D quadrotors by one control step.

    Args:
        states: (B, 6) f32 [x, x_dot, z, z_dot, theta, theta_dot].
        t1/t2: (B,) f32 rotor-pair thrusts (held over the control step).
        dyn_forces: (B, 2) f32 world-frame disturbance (fx, fz).
        params: (4,) f32 [mass, Iyy, arm_length, gravity].
    """
    B = states.shape[0]
    pad = (-B) % block_b
    Bp = B + pad
    stacked = jnp.zeros((16, Bp), jnp.float32)
    stacked = stacked.at[0:6, :B].set(states.T)
    stacked = stacked.at[6, :B].set(t1)
    stacked = stacked.at[7, :B].set(t2)
    stacked = stacked.at[8:10, :B].set(dyn_forces.T)
    params2d = params.reshape(1, 4).astype(jnp.float32)

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_quad2d_kernel, n_substeps=n_substeps, dt=dt),
        out_shape=jax.ShapeDtypeStruct((16, Bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(params2d, stacked)
    return out[0:6, :B].T


def quad3d_substeps(state, forces, zt, dist, m, Ixx, Iyy, Izz, L, g,
                    n_substeps, dt):
    """``n_substeps`` fused semi-implicit 3D-quad updates on VPU vectors.

    ``state`` is the 12-tuple [x, x_dot, y, y_dot, z, z_dot, phi, theta,
    psi, p, q, r]; ``forces`` the per-motor 4-tuple; ``dist`` the world
    (fx, fy, fz) 3-tuple. Mirrors Quadrotor._sim_xdot / _sim_pos_rates for
    QuadType.THREE_D (quadrotor.py:499-541 of this repo; reference
    quadrotor.py:513-570, Luis & Le Ny 2016): R = Rz Ry Rx thrust
    direction, diagonal-J Euler equations, ZYX Euler-rate map W.
    Semi-implicit: velocities/body-rates first; positions advance with the
    new linear velocities; Euler angles advance with W(old angles) @ new
    body rates. Shared by the per-step advance kernel and the
    whole-rollout kernel."""
    x, xd, y, yd, z, zd, phi, th, psi, p, q, r = state
    f0, f1, f2, f3 = forces
    fx, fy, fz = dist

    total = f0 + f1 + f2 + f3
    l_sq2 = L / jnp.sqrt(2.0)
    Mx = l_sq2 * (f0 + f1 - f2 - f3)
    My = l_sq2 * (-f0 + f1 + f2 - f3)
    # Hoist every loop-invariant divide; the substep loop keeps ONE
    # reciprocal (1/cos_theta) — was 9 VPU divides per substep.
    inv_m = 1.0 / m
    tom = total * inv_m
    fxm = fx * inv_m
    fym = fy * inv_m
    fzm_g = fz * inv_m - g
    c_p = (Izz - Iyy) / Ixx
    c_q = (Ixx - Izz) / Iyy
    c_r = (Iyy - Ixx) / Izz
    Mx_I = Mx / Ixx
    My_I = My / Iyy
    zt_I = zt / Izz

    for _ in range(n_substeps):
        sphi, cphi = jnp.sin(phi), jnp.cos(phi)
        sth, cth = jnp.sin(th), jnp.cos(th)
        spsi, cpsi = jnp.sin(psi), jnp.cos(psi)
        # Thrust direction = third column of Rz(psi) Ry(th) Rx(phi).
        x_dd = (cphi * sth * cpsi + sphi * spsi) * tom + fxm
        y_dd = (cphi * sth * spsi - sphi * cpsi) * tom + fym
        z_dd = cphi * cth * tom + fzm_g
        # Euler equations with diagonal inertia.
        p_d = Mx_I - q * r * c_p
        q_d = My_I - p * r * c_q
        r_d = zt_I - p * q * c_r
        # Velocities / body rates first (semi-implicit).
        xd = xd + dt * x_dd
        yd = yd + dt * y_dd
        zd = zd + dt * z_dd
        p = p + dt * p_d
        q = q + dt * q_d
        r = r + dt * r_d
        # Positions with NEW velocities; angles with W(old) @ new rates.
        x = x + dt * xd
        y = y + dt * yd
        z = z + dt * zd
        # NOTE: keep these as plain divides — an explicit shared
        # reciprocal (rcth = 1/cth reused across phi_d/psi_d) makes the
        # unrolled-loop lowering superlinear (interpret-mode compile goes
        # 35 s -> >300 s at 14-20 substeps; measured, do not "optimize").
        tth = sth / cth
        phi_d = p + sphi * tth * q + cphi * tth * r
        th_d = cphi * q - sphi * r
        psi_d = sphi / cth * q + cphi / cth * r
        phi = phi + dt * phi_d
        th = th + dt * th_d
        psi = psi + dt * psi_d

    return x, xd, y, yd, z, zd, phi, th, psi, p, q, r


def _quad3d_kernel(params_ref, in_ref, out_ref, *, n_substeps, dt):
    """Fused 3D-quadrotor control step (plain 'pyb' physics).

    Rows: 0..11 = [x, x_dot, y, y_dot, z, z_dot, phi, theta, psi, p, q, r],
    12..15 = per-motor forces (held), 16 = z torque, 17..19 = world
    disturbance force, 20..23 = padding.
    """
    new_state = quad3d_substeps(
        tuple(in_ref[k, :] for k in range(12)),
        tuple(in_ref[12 + k, :] for k in range(4)),
        in_ref[16, :],
        tuple(in_ref[17 + k, :] for k in range(3)),
        params_ref[0, 0], params_ref[0, 1], params_ref[0, 2],
        params_ref[0, 3], params_ref[0, 4], params_ref[0, 5],
        n_substeps, dt)
    for k in range(12):
        out_ref[k, :] = new_state[k]
    for i in range(12, 24):
        out_ref[i, :] = in_ref[i, :]


@functools.partial(jax.jit, static_argnames=('n_substeps', 'dt', 'block_b'))
def quad3d_advance_pallas(states, forces, z_torque, dyn_forces, params,
                          n_substeps: int, dt: float, block_b: int = 1024):
    """Advance a batch of 3D quadrotors by one control step.

    Args:
        states: (B, 12) f32 rigid-body state.
        forces: (B, 4) f32 per-motor forces (held over the control step).
        z_torque: (B,) f32 net yaw torque.
        dyn_forces: (B, 3) f32 world-frame disturbance force.
        params: (6,) f32 [mass, Ixx, Iyy, Izz, arm_length, gravity].
    """
    B = states.shape[0]
    pad = (-B) % block_b
    Bp = B + pad
    stacked = jnp.zeros((24, Bp), jnp.float32)
    stacked = stacked.at[0:12, :B].set(states.T)
    stacked = stacked.at[12:16, :B].set(forces.T)
    stacked = stacked.at[16, :B].set(z_torque)
    stacked = stacked.at[17:20, :B].set(dyn_forces.T)
    params2d = params.reshape(1, 6).astype(jnp.float32)

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_quad3d_kernel, n_substeps=n_substeps, dt=dt),
        out_shape=jax.ShapeDtypeStruct((24, Bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((24, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((24, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(params2d, stacked)
    return out[0:12, :B].T
