"""Rotation and trajectory-projection helpers (pure JAX).

Replaces the reference's CasADi/numpy transformation utilities
(math_and_models/transformations.py): ``RotXYZ`` (the SDFormat / PyBullet
Euler convention R = Rz(psi) @ Ry(theta) @ Rx(phi), transformations.py:173+),
``projection_matrix`` + ``transform_trajectory`` used to map planar reference
trajectories onto an arbitrary plane for 3-D tracking
(transformations.py:54-126), and quaternion/Euler conversions used by the PID
controller (pid.py:11,197).

Everything is a pure function of jnp arrays — usable inside jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    'normalize_angle', 'rot_x', 'rot_y', 'rot_z', 'rot_xyz',
    'euler_to_quat', 'quat_to_rot', 'euler_to_rot', 'quat_to_euler',
    'projection_matrix', 'transform_trajectory', 'skew',
]


def normalize_angle(x):
    """Wrap angle to [-pi, pi). Mirrors math_and_models/normalization.py:8-10."""
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def rot_x(phi):
    c, s = jnp.cos(phi), jnp.sin(phi)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def rot_y(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def rot_z(psi):
    c, s = jnp.cos(psi), jnp.sin(psi)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def rot_xyz(phi, theta, psi):
    """Rotation matrix body->world for XYZ (roll, pitch, yaw) Euler angles.

    R = Rz(psi) @ Ry(theta) @ Rx(phi) — the SDFormat convention used by
    PyBullet and the reference's csRotXYZ (transformations.py:173+).
    """
    return rot_z(psi) @ rot_y(theta) @ rot_x(phi)


euler_to_rot = rot_xyz


def skew(v):
    """Skew-symmetric cross-product matrix of a 3-vector."""
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


def euler_to_quat(rpy):
    """XYZ Euler angles -> quaternion (x, y, z, w) — PyBullet ordering."""
    half = 0.5 * rpy
    cr, cp, cy = jnp.cos(half[0]), jnp.cos(half[1]), jnp.cos(half[2])
    sr, sp, sy = jnp.sin(half[0]), jnp.sin(half[1]), jnp.sin(half[2])
    qw = cr * cp * cy + sr * sp * sy
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    return jnp.array([qx, qy, qz, qw])


def quat_to_rot(q):
    """Quaternion (x, y, z, w) -> rotation matrix (body->world)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def quat_to_euler(q):
    """Quaternion (x, y, z, w) -> XYZ Euler (roll, pitch, yaw)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.array([roll, pitch, yaw])


def projection_matrix(normal):
    """Orthonormal basis of the plane with the given (unit) normal.

    Returns a (3, 2) matrix whose columns span the plane, matching the
    reference's construction (transformations.py:54-92): the first basis
    vector is the normalized projection of e_x (or e_y if the normal is
    e_x-aligned) onto the plane, the second is normal x first.
    """
    n = jnp.asarray(normal, dtype=jnp.float64 if jnp.asarray(normal).dtype == jnp.float64 else jnp.float32)
    n = n / jnp.linalg.norm(n)
    # Pick a seed axis not parallel to the normal.
    ex = jnp.array([1.0, 0.0, 0.0], dtype=n.dtype)
    ey = jnp.array([0.0, 1.0, 0.0], dtype=n.dtype)
    seed = jnp.where(jnp.abs(n @ ex) > 0.9, ey, ex)
    b1 = seed - (seed @ n) * n
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(n, b1)
    return jnp.stack([b1, b2], axis=1)


def transform_trajectory(pos, vel, trans_info):
    """Project planar (2D embedded in 3D) trajectories onto a target plane.

    ``pos``/``vel``: (T, 3) arrays whose first two columns carry the planar
    trajectory; ``trans_info``: dict with 'point' (3,) and 'normal' (3,).
    Mirrors transformations.py:95-126 / quadrotor.py:303-309.
    """
    point = jnp.asarray(trans_info['point'])
    normal = jnp.asarray(trans_info['normal'])
    PM = projection_matrix(normal)
    planar_pos = pos[:, :2]
    planar_vel = vel[:, :2]
    new_pos = planar_pos @ PM.T + point
    new_vel = planar_vel @ PM.T
    return new_pos, new_vel
