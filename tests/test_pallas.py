"""Pallas fused-substeps kernel: numerical equivalence with the vmapped
semi-implicit-Euler path (runs in interpreter mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from safe_control_gym_tpu.envs.dynamics import (CartPoleParams,
                                                cartpole_dynamics_forced)


def test_cartpole_pallas_kernel_matches_reference(monkeypatch):
    import safe_control_gym_tpu.ops.pallas_kernels as pk
    monkeypatch.setattr(pk.pl, 'pallas_call',
                        functools.partial(pl.pallas_call, interpret=True))
    B = 256
    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 4)), jnp.float32)
    forces = jnp.asarray(rng.uniform(-5, 5, B), jnp.float32)
    tab = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 2)), jnp.float32)
    params = jnp.array([0.1, 1.0, 0.5, 9.8], jnp.float32)
    out_pallas = pk.cartpole_advance_pallas(states, forces, tab, params,
                                            n_substeps=20, dt=0.001)

    p = CartPoleParams()

    def ref_advance(x, u, t):
        for _ in range(20):
            xd = cartpole_dynamics_forced(x, u[None], t, p)
            v = jnp.stack([x[1] + 0.001 * xd[1], x[3] + 0.001 * xd[3]])
            x = jnp.stack([x[0] + 0.001 * v[0], v[0],
                           x[2] + 0.001 * v[1], v[1]])
        return x

    out_ref = jax.vmap(ref_advance)(states, forces, tab)
    assert float(jnp.abs(out_pallas - out_ref).max()) < 1e-5


def test_quad2d_pallas_kernel_matches_reference(monkeypatch):
    import safe_control_gym_tpu.ops.pallas_kernels as pk
    monkeypatch.setattr(pk.pl, 'pallas_call',
                        functools.partial(pl.pallas_call, interpret=True))
    B = 256
    rng = np.random.default_rng(1)
    states = jnp.asarray(
        np.stack([rng.uniform(-1, 1, B), rng.uniform(-0.5, 0.5, B),
                  rng.uniform(0.5, 1.5, B), rng.uniform(-0.5, 0.5, B),
                  rng.uniform(-0.3, 0.3, B), rng.uniform(-0.5, 0.5, B)],
                 axis=1), jnp.float32)
    t1 = jnp.asarray(rng.uniform(0.05, 0.2, B), jnp.float32)
    t2 = jnp.asarray(rng.uniform(0.05, 0.2, B), jnp.float32)
    dist = jnp.asarray(rng.uniform(-0.01, 0.01, (B, 2)), jnp.float32)
    m, Iyy, L, g = 0.027, 1.4e-5, 0.0397, 9.8
    params = jnp.array([m, Iyy, L, g], jnp.float32)
    out_pallas = pk.quad2d_advance_pallas(states, t1, t2, dist, params,
                                          n_substeps=20, dt=0.001)

    def ref_advance(x, T1, T2, f):
        th_dd = L * (T2 - T1) / Iyy / jnp.sqrt(2.0)
        total = T1 + T2
        for _ in range(20):
            sin_t, cos_t = jnp.sin(x[4]), jnp.cos(x[4])
            x_dd = sin_t * total / m + f[0] / m
            z_dd = cos_t * total / m - g + f[1] / m
            v = jnp.stack([x[1] + 0.001 * x_dd, x[3] + 0.001 * z_dd,
                           x[5] + 0.001 * th_dd])
            x = jnp.stack([x[0] + 0.001 * v[0], v[0],
                           x[2] + 0.001 * v[1], v[1],
                           x[4] + 0.001 * v[2], v[2]])
        return x

    out_ref = jax.vmap(ref_advance)(states, t1, t2, dist)
    assert float(jnp.abs(out_pallas - out_ref).max()) < 1e-5


def test_quad3d_pallas_kernel_sane(monkeypatch):
    """3D kernel: hover forces keep the state nearly constant; asymmetric
    forces induce the expected pitch/roll signs (interpret mode)."""
    import safe_control_gym_tpu.ops.pallas_kernels as pk
    monkeypatch.setattr(pk.pl, 'pallas_call',
                        functools.partial(pl.pallas_call, interpret=True))
    m, g = 0.027, 9.8
    params = jnp.array([m, 1.4e-5, 1.4e-5, 2.17e-5, 0.0397, g], jnp.float32)
    B = 4
    states = jnp.zeros((B, 12), jnp.float32).at[:, 4].set(1.0)
    hover = m * g / 4
    forces = jnp.full((B, 4), hover, jnp.float32)
    # env 1: extra thrust; env 2: front-pair bias (roll axis per mixer).
    forces = forces.at[1].mul(1.2)
    forces = forces.at[2, 0].mul(1.1)
    out = pk.quad3d_advance_pallas(states, forces, jnp.zeros((B,)),
                                   jnp.zeros((B, 3)), params,
                                   n_substeps=20, dt=0.001)
    assert float(jnp.abs(out[0] - states[0]).max()) < 1e-4   # hover holds
    assert out[1, 5] > 1e-3                                  # climbs
    assert abs(float(out[2, 9])) > 1e-3                      # rolls
