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
