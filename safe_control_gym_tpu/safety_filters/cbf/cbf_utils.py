"""CBF utilities — JAX rebuild of safety_filters/cbf/cbf_utils.py.

The ellipsoidal cartpole CBF candidate (cbf_utils.py:9-29), the linear class-K
function (:31-43), the cartesian grid helper (:46-62), and the CBF-NN replay
buffer (:64+, backed by the shared on-device replay of
controllers/off_policy_utils).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.off_policy_utils import (
    replay_init, replay_push, replay_sample)

__all__ = ['cbf_cartpole', 'linear_function', 'cartesian_product',
           'CBFBuffer']


def cbf_cartpole(state_limits):
    """Ellipsoidal CBF candidate h(x) = 1 - sum (x_i / limit_i)^2
    (cbf_utils.py:9-29)."""
    limits = jnp.asarray(np.asarray(state_limits, dtype=np.float32))

    def cbf(x):
        return 1.0 - jnp.sum((x / limits) ** 2)

    return cbf


def linear_function(slope: float):
    """One-dimensional linear class-K function (cbf_utils.py:31-43)."""
    def linear_func(x):
        return slope * x
    return linear_func


def cartesian_product(*arrays):
    """Cartesian product of 1-D arrays (cbf_utils.py:46-62)."""
    la = len(arrays)
    dtype = np.result_type(*arrays)
    arr = np.empty([len(a) for a in arrays] + [la], dtype=dtype)
    for i, a in enumerate(np.ix_(*arrays)):
        arr[..., i] = a
    return arr.reshape(-1, la)


class CBFBuffer:
    """Replay buffer for CBF-NN training data (cbf_utils.py:64+),
    backed by the on-device ring buffer."""

    def __init__(self, obs_dim, act_dim, max_size, batch_size=64):
        self.batch_size = batch_size
        self.state = replay_init(
            {'state': obs_dim, 'act': act_dim, 'barrier_dot': 1,
             'barrier_dot_approx': 1}, int(max_size))
        self._key = jax.random.PRNGKey(0)

    def push(self, batch):
        self.state = replay_push(self.state, {
            k: jnp.asarray(np.atleast_2d(np.asarray(v, dtype=np.float32)))
            for k, v in batch.items()})

    def sample(self, batch_size=None):
        self._key, k = jax.random.split(self._key)
        return replay_sample(self.state, k, batch_size or self.batch_size)
