"""Random processes for exploration noise — functional rebuild of
math_and_models/random_processes.py:21-54 (GaussianProcess /
OrnsteinUhlenbeckProcess used by DDPG).

Each process is (init_state, sample(state, key, std) -> (noise, state')),
jit/scan-friendly; thin class wrappers keep the reference's sample()/
reset_states() API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.math.schedules import ConstantSchedule, LinearSchedule  # noqa: F401

__all__ = ['GaussianProcess', 'OrnsteinUhlenbeckProcess',
           'ou_init', 'ou_sample', 'gaussian_sample']


def gaussian_sample(key, shape, std):
    return jax.random.normal(key, shape) * std


def ou_init(shape):
    return jnp.zeros(shape)


def ou_sample(state, key, std, theta=0.15, dt=1e-2, mu=0.0):
    """One Ornstein-Uhlenbeck step (random_processes.py:37-54)."""
    noise = (state + theta * (mu - state) * dt
             + std * np.sqrt(dt) * jax.random.normal(key, state.shape))
    return noise, noise


class GaussianProcess:
    """i.i.d. Gaussian noise with scheduled std."""

    def __init__(self, size, std):
        self.size = size
        self.std = std
        self._key = jax.random.PRNGKey(0)

    def sample(self):
        self._key, k = jax.random.split(self._key)
        return np.asarray(gaussian_sample(k, (self.size,), self.std()))

    def reset_states(self):
        pass


class OrnsteinUhlenbeckProcess:
    """Temporally correlated noise for DDPG exploration."""

    def __init__(self, size, std, theta=0.15, dt=1e-2, x0=None):
        self.size = size
        self.std = std
        self.theta = theta
        self.dt = dt
        self.x0 = x0
        self._key = jax.random.PRNGKey(0)
        self.reset_states()

    def sample(self):
        self._key, k = jax.random.split(self._key)
        noise, self.x_prev = ou_sample(self.x_prev, k, self.std(),
                                       theta=self.theta, dt=self.dt)
        return np.asarray(noise)

    def reset_states(self):
        self.x_prev = (jnp.asarray(self.x0) if self.x0 is not None
                       else jnp.zeros(self.size))
