"""Probability distributions (JAX) — parity with
math_and_models/distributions.py:9-60: ``Normal`` sums log-prob/entropy over
the last dim and exposes ``mode()``; ``Categorical`` wraps logits.

Implemented as lightweight pytree-friendly classes over pure functions so
they can be created inside jitted code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['Normal', 'Categorical']

_LOG_2PI = jnp.log(2.0 * jnp.pi)


class Normal:
    """Diagonal Gaussian; log_prob/entropy summed over last dim."""

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.normal(
            key, shape + jnp.shape(self.loc))

    def log_prob(self, value):
        var = self.scale ** 2
        lp = -((value - self.loc) ** 2) / (2 * var) - jnp.log(self.scale) - 0.5 * _LOG_2PI
        return jnp.sum(lp, axis=-1, keepdims=True)

    def entropy(self):
        ent = 0.5 + 0.5 * _LOG_2PI + jnp.log(self.scale)
        return jnp.sum(jnp.broadcast_to(ent, jnp.shape(self.loc)), axis=-1,
                       keepdims=True)

    def mode(self):
        return self.loc


class Categorical:
    """Categorical over logits; log_prob keeps a trailing singleton dim."""

    def __init__(self, logits):
        self.logits = logits
        self.log_p = jax.nn.log_softmax(logits, axis=-1)

    def sample(self, key):
        return jax.random.categorical(key, self.logits, axis=-1)

    def log_prob(self, value):
        value = jnp.asarray(value).astype(jnp.int32)
        # Accept (...,) indices or (..., 1) index columns.
        if value.ndim == self.logits.ndim:
            idx = value
        else:
            idx = value[..., None]
        lp = jnp.take_along_axis(self.log_p, idx, axis=-1)
        return lp

    def entropy(self):
        p = jnp.exp(self.log_p)
        return -jnp.sum(p * self.log_p, axis=-1, keepdims=True)

    def mode(self):
        return jnp.argmax(self.logits, axis=-1)
