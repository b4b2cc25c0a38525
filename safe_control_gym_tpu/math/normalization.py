"""Normalization — parity with math_and_models/normalization.py:8-202,
rebuilt as pure-functional state pytrees (usable inside jitted rollouts)
plus thin stateful wrappers with the reference's class API.

Functional core:
* ``rms_init/rms_update/rms_normalize`` — Welford running mean/std.
* ``ret_init/ret_update`` — running discounted-return accumulator for
  reward scaling (RewardStdNormalizer semantics, :123-159).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from safe_control_gym_tpu.math.rotations import normalize_angle  # noqa: F401 (re-export)

__all__ = [
    'normalize_angle', 'RunningMeanStd', 'BaseNormalizer',
    'MeanStdNormalizer', 'RewardStdNormalizer', 'RescaleNormalizer',
    'ImageNormalizer', 'ActionUnnormalizer',
    'NormalizerState', 'rms_init', 'rms_update', 'rms_normalize',
    'RetState', 'ret_init', 'ret_update',
]


@struct.dataclass
class NormalizerState:
    mean: jax.Array
    var: jax.Array
    count: jax.Array


def rms_init(shape, epsilon=1e-4) -> NormalizerState:
    return NormalizerState(mean=jnp.zeros(shape), var=jnp.ones(shape),
                           count=jnp.asarray(epsilon))


def rms_update(state: NormalizerState, batch: jax.Array) -> NormalizerState:
    """Welford parallel update over the leading batch axes
    (normalization.py:27-56)."""
    flat = batch.reshape((-1,) + state.mean.shape)
    batch_mean = flat.mean(axis=0)
    batch_var = flat.var(axis=0)
    batch_count = flat.shape[0]
    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    M2 = m_a + m_b + delta ** 2 * state.count * batch_count / tot
    return NormalizerState(mean=new_mean, var=M2 / tot, count=tot)


def rms_normalize(state: NormalizerState, x: jax.Array, clip=10.0) -> jax.Array:
    return jnp.clip((x - state.mean) / jnp.sqrt(state.var + 1e-8), -clip, clip)


@struct.dataclass
class RetState:
    rms: NormalizerState
    ret: jax.Array  # running discounted return per env


def ret_init(n_envs: int, epsilon=1e-4) -> RetState:
    return RetState(rms=rms_init((), epsilon), ret=jnp.zeros(n_envs))


def ret_update(state: RetState, rewards: jax.Array, dones: jax.Array,
               gamma: float):
    """Update running returns + their std; returns new state
    (RewardStdNormalizer.__call__ :134-159)."""
    ret = state.ret * gamma + rewards
    rms = rms_update(state.rms, ret)
    ret = jnp.where(dones, 0.0, ret)
    return RetState(rms=rms, ret=ret)


def ret_normalize(state: RetState, rewards: jax.Array, clip=10.0) -> jax.Array:
    return jnp.clip(rewards / jnp.sqrt(state.rms.var + 1e-8), -clip, clip)


# ---------------------------------------------------------------------------
# Stateful wrappers (reference class API)
# ---------------------------------------------------------------------------

class RunningMeanStd:
    """Host-side Welford tracker (normalization.py:13-56)."""

    def __init__(self, epsilon=1e-4, shape=()):
        self.state = rms_init(shape, epsilon)

    @property
    def mean(self):
        return np.asarray(self.state.mean)

    @property
    def var(self):
        return np.asarray(self.state.var)

    def update(self, arr):
        self.state = rms_update(self.state, jnp.asarray(arr))


class BaseNormalizer:
    """No-op normalizer with read-only flag (normalization.py:59-85)."""

    def __init__(self, read_only=False):
        self.read_only = read_only

    def set_read_only(self):
        self.read_only = True

    def unset_read_only(self):
        self.read_only = False

    def __call__(self, x, *args, **kwargs):
        return x

    def state_dict(self):
        return {}

    def load_state_dict(self, _):
        return


class MeanStdNormalizer(BaseNormalizer):
    """Observation normalizer (normalization.py:88-120)."""

    def __init__(self, shape=(), read_only=False, clip=10.0, epsilon=1e-8):
        super().__init__(read_only)
        self.read_only = read_only
        self.rms = RunningMeanStd(shape=shape)
        self.clip = clip
        self.epsilon = epsilon

    def __call__(self, x):
        x = np.asarray(x)
        if not self.read_only:
            self.rms.update(x.reshape((-1,) + self.rms.state.mean.shape))
        return np.clip(
            (x - self.rms.mean) / np.sqrt(self.rms.var + self.epsilon),
            -self.clip, self.clip)

    def state_dict(self):
        return {'mean': self.rms.mean, 'var': self.rms.var,
                'count': np.asarray(self.rms.state.count)}

    def load_state_dict(self, saved):
        self.rms.state = NormalizerState(mean=jnp.asarray(saved['mean']),
                                         var=jnp.asarray(saved['var']),
                                         count=jnp.asarray(saved['count']))


class RewardStdNormalizer(BaseNormalizer):
    """Reward normalizer by std of discounted returns
    (normalization.py:123-159)."""

    def __init__(self, gamma=0.99, read_only=False, clip=10.0, epsilon=1e-8):
        super().__init__(read_only)
        self.gamma = gamma
        self.rms = RunningMeanStd(shape=())
        self.clip = clip
        self.epsilon = epsilon
        self.ret = None

    def __call__(self, rews, dones):
        rews = np.atleast_1d(np.asarray(rews, dtype=np.float64))
        dones = np.atleast_1d(np.asarray(dones))
        if self.ret is None:
            self.ret = np.zeros(rews.shape[0])
        if not self.read_only:
            self.ret = self.ret * self.gamma + rews
            self.rms.update(self.ret)
            self.ret[dones.astype(bool)] = 0.0
        return np.clip(rews / np.sqrt(self.rms.var + self.epsilon),
                       -self.clip, self.clip)

    def state_dict(self):
        return {'mean': self.rms.mean, 'var': self.rms.var,
                'count': np.asarray(self.rms.state.count), 'ret': self.ret}

    def load_state_dict(self, saved):
        self.rms.state = NormalizerState(mean=jnp.asarray(saved['mean']),
                                         var=jnp.asarray(saved['var']),
                                         count=jnp.asarray(saved['count']))
        self.ret = saved.get('ret')


class RescaleNormalizer(BaseNormalizer):
    """Constant-coefficient rescale (normalization.py:162-174)."""

    def __init__(self, coef=1.0):
        super().__init__()
        self.coef = coef

    def __call__(self, x):
        return np.asarray(x) * self.coef


class ImageNormalizer(RescaleNormalizer):
    def __init__(self):
        super().__init__(1.0 / 255)


class ActionUnnormalizer(BaseNormalizer):
    """Map [-1, 1] actions to a Box action space (normalization.py:188-202)."""

    def __init__(self, action_space):
        super().__init__()
        self.low = np.asarray(action_space.low)
        self.high = np.asarray(action_space.high)

    def __call__(self, action):
        action = np.clip(np.asarray(action), -1, 1)
        return self.low + (action + 1) * 0.5 * (self.high - self.low)
