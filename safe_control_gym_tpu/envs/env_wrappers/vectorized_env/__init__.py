"""Vectorized env factory — parity with
envs/env_wrappers/vectorized_env/__init__.py:12-66.

``make_vec_envs`` builds seeded env thunks and picks the backend:
``JaxVecEnv`` (TPU-native fused batch) by default, ``SubprocVecEnv`` when
``n_processes > 1`` is explicitly requested, else ``DummyVecEnv``.
"""

from __future__ import annotations


from safe_control_gym_tpu.envs.env_wrappers.vectorized_env.dummy_vec_env import \
    DummyVecEnv
from safe_control_gym_tpu.envs.env_wrappers.vectorized_env.jax_vec_env import \
    JaxVecEnv
from safe_control_gym_tpu.envs.env_wrappers.vectorized_env.subproc_vec_env import \
    SubprocVecEnv
from safe_control_gym_tpu.envs.env_wrappers.vectorized_env.vec_env import (
    VecEnv, VecEnvWrapper)

__all__ = ['VecEnv', 'VecEnvWrapper', 'DummyVecEnv', 'SubprocVecEnv',
           'JaxVecEnv', 'make_env_fn', 'make_vec_envs']


def make_env_fn(env_func, seed=None, rank=0):
    """Seeded env thunk (vectorized_env/__init__.py:12-39 semantics: seed
    offset per rank)."""
    def _thunk():
        if seed is not None:
            return env_func(seed=seed + rank)
        return env_func()
    return _thunk


def make_vec_envs(env_func, env_configs=None, batch_size=1, n_processes=1,
                  seed=None, backend='jax'):
    """Construct a vectorized env (vectorized_env/__init__.py:42-66).

    ``backend='jax'`` returns the fused vmapped batch (recommended);
    n_processes > 1 selects SubprocVecEnv; otherwise DummyVecEnv.
    """
    if backend == 'jax':
        return JaxVecEnv(env_func, batch_size, seed=seed or 0)
    env_fns = [make_env_fn(env_func, seed=seed, rank=i)
               for i in range(batch_size)]
    if n_processes > 1:
        return SubprocVecEnv(env_fns, n_workers=n_processes)
    return DummyVecEnv(env_fns)
