"""JaxVecEnv — the TPU-native vectorized environment.

This is the replacement for the reference's SubprocVecEnv
(subproc_vec_env.py:20-251): where the reference forks N worker processes
and ships actions/observations over pipes with cloudpickle, here ALL envs
are one vmapped functional program — ``reset``/``step`` are single fused
XLA calls over the whole batch, auto-reset included, and the batch axis can
additionally be sharded across TPU chips with ``jax.sharding``
(parallel/sharded_env.py).

Implements the same VecEnv API (step/reset/get_attr/env_method) so
controller code written against the reference's interface runs unchanged;
per-env randomness comes from split PRNG keys instead of per-worker numpy
states.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.env_wrappers.vectorized_env.vec_env import \
    VecEnv

__all__ = ['JaxVecEnv']


class JaxVecEnv(VecEnv):
    """N vmapped functional envs as one device-resident batch."""

    def __init__(self, env_fn, n_envs: int, seed: int = 0):
        # One template env provides the functional core + spaces/config.
        self.template = env_fn()
        func = self.template.func
        self.func = func
        super().__init__(n_envs, self.template.observation_space,
                         self.template.action_space)
        self._reset_v = jax.jit(jax.vmap(func.reset))
        self._step_v = jax.jit(jax.vmap(func.step))
        self._key = jax.random.PRNGKey(seed)
        self._states = None
        self.actions = None

    def _next_keys(self, n):
        self._key, sub = jax.random.split(self._key)
        return jax.random.split(sub, n)

    def reset(self):
        self._states, obs = self._reset_v(self._next_keys(self.num_envs))
        return np.asarray(obs)

    def step_async(self, actions):
        self.actions = jnp.asarray(actions, jnp.float32)

    def step_wait(self):
        self._states, out = self._step_v(self._states, self.actions)
        done = np.asarray(out.done)
        obs = np.asarray(out.obs)
        infos = []
        for i in range(self.num_envs):
            info = {'current_step': int(self._states.ctrl_step[i]),
                    'mse': float(out.mse[i]),
                    'constraint_violation': int(out.constraint_violation[i])}
            if self.func.n_constraints:
                info['constraint_values'] = np.asarray(
                    out.constraint_values[i])
            if bool(out.truncated[i]):
                info['TimeLimit.truncated'] = True
            infos.append(info)
        if done.any():
            # Auto-reset with terminal stash.
            idx = np.where(done)[0]
            fresh_states, fresh_obs = self._reset_v(
                self._next_keys(self.num_envs))
            done_b = jnp.asarray(done)
            self._states = jax.tree.map(
                lambda f, s: jnp.where(
                    done_b.reshape((self.num_envs,) + (1,) * (s.ndim - 1)),
                    f, s),
                fresh_states, self._states)
            for i in idx:
                infos[i]['terminal_observation'] = obs[i]
                infos[i]['terminal_info'] = dict(infos[i])
            obs = np.where(done[:, None], np.asarray(fresh_obs), obs)
        return obs, np.asarray(out.reward), done, infos

    def get_attr(self, attr_name, indices=None):
        return [getattr(self.template, attr_name)
                for _ in self._get_indices(indices)]

    def set_attr(self, attr_name, values, indices=None):
        setattr(self.template, attr_name, values)

    def env_method(self, method_name, method_args=None, method_kwargs=None,
                   indices=None):
        method_args = method_args or []
        method_kwargs = method_kwargs or {}
        fn = getattr(self.template, method_name)
        return [fn(*method_args, **method_kwargs)
                for _ in self._get_indices(indices)]

    def get_images(self):
        """Rasterize every env in the batch via the template renderer."""
        frames = []
        saved = getattr(self.template, 'state', None)
        states = np.asarray(self._states.state)
        for i in range(self.num_envs):
            self.template.state = states[i]
            frames.append(self.template.render())
        self.template.state = saved
        return frames

    def close_extras(self):
        self.template.close()

    def get_env_random_state(self):
        return [np.asarray(self._key)]

    def set_env_random_state(self, states):
        self._key = jnp.asarray(states[0])
