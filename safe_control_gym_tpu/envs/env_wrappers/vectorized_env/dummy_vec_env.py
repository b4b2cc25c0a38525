"""Sequential in-process vec env — parity with
envs/env_wrappers/vectorized_env/dummy_vec_env.py (119 LoC reference).

Auto-resets finished envs, stashing ``terminal_observation`` /
``terminal_info`` in the step info (dummy_vec_env.py:29-41).
"""

from __future__ import annotations

import numpy as np

from safe_control_gym_tpu.envs.env_wrappers.vectorized_env.vec_env import \
    VecEnv

__all__ = ['DummyVecEnv']


class DummyVecEnv(VecEnv):
    """Sequential vectorized environment."""

    def __init__(self, env_fns):
        self.envs = [fn() for fn in env_fns]
        env = self.envs[0]
        super().__init__(len(env_fns), env.observation_space,
                         env.action_space)
        self.actions = None

    def reset(self):
        obs = []
        for env in self.envs:
            ob, _ = env.reset()
            obs.append(ob)
        return np.stack(obs)

    def step_async(self, actions):
        self.actions = actions

    def step_wait(self):
        obs_list, rew_list, done_list, info_list = [], [], [], []
        for env, action in zip(self.envs, self.actions):
            obs, rew, done, info = env.step(action)
            if done:
                # Auto-reset with terminal stash (dummy_vec_env.py:29-41).
                info['terminal_observation'] = obs
                info['terminal_info'] = dict(info)
                obs, _ = env.reset()
            obs_list.append(obs)
            rew_list.append(rew)
            done_list.append(done)
            info_list.append(info)
        return (np.stack(obs_list), np.asarray(rew_list),
                np.asarray(done_list), info_list)

    def close_extras(self):
        for env in self.envs:
            env.close()

    def get_images(self):
        return [env.render() for env in self.envs]

    def get_attr(self, attr_name, indices=None):
        return [getattr(self.envs[i], attr_name)
                for i in self._get_indices(indices)]

    def set_attr(self, attr_name, values, indices=None):
        indices = self._get_indices(indices)
        if not isinstance(values, (list, tuple)):
            values = [values] * len(list(indices))
            indices = self._get_indices(None)
        for i, v in zip(indices, values):
            setattr(self.envs[i], attr_name, v)

    def env_method(self, method_name, method_args=None, method_kwargs=None,
                   indices=None):
        method_args = method_args or []
        method_kwargs = method_kwargs or {}
        return [getattr(self.envs[i], method_name)(*method_args,
                                                   **method_kwargs)
                for i in self._get_indices(indices)]

    def get_env_random_state(self):
        """RNG snapshot per env (dummy_vec_env.py:68-74 analog): JAX keys."""
        return [np.asarray(env._key) for env in self.envs]

    def set_env_random_state(self, worker_random_states):
        import jax.numpy as jnp
        for env, s in zip(self.envs, worker_random_states):
            env._key = jnp.asarray(s)
