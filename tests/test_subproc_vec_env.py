"""SubprocVecEnv: spawn workers, pipe commands, auto-reset stash."""

from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.envs.env_wrappers.vectorized_env import (
    SubprocVecEnv, make_env_fn)
from safe_control_gym_tpu.utils.registration import make


@pytest.mark.timeout(180)
def test_subproc_vec_env_roundtrip():
    env_func = partial(make, 'cartpole', normalized_rl_action_space=True,
                       episode_len_sec=2)
    env_fns = [make_env_fn(env_func, seed=0, rank=i) for i in range(2)]
    venv = SubprocVecEnv(env_fns, n_workers=2)
    try:
        obs = venv.reset()
        assert obs.shape == (2, 4)
        total_dones = 0
        for _ in range(110):
            obs, rew, done, infos = venv.step(
                np.random.uniform(-1, 1, (2, 1)))
            total_dones += int(done.sum())
        assert total_dones >= 2  # episodes ended and auto-reset
        # Attribute access over pipes.
        freqs = venv.get_attr('CTRL_FREQ')
        assert freqs[0] == 50
        # env_method over pipes.
        venv.env_method('seed', method_args=[123])
    finally:
        venv.close()
