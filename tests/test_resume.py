"""Checkpoint/resume determinism: training continued from a checkpoint
reproduces the uninterrupted run (reference parity: full-RNG resumable
training, ppo.py:112-148)."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import get_config, make


def _make_ppo(tmp, seed=0, max_steps=2000):
    cfg = get_config('ppo')
    env_func = partial(make, 'cartpole', normalized_rl_action_space=True)
    return make('ppo', env_func, output_dir=str(tmp), seed=seed,
                **{**cfg, 'max_env_steps': max_steps,
                   'rollout_batch_size': 8, 'rollout_steps': 25,
                   'mini_batch_size': 64, 'opt_epochs': 2, 'use_gae': True})


def test_ppo_resume_matches_uninterrupted(tmp_path):
    # Uninterrupted 4 iterations.
    ctrl_a = _make_ppo(tmp_path / 'a', max_steps=800)
    ctrl_a.reset()
    ctrl_a.learn()
    params_a = ctrl_a.agent.params

    # Interrupted at 2 iterations + checkpoint + resume for 2 more.
    ctrl_b = _make_ppo(tmp_path / 'b', max_steps=400)
    ctrl_b.reset()
    ctrl_b.learn()
    ckpt = str(tmp_path / 'ckpt.pt')
    ctrl_b.save(ckpt)

    ctrl_c = _make_ppo(tmp_path / 'c', seed=99, max_steps=800)
    ctrl_c.load(ckpt)
    ctrl_c.learn()
    params_c = ctrl_c.agent.params

    obs = np.full(4, 0.07, np.float32)
    a_direct = ctrl_a.select_action(obs)
    a_resumed = ctrl_c.select_action(obs)
    # Exact resume: identical policies (env states + PRNG restored).
    assert np.allclose(a_direct, a_resumed, atol=1e-5), (a_direct, a_resumed)
    for c in (ctrl_a, ctrl_b, ctrl_c):
        c.close()
