"""Checkpoint/resume determinism: training continued from a checkpoint
reproduces the uninterrupted run (reference parity: full-RNG resumable
training, ppo.py:112-148)."""

from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import get_config, make

pytestmark = pytest.mark.slow  # trains every controller twice (resume matrix)


def _make_ppo(tmp, seed=0, max_steps=2000):
    cfg = get_config('ppo')
    env_func = partial(make, 'cartpole', normalized_rl_action_space=True)
    return make('ppo', env_func, output_dir=str(tmp), seed=seed,
                **{**cfg, 'max_env_steps': max_steps,
                   'rollout_batch_size': 8, 'rollout_steps': 25,
                   'mini_batch_size': 64, 'opt_epochs': 2, 'use_gae': True})


def _make_sac(tmp, seed=0, max_steps=1200):
    cfg = get_config('sac')
    env_func = partial(make, 'cartpole', seed=0,
                       normalized_rl_action_space=True)
    cfg.update(max_env_steps=max_steps, warm_up_steps=300,
               train_interval=100, train_batch_size=32,
               rollout_batch_size=4, max_buffer_size=5000,
               eval_interval=0, log_interval=0, save_interval=0,
               checkpoint_path='')
    return make('sac', env_func, training=True, seed=seed,
                output_dir=str(tmp), **cfg)


def test_sac_resume_matches_uninterrupted(tmp_path):
    """save_buffer=True checkpoints restore the replay ring + env states +
    PRNG so off-policy training resumes exactly (reference sac.py
    save_buffer semantics)."""
    ctrl_a = _make_sac(tmp_path / 'a', max_steps=1200)
    ctrl_a.reset()
    ctrl_a.learn()

    ctrl_b = _make_sac(tmp_path / 'b', max_steps=600)
    ctrl_b.reset()
    ctrl_b.learn()
    ckpt = str(tmp_path / 'sac_ckpt.pt')
    ctrl_b.save(ckpt, save_buffer=True)

    ctrl_c = _make_sac(tmp_path / 'c', seed=88, max_steps=1200)
    ctrl_c.load(ckpt)
    ctrl_c.learn()

    obs = np.full(4, 0.06, np.float32)
    a = ctrl_a.select_action(obs)
    c = ctrl_c.select_action(obs)
    assert np.allclose(a, c, atol=1e-5), (a, c)
    for x in (ctrl_a, ctrl_b, ctrl_c):
        x.close()


def test_ddpg_resume_matches_uninterrupted(tmp_path):
    """Same save_buffer contract for DDPG incl. the OU-noise state."""
    def mk(tmp, seed=0, max_steps=1200):
        cfg = get_config('ddpg')
        env_func = partial(make, 'cartpole', seed=0,
                           normalized_rl_action_space=True)
        cfg.update(max_env_steps=max_steps, warm_up_steps=300,
                   train_interval=100, train_batch_size=32,
                   rollout_batch_size=4, max_buffer_size=5000,
                   eval_interval=0, log_interval=0, save_interval=0,
                   checkpoint_path='')
        return make('ddpg', env_func, training=True, seed=seed,
                    output_dir=str(tmp), **cfg)

    ctrl_a = mk(tmp_path / 'a', max_steps=1200)
    ctrl_a.reset()
    ctrl_a.learn()

    ctrl_b = mk(tmp_path / 'b', max_steps=600)
    ctrl_b.reset()
    ctrl_b.learn()
    ckpt = str(tmp_path / 'ddpg_ckpt.pt')
    ctrl_b.save(ckpt, save_buffer=True)

    ctrl_c = mk(tmp_path / 'c', seed=88, max_steps=1200)
    ctrl_c.load(ckpt)
    ctrl_c.learn()

    obs = np.full(4, 0.06, np.float32)
    assert np.allclose(ctrl_a.select_action(obs), ctrl_c.select_action(obs),
                       atol=1e-5)
    for x in (ctrl_a, ctrl_b, ctrl_c):
        x.close()


def _make_rarl(tmp, seed=1, max_steps=512):
    cfg = get_config('rarl')
    env_func = partial(make, 'cartpole', seed=3, cost='rl_reward',
                       normalized_rl_action_space=True, randomized_init=True,
                       episode_len_sec=3, ctrl_freq=15, pyb_freq=750,
                       adversary_disturbance='dynamics',
                       adversary_disturbance_scale=1.0)
    cfg.update(rollout_batch_size=4, rollout_steps=16, agent_iterations=1,
               adversary_iterations=1, opt_epochs=2, mini_batch_size=32,
               max_env_steps=max_steps, log_interval=0, checkpoint_path='')
    return make('rarl', env_func, training=True, seed=seed,
                output_dir=str(tmp), **cfg)


def test_rarl_resume_matches_uninterrupted(tmp_path):
    """Both agents + PRNG + env states restore for exact adversarial
    training resume (reference rarl.py:122-158 random_state parity)."""
    ctrl_a = _make_rarl(tmp_path / 'a', max_steps=512)
    ctrl_a.reset()
    ctrl_a.learn()

    ctrl_b = _make_rarl(tmp_path / 'b', max_steps=256)
    ctrl_b.reset()
    ctrl_b.learn()
    ckpt = str(tmp_path / 'rarl_ckpt.pt')
    ctrl_b.save(ckpt)

    ctrl_c = _make_rarl(tmp_path / 'c', seed=77, max_steps=512)
    ctrl_c.load(ckpt)
    ctrl_c.learn()

    obs = np.full(4, 0.07, np.float32)
    assert np.allclose(ctrl_a.select_action(obs), ctrl_c.select_action(obs),
                       atol=1e-5)
    assert np.allclose(ctrl_a.adversary.act(obs), ctrl_c.adversary.act(obs),
                       atol=1e-5)
    for c in (ctrl_a, ctrl_b, ctrl_c):
        c.close()


def _make_safe_ppo(tmp, seed=0, max_steps=512):
    cfg = get_config('safe_explorer_ppo')
    env_func = partial(make, 'cartpole', seed=7, cost='rl_reward',
                       normalized_rl_action_space=True, randomized_init=True,
                       episode_len_sec=3, ctrl_freq=15, pyb_freq=750,
                       constraints=[{'constraint_form': 'abs_bound',
                                     'constrained_variable': 'state',
                                     'bound': [1.5, 2.0, 0.3, 2.0]}],
                       done_on_violation=False, done_on_out_of_bound=False)
    cfg.update(rollout_batch_size=4, rollout_steps=16, opt_epochs=2,
               mini_batch_size=32, max_env_steps=max_steps,
               pretraining=False, log_interval=0, checkpoint_path='')
    return make('safe_explorer_ppo', env_func, training=True, seed=seed,
                output_dir=str(tmp), **cfg)


def test_safe_explorer_resume_matches_uninterrupted(tmp_path):
    """PPO-phase resume is exact once the safety layer is fixed
    (reference safe_ppo.py:124-165 random_state parity)."""
    ctrl_a = _make_safe_ppo(tmp_path / 'a', max_steps=512)
    ctrl_a.reset()
    ctrl_a.learn()

    ctrl_b = _make_safe_ppo(tmp_path / 'b', max_steps=256)
    ctrl_b.reset()
    ctrl_b.learn()
    ckpt = str(tmp_path / 'se_ckpt.pt')
    ctrl_b.save(ckpt)

    ctrl_c = _make_safe_ppo(tmp_path / 'c', seed=55, max_steps=512)
    ctrl_c.load(ckpt)
    ctrl_c.learn()

    obs = np.full(4, 0.04, np.float32)
    nC = ctrl_a.num_constraints
    a = ctrl_a.select_action(obs, {'constraint_values': np.zeros(nC)})
    c = ctrl_c.select_action(obs, {'constraint_values': np.zeros(nC)})
    assert np.allclose(a, c, atol=1e-5), (a, c)
    for x in (ctrl_a, ctrl_b, ctrl_c):
        x.close()


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
