"""Controller tests: LQR/PPO end-to-end on cartpole + experiment harness."""

import os
from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.registration import get_config, make

QUAD_TI = {'stabilization_goal': [0, 1], 'stabilization_goal_tolerance': 0.05}


def test_lqr_cartpole_stabilization():
    env_func = partial(make, 'cartpole', seed=42, cost='quadratic',
                       ctrl_freq=15, pyb_freq=750, episode_len_sec=10,
                       task_info={'stabilization_goal': [0.5],
                                  'stabilization_goal_tolerance': 0.01},
                       init_state={'init_theta': 0.1}, randomized_init=False)
    ctrl = make('lqr', env_func, q_lqr=[1], r_lqr=[0.1],
                discrete_dynamics=True)
    exp = BaseExperiment(env_func(), ctrl)
    data, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
    # Reaches the goal (episode ends before the 150-step time limit).
    assert metrics['average_length'] < 150
    final_state = data['state'][0][-1]
    assert abs(final_state[0] - 0.5) < 0.02
    exp.close()


def test_lqr_cartpole_tracking():
    env_func = partial(make, 'cartpole', seed=42, cost='quadratic',
                       task='traj_tracking', ctrl_freq=15, pyb_freq=750,
                       episode_len_sec=6, randomized_init=False)
    ctrl = make('lqr', env_func, q_lqr=[1], r_lqr=[0.1],
                discrete_dynamics=True)
    exp = BaseExperiment(env_func(), ctrl)
    data, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
    assert metrics['average_rmse'] < 0.3
    exp.close()


def test_lqr_quadrotor_2d():
    env_func = partial(make, 'quadrotor', seed=42, quad_type=2,
                       cost='quadratic', task_info={
                           'stabilization_goal': [0.5, 1.2],
                           'stabilization_goal_tolerance': 0.05},
                       init_state={'init_z': 1.0}, randomized_init=False,
                       ctrl_freq=60, pyb_freq=240, episode_len_sec=6)
    ctrl = make('lqr', env_func, q_lqr=[1], r_lqr=[0.1],
                discrete_dynamics=True)
    exp = BaseExperiment(env_func(), ctrl)
    data, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
    final_state = data['state'][0][-1]
    assert abs(final_state[0] - 0.5) < 0.1
    assert abs(final_state[2] - 1.2) < 0.1
    exp.close()


def test_ppo_learns_and_checkpoints(tmp_path):
    cfg = get_config('ppo')
    env_func = partial(make, 'cartpole', normalized_rl_action_space=True)
    ctrl = make('ppo', env_func, output_dir=str(tmp_path), seed=0,
                **{**cfg, 'max_env_steps': 4000, 'rollout_batch_size': 16,
                   'rollout_steps': 50, 'mini_batch_size': 128,
                   'opt_epochs': 5, 'use_gae': True})
    ctrl.reset()
    ctrl.learn()
    assert ctrl.total_steps >= 4000
    # Eval runs deterministically.
    res = ctrl.run(n_episodes=4)
    assert res['ep_returns'].shape == (4,)
    # Checkpoint round-trip preserves the policy.
    path = str(tmp_path / 'ckpt.pt')
    ctrl.save(path)
    obs = np.ones(4, dtype=np.float32) * 0.05
    act_before = ctrl.select_action(obs)
    ctrl2 = make('ppo', env_func, output_dir=str(tmp_path), seed=1,
                 **{**cfg, 'max_env_steps': 4000, 'rollout_batch_size': 16,
                    'rollout_steps': 50})
    ctrl2.load(path)
    act_after = ctrl2.select_action(obs)
    assert np.allclose(act_before, act_after, atol=1e-6)
    assert ctrl2.total_steps == ctrl.total_steps
    ctrl.close()
    ctrl2.close()


def test_ppo_select_action_deterministic():
    cfg = get_config('ppo')
    env_func = partial(make, 'cartpole')
    ctrl = make('ppo', env_func, seed=3, output_dir='/tmp/ppo_det', **cfg)
    obs = np.array([0.1, 0.0, -0.1, 0.0], dtype=np.float32)
    a1 = ctrl.select_action(obs)
    a2 = ctrl.select_action(obs)
    assert np.allclose(a1, a2)
    ctrl.close()


def test_experiment_with_seeds():
    env_func = partial(make, 'cartpole', seed=1, cost='quadratic',
                       task='traj_tracking', randomized_init=True,
                       episode_len_sec=2)
    ctrl = make('lqr', env_func, q_lqr=[1], r_lqr=[0.1])
    exp = BaseExperiment(env_func(), ctrl)
    data1, m1 = exp.run_evaluation(n_episodes=2, seeds=[7, 8], verbose=False)
    data2, m2 = exp.run_evaluation(n_episodes=2, seeds=[7, 8], verbose=False)
    assert np.allclose(data1['obs'][0], data2['obs'][0])
    exp.close()


def test_visualization_time_multiplier_pacing(monkeypatch):
    """run_evaluation's visualization_time_multiplier round-trips and paces
    GUI runs at k-by-realtime (reference base_experiment.py:57,185-192):
    with gui=True each control step sleeps toward 1/CTRL_FREQ/k; with
    multiplier=None (or a headless env) no pacing sleep happens."""
    import safe_control_gym_tpu.experiments.base_experiment as be

    env_func = partial(make, 'cartpole', seed=5, cost='quadratic',
                       task='traj_tracking', ctrl_freq=15, pyb_freq=750,
                       episode_len_sec=2, randomized_init=False, gui=True)
    ctrl = make('lqr', env_func, q_lqr=[1], r_lqr=[0.1])
    exp = BaseExperiment(env_func(), ctrl)
    sleeps = []
    monkeypatch.setattr(be.time, 'sleep', lambda s: sleeps.append(s))

    exp.run_evaluation(n_steps=5, visualization_time_multiplier=2, verbose=False)
    assert exp.visualization_time_multiplier == 2
    # One pacing sleep per select_action after the first; budget ceiling
    # is 1/CTRL_FREQ/mult.
    assert len(sleeps) >= 3
    assert all(0.0 <= s <= 1.0 / 15 / 2 + 1e-9 for s in sleeps)

    sleeps.clear()
    exp.run_evaluation(n_steps=5, visualization_time_multiplier=None,
                       verbose=False)
    assert sleeps == []
    exp.close()

    # Headless env (gui=False, the default): never paced.
    env_func2 = partial(make, 'cartpole', seed=5, cost='quadratic',
                        task='traj_tracking', ctrl_freq=15, pyb_freq=750,
                        episode_len_sec=2, randomized_init=False)
    ctrl2 = make('lqr', env_func2, q_lqr=[1], r_lqr=[0.1])
    exp2 = BaseExperiment(env_func2(), ctrl2)
    sleeps.clear()
    exp2.run_evaluation(n_steps=5, visualization_time_multiplier=1,
                        verbose=False)
    assert sleeps == []
    exp2.close()
