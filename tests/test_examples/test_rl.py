"""Integration-via-examples: RL train-then-evaluate
(mirrors reference tests/test_examples/test_rl.py; the reference loads
committed pretrained .pt files — here a fast on-device training run
produces the artifact first)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'rl'))


@pytest.mark.parametrize('ALGO', ['ppo', 'sac'])
def test_rl_cartpole_train_and_eval(ALGO, monkeypatch, tmp_path):
    from rl_experiment import run
    from train_rl import run as train_run
    base = os.path.join(EXAMPLES_DIR, 'rl', 'config_overrides', 'cartpole')
    args = ['x.py', '--algo', ALGO, '--task', 'cartpole', '--overrides',
            os.path.join(base, 'cartpole_stab.yaml'),
            os.path.join(base, f'{ALGO}_cartpole.yaml'),
            '--kv_overrides',
            'algo_config.max_env_steps=2000',
            'algo_config.rollout_batch_size=8',
            'algo_config.warm_up_steps=500',
            '--output_dir', str(tmp_path)]
    monkeypatch.setattr(sys, 'argv', args)
    train_run(curr_path=str(tmp_path))
    monkeypatch.setattr(sys, 'argv', args)
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10,
                         curr_path=str(tmp_path))
    assert 'average_rmse' in metrics
