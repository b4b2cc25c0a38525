"""Integration-via-examples: RL evaluation matrix + train-then-eval
(mirrors reference tests/test_examples/test_rl.py:8-21 cell-for-cell:
{cartpole, quadrotor_2D, quadrotor_3D} x {stab, track} x
{ppo, sac, safe_explorer_ppo}, loading the committed pretrained artifact
for each cell and rolling out 10 steps inference-only)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'rl'))

RL_DIR = os.path.join(EXAMPLES_DIR, 'rl')


@pytest.mark.parametrize('SYS', ['cartpole', 'quadrotor_2D', 'quadrotor_3D'])
@pytest.mark.parametrize('TASK', ['stab', 'track'])
@pytest.mark.parametrize('ALGO', ['ppo', 'sac', 'safe_explorer_ppo'])
def test_rl(SYS, TASK, ALGO, monkeypatch):
    from rl_experiment import run
    SYS_NAME = 'quadrotor' if 'quadrotor' in SYS else SYS
    base = os.path.join(RL_DIR, 'config_overrides', SYS)
    monkeypatch.setattr(sys, 'argv', [
        'rl_experiment.py', '--algo', ALGO, '--task', SYS_NAME,
        '--overrides',
        os.path.join(base, f'{SYS}_{TASK}.yaml'),
        os.path.join(base, f'{ALGO}_{SYS}.yaml'),
        '--kv_overrides', 'algo_config.training=False'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10,
                         curr_path=RL_DIR)
    assert 'average_rmse' in metrics


@pytest.mark.parametrize('ALGO', ['ppo', 'sac'])
def test_rl_cartpole_train_and_eval(ALGO, monkeypatch, tmp_path):
    """train_rl.py produces a checkpoint rl_experiment.py can evaluate."""
    from rl_experiment import run
    from train_rl import run as train_run
    base = os.path.join(RL_DIR, 'config_overrides', 'cartpole')
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
