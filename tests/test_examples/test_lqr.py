"""Integration-via-examples: LQR/iLQR matrix
(mirrors reference tests/test_examples/test_lqr.py:8-21)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'lqr'))


@pytest.mark.parametrize('SYS', ['cartpole'])
@pytest.mark.parametrize('TASK', ['stab', 'track'])
@pytest.mark.parametrize('ALGO', ['lqr', 'ilqr'])
def test_lqr_cartpole(SYS, TASK, ALGO, monkeypatch):
    from lqr_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'lqr', 'config_overrides', SYS)
    task_yaml = os.path.join(base, f'{SYS}_{TASK}.yaml')
    algo_yaml = os.path.join(base, f'{ALGO}_{SYS}_stab.yaml')
    if not os.path.exists(algo_yaml):
        algo_yaml = os.path.join(base, f'lqr_{SYS}_stab.yaml')
    monkeypatch.setattr(sys, 'argv', [
        'lqr_experiment.py', '--algo', ALGO, '--task', SYS, '--overrides',
        task_yaml, algo_yaml,
        '--kv_overrides', 'algo_config.max_iterations=2'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics


@pytest.mark.parametrize('ALGO', ['lqr', 'ilqr'])
def test_lqr_quadrotor_2d(ALGO, monkeypatch):
    from lqr_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'lqr', 'config_overrides',
                        'quadrotor_2D')
    monkeypatch.setattr(sys, 'argv', [
        'lqr_experiment.py', '--algo', ALGO, '--task', 'quadrotor',
        '--overrides',
        os.path.join(base, 'quadrotor_2D_track.yaml'),
        os.path.join(base, f'{ALGO}_quadrotor_2D_track.yaml'),
        '--kv_overrides', 'algo_config.max_iterations=2'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics
