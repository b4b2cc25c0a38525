"""Integration-via-examples: MPC matrix
(mirrors reference tests/test_examples/test_mpc.py)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'mpc'))


@pytest.mark.parametrize('ALGO', ['mpc', 'linear_mpc', 'mpc_acados'])
def test_mpc_cartpole(ALGO, monkeypatch):
    from mpc_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'mpc', 'config_overrides', 'cartpole')
    algo_yaml = os.path.join(base, f'{ALGO}_cartpole_stab.yaml')
    if not os.path.exists(algo_yaml):
        algo_yaml = os.path.join(base, 'mpc_cartpole_stab.yaml')
    monkeypatch.setattr(sys, 'argv', [
        'mpc_experiment.py', '--algo', ALGO, '--task', 'cartpole',
        '--overrides', os.path.join(base, 'cartpole_stab.yaml'), algo_yaml,
        '--kv_overrides', 'algo_config.horizon=10'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics


def test_mpc_quadrotor_2d(monkeypatch):
    from mpc_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'mpc', 'config_overrides',
                        'quadrotor_2D')
    monkeypatch.setattr(sys, 'argv', [
        'mpc_experiment.py', '--algo', 'mpc', '--task', 'quadrotor',
        '--overrides',
        os.path.join(base, 'quadrotor_2D_track.yaml'),
        os.path.join(base, 'mpc_quadrotor_2D_track.yaml'),
        '--kv_overrides', 'algo_config.horizon=10'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics
