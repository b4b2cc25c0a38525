"""Integration-via-examples: PID on 2D/3D quadrotor
(mirrors reference tests/test_examples/test_pid.py)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'pid'))


@pytest.mark.parametrize('SYS', ['quadrotor_2D', 'quadrotor_3D'])
def test_pid_quadrotor(SYS, monkeypatch):
    from pid_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'pid', 'config_overrides', SYS)
    monkeypatch.setattr(sys, 'argv', [
        'pid_experiment.py', '--algo', 'pid', '--task', 'quadrotor',
        '--overrides',
        os.path.join(base, f'{SYS}_track.yaml'),
        os.path.join(base, f'pid_{SYS}_track.yaml')])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics
