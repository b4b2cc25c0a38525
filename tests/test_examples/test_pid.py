"""Integration-via-examples: PID on 2D/3D quadrotor
(mirrors reference tests/test_examples/test_pid.py:8-28 cell-for-cell:
{quadrotor_2D, quadrotor_3D} x {stab, track} + the custom
waypoint-trajectory tracking mode)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'pid'))


@pytest.mark.parametrize('SYS', ['quadrotor_2D', 'quadrotor_3D'])
@pytest.mark.parametrize('TASK', ['stab', 'track'])
def test_pid_quadrotor(SYS, TASK, monkeypatch):
    from pid_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'pid', 'config_overrides', SYS)
    monkeypatch.setattr(sys, 'argv', [
        'pid_experiment.py', '--algo', 'pid', '--task', 'quadrotor',
        '--overrides',
        os.path.join(base, f'{SYS}_{TASK}.yaml'),
        os.path.join(base, f'pid_{SYS}_{TASK}.yaml')])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics


def test_3D_pid_custom_trajectory_tracking(monkeypatch):
    """Custom waypoint-polyfit reference (reference
    test_pid.py:19-28 / pid_experiment.py:29-49)."""
    from pid_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'pid', 'config_overrides',
                        'quadrotor_3D')
    monkeypatch.setattr(sys, 'argv', [
        'pid_experiment.py', '--algo', 'pid', '--task', 'quadrotor',
        '--overrides',
        os.path.join(base, 'quadrotor_3D_track.yaml'),
        os.path.join(base, 'pid_quadrotor_3D_track.yaml'),
        '--kv_overrides',
        'task_config.task_info.trajectory_type=custom'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics
