"""Integration-via-examples: LQR/iLQR matrix
(mirrors reference tests/test_examples/test_lqr.py:8-21 cell-for-cell:
{cartpole, quadrotor_2D, quadrotor_3D} x {stab, track} x {lqr, ilqr},
each cell runs a 10-step episode through the example entry point with the
committed task-specific algo override yaml)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'lqr'))


@pytest.mark.parametrize('SYS', ['cartpole', 'quadrotor_2D', 'quadrotor_3D'])
@pytest.mark.parametrize('TASK', ['stab', 'track'])
@pytest.mark.parametrize('ALGO', ['lqr', 'ilqr'])
def test_lqr(SYS, TASK, ALGO, monkeypatch):
    from lqr_experiment import run
    SYS_NAME = 'quadrotor' if 'quadrotor' in SYS else SYS
    base = os.path.join(EXAMPLES_DIR, 'lqr', 'config_overrides', SYS)
    monkeypatch.setattr(sys, 'argv', [
        'lqr_experiment.py', '--algo', ALGO, '--task', SYS_NAME,
        '--overrides',
        os.path.join(base, f'{SYS}_{TASK}.yaml'),
        os.path.join(base, f'{ALGO}_{SYS}_{TASK}.yaml'),
        '--kv_overrides', 'algo_config.max_iterations=2'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics
