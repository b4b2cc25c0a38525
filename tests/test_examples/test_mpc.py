"""Integration-via-examples: MPC matrix
(mirrors reference tests/test_examples/test_mpc.py:8-21 cell-for-cell:
{cartpole, quadrotor_2D, quadrotor_3D} x {stab, track} x
{mpc, linear_mpc, mpc_acados} — all 18 committed override YAMLs
executed; behavioral RTI-mode tests live in tests/test_mpc_acados.py)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'mpc'))


@pytest.mark.parametrize('SYS', ['cartpole', 'quadrotor_2D', 'quadrotor_3D'])
@pytest.mark.parametrize('TASK', ['stab', 'track'])
@pytest.mark.parametrize('ALGO', ['mpc', 'linear_mpc', 'mpc_acados'])
def test_mpc(SYS, TASK, ALGO, monkeypatch):
    from mpc_experiment import run
    SYS_NAME = 'quadrotor' if 'quadrotor' in SYS else SYS
    base = os.path.join(EXAMPLES_DIR, 'mpc', 'config_overrides', SYS)
    monkeypatch.setattr(sys, 'argv', [
        'mpc_experiment.py', '--algo', ALGO, '--task', SYS_NAME,
        '--overrides',
        os.path.join(base, f'{SYS}_{TASK}.yaml'),
        os.path.join(base, f'{ALGO}_{SYS}_{TASK}.yaml'),
        '--kv_overrides', 'algo_config.horizon=10'])
    trajs, metrics = run(gui=False, plot=False, n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics
