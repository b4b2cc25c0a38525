"""Integration-via-examples: CBF certification
(mirrors reference tests/test_examples/test_cbf.py)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'cbf'))


def test_cbf_cartpole(monkeypatch):
    from cbf_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'cbf', 'config_overrides', 'cartpole')
    monkeypatch.setattr(sys, 'argv', [
        'cbf_experiment.py', '--algo', 'lqr', '--task', 'cartpole',
        '--safety_filter', 'cbf', '--overrides',
        os.path.join(base, 'cartpole_stab.yaml'),
        os.path.join(base, 'lqr_cartpole_stab.yaml'),
        os.path.join(base, 'cbf_cartpole_stab.yaml')])
    trajs, metrics = run(gui=False, plot=False, training=False,
                         n_episodes=None, n_steps=10)
    assert 'average_rmse' in metrics
