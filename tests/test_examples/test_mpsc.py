"""Integration-via-examples: MPSC certification
(mirrors reference tests/test_examples/test_mpsc.py; trains the RPI set
on-device instead of loading a committed pickle)."""

import os
import sys

import pytest

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'mpsc'))


@pytest.mark.parametrize('ALGO', ['lqr'])
def test_mpsc_cartpole(ALGO, monkeypatch):
    from mpsc_experiment import run
    base = os.path.join(EXAMPLES_DIR, 'mpsc', 'config_overrides', 'cartpole')
    monkeypatch.setattr(sys, 'argv', [
        'mpsc_experiment.py', '--algo', ALGO, '--task', 'cartpole',
        '--safety_filter', 'linear_mpsc', '--overrides',
        os.path.join(base, 'cartpole_stab.yaml'),
        os.path.join(base, f'{ALGO}_cartpole_stab.yaml'),
        os.path.join(base, 'linear_mpsc_cartpole_stab.yaml'),
        '--kv_overrides', 'sf_config.n_samples=60'])
    uncert_metrics, cert_metrics = run(gui=False, plot=False, training=True,
                                       n_episodes=1)
    assert cert_metrics['average_constraint_violation'] == 0
