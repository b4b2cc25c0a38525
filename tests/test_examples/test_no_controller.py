"""Integration-via-examples: verbose API tour
(mirrors reference tests/test_examples/test_no_controller.py)."""

import os
import sys

from tests.test_examples.conftest import EXAMPLES_DIR

sys.path.insert(0, os.path.join(EXAMPLES_DIR, 'no_controller'))


def test_verbose_api(monkeypatch, capsys):
    from verbose_api import run
    base = os.path.join(EXAMPLES_DIR, 'no_controller', 'config_overrides')
    monkeypatch.setattr(sys, 'argv', [
        'verbose_api.py', '--task', 'cartpole', '--overrides',
        os.path.join(base, 'verbose_api_cartpole.yaml')])
    run()
    out = capsys.readouterr().out
    assert 'ANALYTIC' in out
    assert 'dfdx' in out
