"""Batched GP-MPC demo runs and solves all problems feasibly."""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'examples'))


def test_batched_gp_mpc_demo(capsys, monkeypatch):
    path = os.path.join(os.path.dirname(__file__), '..', '..', 'examples',
                        'mpc', 'batched_gp_mpc_demo.py')
    spec = importlib.util.spec_from_file_location('batchgpmpc', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, 'argv', ['batched_gp_mpc_demo.py', '8'])
    mod.main()
    out = capsys.readouterr().out
    assert 'GP-MPC solves' in out
    feasible = int(out.split('feasible')[0].strip().split()[-1].split('/')[0])
    assert feasible == 8
