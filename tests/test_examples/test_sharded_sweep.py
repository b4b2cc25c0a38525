"""Mesh-sharded sweep demo runs on the virtual CPU mesh."""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'examples'))


def test_sharded_sweep_demo(capsys, monkeypatch):
    path = os.path.join(os.path.dirname(__file__), '..', '..', 'examples',
                        'mpc', 'sharded_sweep_demo.py')
    spec = importlib.util.spec_from_file_location('shardsweep', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, 'argv', ['sharded_sweep_demo.py', 'cpu', '16'])
    mod.main()
    out = capsys.readouterr().out
    assert 'NMPC sweep' in out and 'certification sweep' in out
    nmpc_feasible = int(out.split('feasible')[0].strip().split()[-1]
                        .split('/')[0])
    assert nmpc_feasible == 16
