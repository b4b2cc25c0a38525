"""Batched-certification demo runs and certifies a meaningful fraction."""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'examples'))


def test_batched_certification_demo(capsys, monkeypatch):
    path = os.path.join(os.path.dirname(__file__), '..', '..', 'examples',
                        'mpsc', 'batched_certification_demo.py')
    spec = importlib.util.spec_from_file_location('batchcert', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, 'argv', ['batched_certification_demo.py', '16'])
    mod.main()
    out = capsys.readouterr().out
    assert 'certifications' in out
    feasible = int(out.split('feasible')[0].strip().split()[-1].split('/')[0])
    assert feasible > 0
