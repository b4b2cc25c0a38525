"""Gradient-through-physics demo must reduce the rollout cost."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'examples'))


def test_differentiable_sim_reduces_cost():
    import importlib.util
    path = os.path.join(os.path.dirname(__file__), '..', '..', 'examples',
                        'differentiable_sim_demo.py')
    spec = importlib.util.spec_from_file_location('diffsim', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    c0, c = mod.main(T=40, iters=100)
    assert c < 0.9 * c0, (c0, c)
