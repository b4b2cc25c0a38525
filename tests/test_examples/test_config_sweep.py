"""Every example config pair must load and construct (reference §2.8 parity:
config-override YAML trees per system x task x algo)."""

import glob
import os
import re
from functools import partial

import pytest
import yaml

from safe_control_gym_tpu.utils.registration import get_config, make

EXAMPLES = os.path.join(os.path.dirname(__file__), '..', '..', 'examples')


def _pairs():
    """Yield (task_yaml, algo_yaml) pairs from the config_overrides trees."""
    pairs = []
    for task_path in glob.glob(
            os.path.join(EXAMPLES, '*', 'config_overrides', '*', '*.yaml')):
        name = os.path.basename(task_path)
        m = re.fullmatch(r'(cartpole|quadrotor_2D|quadrotor_3D)_'
                         r'(stab|track)\.yaml', name)
        if not m:
            continue
        stem = name[:-len('.yaml')]
        for algo_path in glob.glob(
                os.path.join(os.path.dirname(task_path), f'*_{stem}.yaml')):
            if os.path.basename(algo_path) == name:
                continue
            pairs.append((task_path, algo_path))
    return sorted(pairs)


PAIRS = _pairs()
assert len(PAIRS) >= 30, f'expected a wide sweep, got {len(PAIRS)}'


@pytest.mark.parametrize(
    'task_path,algo_path',
    PAIRS,
    ids=[f'{p[0].split(os.sep)[-4]}:{os.path.basename(p[1])[:-5]}'
         for p in PAIRS])
def test_config_pair_constructs(task_path, algo_path):
    with open(task_path) as f:
        task_cfg = yaml.safe_load(f)['task_config']
    with open(algo_path) as f:
        spec = yaml.safe_load(f)
    system = ('cartpole' if 'cartpole' in os.path.basename(task_path)
              else 'quadrotor')
    env_func = partial(make, system, **task_cfg)
    # Env constructs and resets under this task config.
    env = env_func()
    env.reset()
    env.close()
    if 'algo' in spec:
        name, cfg_key = spec['algo'], 'algo_config'
    else:
        name, cfg_key = spec['safety_filter'], 'sf_config'
    cfg = get_config(name)
    cfg.update(spec.get(cfg_key) or {})
    cfg.pop('training', None)
    ctrl = make(name, env_func, output_dir='/tmp/sweep', **cfg)
    assert ctrl is not None
    if hasattr(ctrl, 'close'):
        ctrl.close()
