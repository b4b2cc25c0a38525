"""Canonical RL training entry — parity with
experiments/train_rl_controller.py:16-75: ConfigFactory -> env_func partial
-> make(algo) -> ctrl.learn() -> dump config.yaml -> plot logs."""

from __future__ import annotations

import os
from functools import partial

import yaml

from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.plotting import plot_from_logs
from safe_control_gym_tpu.utils.registration import make
from safe_control_gym_tpu.utils.utils import (mkdirs, set_dir_from_config,
                                              set_seed_from_config,
                                              unmunchify)


def train():
    """Training template (train_rl_controller.py:16-75)."""
    fac = ConfigFactory()
    config = fac.merge()
    set_seed_from_config(config)
    set_dir_from_config(config)

    env_func = partial(make, config.task, output_dir=config.output_dir,
                       **config.task_config)
    ctrl = make(config.algo, env_func,
                checkpoint_path=os.path.join(config.output_dir,
                                             'model_latest.pt'),
                output_dir=config.output_dir, seed=config.seed,
                **config.algo_config)
    ctrl.reset()
    ctrl.learn()
    ctrl.save(os.path.join(config.output_dir, 'model_latest.pt'))

    with open(os.path.join(config.output_dir, 'config.yaml'), 'w') as f:
        yaml.dump(unmunchify(config), f, default_flow_style=False)

    # Post-training plots from the logged stats (train_rl_controller.py:59-70).
    try:
        plot_from_logs(config.output_dir,
                       os.path.join(config.output_dir, 'plots'))
    except Exception as e:
        print(f'[WARNING] plotting failed: {e}')
    ctrl.close()
    print(f'Training complete. Results in {config.output_dir}')
    return config.output_dir


if __name__ == '__main__':
    train()
