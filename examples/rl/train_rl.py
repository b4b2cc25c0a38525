"""Train an RL controller and save its checkpoint — companion to
rl_experiment.py (the reference ships pretrained .pt files; this script
produces the equivalent artifacts)."""

import os
from functools import partial

from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make

from rl_experiment import system_name, task_name


def run(curr_path='.'):
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()
    env_func = partial(make, config.task, **config.task_config)
    ctrl = make(config.algo, env_func, seed=config.seed,
                output_dir=config.output_dir, **config.algo_config)
    ctrl.reset()
    ctrl.learn()
    model_dir = os.path.join(curr_path, 'models', config.algo)
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(
        model_dir,
        f'{config.algo}_model_{system_name(config)}_{task_name(config)}.pt')
    ctrl.save(path)
    print(f'Saved model to {path}')
    ctrl.close()
    return path


if __name__ == '__main__':
    run()
