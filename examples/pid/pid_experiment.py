"""PID example on the 2D/3D quadrotor — parity with
examples/pid/pid_experiment.py."""

from collections import defaultdict
from functools import partial

import numpy as np

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make


def run(gui=False, plot=False, n_episodes=1, n_steps=None, save_data=False):
    """Main PID experiment (reference pid_experiment.py)."""
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    env_func = partial(make, config.task, **config.task_config)
    env = env_func(gui=gui)
    ctrl = make(config.algo, env_func, **config.algo_config)

    experiment = BaseExperiment(env=env, ctrl=ctrl)
    if n_steps is None:
        trajs_data, metrics = experiment.run_evaluation(n_episodes=n_episodes)
    else:
        trajs_data, metrics = experiment.run_evaluation(n_steps=n_steps)

    experiment.close()
    print('FINAL METRICS - ' + ', '.join(
        [f'{key}: {value}' for key, value in metrics.items()]))
    return dict(trajs_data), metrics


if __name__ == '__main__':
    run()
