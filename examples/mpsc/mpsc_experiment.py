"""MPSC example: uncertified vs certified comparison — parity with
examples/mpsc/mpsc_experiment.py:64-200."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make


def run(gui=False, plot=False, training=True, n_episodes=1, n_steps=None,
        curr_path='.'):
    """Run uncertified then certified evaluation and compare."""
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    env_func = partial(make, config.task, **config.task_config)
    env = env_func()

    # Uncertified controller.
    ctrl = make(config.algo, env_func, **config.algo_config)

    # Safety filter.
    safety_filter = make(config.safety_filter, env_func, **config.sf_config)
    if training:
        safety_filter.learn()
    else:
        safety_filter.load(f'{curr_path}/models/mpsc_{config.task}.pkl')

    # Uncertified run.
    experiment = BaseExperiment(env=env_func(), ctrl=ctrl)
    uncert_data, uncert_metrics = experiment.run_evaluation(
        n_episodes=n_episodes, n_steps=n_steps, verbose=False)
    experiment.close()
    ctrl.reset()

    # Certified run.
    experiment = BaseExperiment(env=env_func(), ctrl=ctrl,
                                safety_filter=safety_filter)
    cert_data, cert_metrics = experiment.run_evaluation(
        n_episodes=n_episodes, n_steps=n_steps, verbose=False)
    experiment.close()

    corrections = [np.asarray(c)
                   for c in cert_data['safety_filter_data']['correction']]
    print('Uncertified violations:',
          uncert_metrics['average_constraint_violation'])
    print('Certified violations:',
          cert_metrics['average_constraint_violation'])
    print('Mean correction:', float(np.mean(
        [np.mean(c) for c in corrections])))
    return uncert_metrics, cert_metrics


if __name__ == '__main__':
    run()
