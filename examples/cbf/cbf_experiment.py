"""CBF example — parity with examples/cbf/cbf_experiment.py: certify a
controller's actions with the CBF-QP safety filter on the cartpole."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make


def run(gui=False, plot=False, training=False, n_episodes=1, n_steps=None,
        curr_path='.'):
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    env_func = partial(make, config.task, **config.task_config)
    ctrl = make(config.algo, env_func, **config.algo_config)
    safety_filter = make(config.safety_filter, env_func, **config.sf_config)
    if training and hasattr(safety_filter, 'learn'):
        safety_filter.uncertified_controller = ctrl
        safety_filter.learn()

    experiment = BaseExperiment(env=env_func(), ctrl=ctrl,
                                safety_filter=safety_filter)
    trajs_data, metrics = experiment.run_evaluation(
        n_episodes=n_episodes, n_steps=n_steps, verbose=False)
    experiment.close()

    corrections = [np.asarray(c)
                   for c in trajs_data['safety_filter_data']['correction']]
    print('Constraint violations:',
          metrics['average_constraint_violation'])
    print('Mean correction:', float(np.mean(
        [np.mean(c) for c in corrections])))
    return dict(trajs_data), metrics


if __name__ == '__main__':
    run()
