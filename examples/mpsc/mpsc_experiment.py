"""MPSC example: uncertified vs certified comparison — parity with
examples/mpsc/mpsc_experiment.py:16-120."""

import os
from functools import partial

import numpy as np

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make

RL_ALGOS = ('ppo', 'sac', 'ddpg', 'safe_explorer_ppo')


def _labels(config):
    if config.task == 'quadrotor':
        system = ('quadrotor_3D'
                  if int(config.task_config.get('quad_type', 2)) >= 3
                  else 'quadrotor_2D')
    else:
        system = config.task
    task = ('track' if config.task_config.get('task') == 'traj_tracking'
            else 'stab')
    return system, task


def run(gui=False, plot=False, training=True, n_episodes=1, n_steps=None,
        curr_path='.'):
    """Run uncertified then certified evaluation and compare."""
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    system, task = _labels(config)
    # Per-algo config shaping (reference mpsc_experiment.py:30-37): RL
    # policies see the rl_reward/normalized env they were trained on;
    # model-based controllers get the quadratic-cost physical-action env.
    config.task_config['randomized_init'] = False
    if config.algo in RL_ALGOS:
        config.task_config['cost'] = 'rl_reward'
    else:
        config.task_config['cost'] = 'quadratic'
        config.task_config['normalized_rl_action_space'] = False
    env_func = partial(make, config.task, **config.task_config)
    env = env_func()

    # Uncertified controller; RL policies load the committed artifact and
    # run inference-only (reference mpsc_experiment.py:33,57-59).
    algo_config = dict(config.algo_config)
    if config.algo in RL_ALGOS:
        algo_config['training'] = False
    ctrl = make(config.algo, env_func, **algo_config)
    if config.algo in RL_ALGOS:
        model_path = os.path.join(
            curr_path, 'models',
            f'{config.algo}_model_{system}_{task}.pt')
        if os.path.exists(model_path):
            ctrl.load(model_path)

    # Safety filter always works in the physical-action quadratic frame
    # (reference mpsc_experiment.py:71-77).
    filter_task_config = dict(config.task_config)
    filter_task_config['normalized_rl_action_space'] = False
    filter_task_config['cost'] = 'quadratic'
    env_func_filter = partial(make, config.task, **filter_task_config)
    safety_filter = make(config.safety_filter, env_func_filter,
                         **config.sf_config)
    if training:
        safety_filter.learn()
    else:
        safety_filter.load(
            f'{curr_path}/models/{config.safety_filter}_{system}.pkl')

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
