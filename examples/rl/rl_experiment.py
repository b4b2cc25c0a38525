"""RL evaluation example — parity with examples/rl/rl_experiment.py:
loads a trained policy checkpoint and evaluates it (the reference loads
committed pretrained .pt models, rl_experiment.py:46-60; here checkpoints
are produced by train_rl.py / experiments/train_rl_controller.py)."""

import os
from functools import partial

import numpy as np

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make


def system_name(config):
    """Artifact system label: quadrotor splits into 2D/3D by quad_type."""
    if config.task == 'quadrotor':
        return ('quadrotor_3D'
                if int(config.task_config.get('quad_type', 2)) >= 3
                else 'quadrotor_2D')
    return config.task


def task_name(config):
    return ('track' if config.task_config.get('task') == 'traj_tracking'
            else 'stab')


def run(gui=False, plot=False, n_episodes=1, n_steps=None,
        curr_path='.', save_data=False):
    """Main RL eval experiment (reference rl_experiment.py:17-100)."""
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    task_config = dict(config.task_config)
    env_func = partial(make, config.task, **task_config)
    algo_config = dict(config.algo_config)
    algo_config['training'] = False
    ctrl = make(config.algo, env_func, **algo_config)

    # Load the committed artifact for this (algo, system, task) cell —
    # reference naming: examples/rl/models/<algo>/<algo>_model_<system>_<task>.pt
    # (rl_experiment.py:53).
    model_path = os.path.join(curr_path, 'models', config.algo,
                              f'{config.algo}_model'
                              f'_{system_name(config)}_{task_name(config)}.pt')
    if os.path.exists(model_path):
        ctrl.load(model_path)
    env = env_func(gui=gui)
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
