"""PID example on the 2D/3D quadrotor — parity with
examples/pid/pid_experiment.py (incl. the custom waypoint-trajectory mode,
reference pid_experiment.py:29-49)."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make


def _custom_waypoint_reference(config, nx):
    """Polynomial fit through fixed 3D waypoints (reference
    pid_experiment.py:49-66): degree-6 polyfit per axis, sampled at
    episode_len_sec*ctrl_freq + 2 points, written into the x/y/z state
    columns."""
    iterations = int(config.task_config['episode_len_sec']
                     * config.task_config['ctrl_freq']) + 2
    waypoints = np.array([(0, 0, 0), (0.2, 0.5, 0.5), (0.5, 0.1, 0.6),
                          (1, 1, 1), (1.3, 1, 1.2)])
    t = np.arange(waypoints.shape[0])
    t_scaled = np.linspace(t[0], t[-1], iterations)
    x_goal = np.zeros((iterations, nx))
    for col, axis in zip((0, 2, 4), range(3)):
        fit = np.poly1d(np.polyfit(t, waypoints[:, axis], deg=6))
        x_goal[:, col] = fit(t_scaled)
    return x_goal


def run(gui=False, plot=False, n_episodes=1, n_steps=None, save_data=False):
    """Main PID experiment (reference pid_experiment.py)."""
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    custom_trajectory = (
        config.task_config['task'] == 'traj_tracking'
        and config.task_config['task_info']['trajectory_type'] == 'custom')
    if custom_trajectory:
        # Placeholder type; the reference swaps in 'circle' then overwrites
        # X_GOAL with the waypoint fit (pid_experiment.py:29-34).
        config.task_config['task_info']['trajectory_type'] = 'circle'
        config.task_config['randomized_init'] = False
        config.task_config['init_state'] = np.zeros(12)

    env_func = partial(make, config.task, **config.task_config)
    env = env_func(gui=gui)
    ctrl = make(config.algo, env_func, **config.algo_config)

    if custom_trajectory:
        x_goal = _custom_waypoint_reference(config, env.symbolic.nx)
        env.set_reference(x_goal)
        ctrl.reference = x_goal

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
