"""LQR and iLQR example — parity with examples/lqr/lqr_experiment.py.

Run as:
    python lqr_experiment.py --algo lqr --task cartpole \
        --overrides config_overrides/cartpole/cartpole_stab.yaml \
                    config_overrides/cartpole/lqr_cartpole_stab.yaml
"""

import os
import pickle
from collections import defaultdict
from functools import partial

import numpy as np

from safe_control_gym_tpu.envs.benchmark_env import Task
from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make


def run(gui=False, plot=False, n_episodes=1, n_steps=None, save_data=False):
    """Main LQR/iLQR experiment (reference lqr_experiment.py:18-133)."""
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    env_func = partial(make, config.task, **config.task_config)
    random_env = env_func(gui=False)
    ctrl = make(config.algo, env_func, **config.algo_config)

    all_trajs = defaultdict(list)
    n_episodes = 1 if n_episodes is None else n_episodes

    for _ in range(n_episodes):
        init_state, _ = random_env.reset()
        init_state = np.asarray(init_state)[:random_env.state_dim]
        static_env = env_func(gui=gui, randomized_init=False,
                              init_state=init_state)
        static_train_env = env_func(gui=False, randomized_init=False,
                                    init_state=init_state)
        experiment = BaseExperiment(env=static_env, ctrl=ctrl,
                                    train_env=static_train_env)
        experiment.launch_training()
        if n_steps is None:
            trajs_data, _ = experiment.run_evaluation(training=True,
                                                      n_episodes=1)
        else:
            trajs_data, _ = experiment.run_evaluation(training=True,
                                                      n_steps=n_steps)
        if plot:
            post_analysis(trajs_data['obs'][0], trajs_data['action'][0],
                          ctrl.env)
        static_env.close()
        static_train_env.close()
        for key, value in trajs_data.items():
            all_trajs[key] += value

    ctrl.close()
    random_env.close()
    metrics = experiment.compute_metrics(all_trajs)
    all_trajs = dict(all_trajs)

    if save_data:
        results = {'trajs_data': all_trajs, 'metrics': metrics}
        path_dir = os.path.dirname('./temp-data/')
        os.makedirs(path_dir, exist_ok=True)
        with open(f'./temp-data/{config.algo}_data_{config.task}.pkl',
                  'wb') as file:
            pickle.dump(results, file)

    print('FINAL METRICS - ' + ', '.join(
        [f'{key}: {value}' for key, value in metrics.items()]))
    return all_trajs, metrics


def post_analysis(state_stack, input_stack, env):
    """Plot state/action trajectories (lqr_experiment.py:96-133)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    model = env.symbolic
    stepsize = model.dt
    plot_length = np.min([np.shape(input_stack)[0],
                          np.shape(state_stack)[0]])
    times = np.linspace(0, stepsize * plot_length, plot_length)
    reference = env.X_GOAL
    if env.TASK == Task.STABILIZATION:
        reference = np.tile(reference.reshape(1, model.nx), (plot_length, 1))
    fig, axs = plt.subplots(model.nx, figsize=(8, model.nx * 1.5))
    for k in range(model.nx):
        axs[k].plot(times, np.array(state_stack).T[k, 0:plot_length],
                    label='actual')
        axs[k].plot(times, reference.T[k, 0:plot_length], color='r',
                    label='desired')
        axs[k].set(ylabel=env.STATE_LABELS[k])
    axs[0].set_title('State Trajectories')
    axs[-1].legend()
    axs[-1].set(xlabel='time (sec)')
    fig.savefig('./lqr_states.png')
    plt.close(fig)


if __name__ == '__main__':
    run()
