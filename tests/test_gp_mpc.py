"""GP-MPC: residual learning corrects a deliberately wrong prior."""

from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.registration import make

CFG = dict(seed=42, cost='quadratic', ctrl_freq=15, pyb_freq=750,
           episode_len_sec=6, randomized_init=False,
           init_state={'init_theta': 0.1},
           task_info={'stabilization_goal': [0.3],
                      'stabilization_goal_tolerance': 0.02},
           constraints=[{'constraint_form': 'default_constraint',
                         'constrained_variable': 'input'}])


@pytest.mark.parametrize('sparse', [False, True])
def test_gp_mpc_corrects_wrong_prior(sparse):
    env_func = partial(make, 'cartpole', **CFG)
    ctrl = make('gp_mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=15,
                prior_info={'prior_prop': {'pole_length': 1.0}},
                train_iterations=1, num_samples=60,
                optimization_iterations=120, sparse_gp=sparse,
                n_ind_points=25, seed=0)
    ctrl.reset()
    exp = BaseExperiment(env_func(), ctrl)
    _, m_before = exp.run_evaluation(n_episodes=1, verbose=False)
    ctrl.learn()
    exp2 = BaseExperiment(env_func(), ctrl)
    _, m_after = exp2.run_evaluation(n_episodes=1, verbose=False)
    # GP residual learning must improve the wrong-prior controller.
    assert m_after['average_rmse'] < m_before['average_rmse']
    exp.close()
    exp2.close()
