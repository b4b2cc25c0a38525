"""MPSC terminal-set learning (qhull path) structural test."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import make

CFG = dict(seed=42, cost='quadratic', ctrl_freq=15, pyb_freq=750,
           episode_len_sec=6, randomized_init=False,
           init_state={'init_theta': 0.1},
           task_info={'stabilization_goal': [0.0],
                      'stabilization_goal_tolerance': 0.05},
           constraints=[
               {'constraint_form': 'default_constraint',
                'constrained_variable': 'state',
                'upper_bounds': [1.5, 2, 0.3, 2],
                'lower_bounds': [-1.5, -2, -0.3, -2]},
               {'constraint_form': 'default_constraint',
                'constrained_variable': 'input',
                'upper_bounds': [5], 'lower_bounds': [-5]}])


def test_mpsc_learned_terminal_set():
    env_func = partial(make, 'cartpole', **CFG)
    sf = make('linear_mpsc', env_func, horizon=10, q_lin=[1], r_lin=[1],
              integration_algo='rk4', n_samples=80,
              n_samples_terminal_set=10, tau=0.95, learn_terminal_set=True,
              seed=0)
    sf.learn()
    # A polytope was learned and converted to halfspaces.
    assert sf.terminal_set_verts is not None
    A, b = sf.terminal_set
    assert A.shape[1] == 4
    assert A.shape[0] == b.shape[0]
    # Certification still runs with the learned set.
    cert, success = sf.certify_action(
        np.array([0.0, 0.0, 0.05, 0.0], np.float32), np.array([0.1]), None)
    assert np.isfinite(np.atleast_1d(cert)).all()
    sf.close()


def test_gp_mpc_tightening_grows_with_horizon():
    env_func = partial(make, 'cartpole', **CFG)
    ctrl = make('gp_mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=10,
                prior_info={'prior_prop': {'pole_length': 1.0}},
                train_iterations=1, num_samples=50,
                optimization_iterations=80, seed=0)
    ctrl.reset()
    ctrl.learn()
    # Prime a previous solution so tightening can propagate covariance.
    env = env_func()
    obs, info = env.reset()
    ctrl.select_action(obs, info)
    ts, tu = ctrl._constraint_tightening(step=1)
    ts = np.asarray(ts)
    assert ts.shape[0] == 11
    # Chance-constraint margins are nonnegative and grow along the horizon
    # (covariance accumulates under the propagation).
    assert (ts >= 0).all()
    assert ts[10].max() >= ts[1].max()
    assert ts.max() > 0
    env.close()
    ctrl.close()
