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
    """The GP residual must repair the wrong-pole-length prior's one-step
    predictions by a wide margin (measured ~12x at head), and the learned
    controller must run a full closed-loop evaluation. One-step accuracy
    is the robust assertion: closed-loop RMSE of the (failing) wrong-prior
    controller is chaotic — sub-percent f32 jitter from XLA thread
    partitioning flips an after-vs-before comparison run to run."""
    env_func = partial(make, 'cartpole', **CFG)
    ctrl = make('gp_mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=15,
                prior_info={'prior_prop': {'pole_length': 1.0}},
                train_iterations=1, num_samples=60,
                optimization_iterations=120, sparse_gp=sparse,
                n_ind_points=40, seed=0)
    ctrl.reset()

    env = env_func()
    env.reset()
    rng = np.random.default_rng(3)
    xs = rng.uniform(-0.5, 0.5, (30, 4)).astype(np.float32)
    us = rng.uniform(-3, 3, (30, 1)).astype(np.float32)

    def pred_err(dyn):
        errs = []
        for x, u in zip(xs, us):
            env.reset()
            env.set_state(x)
            xn, *_ = env.step(u)
            errs.append(np.linalg.norm(np.asarray(dyn(x, u)) - xn[:4]))
        return float(np.mean(errs))

    def prior_dyn(x, u):
        return (ctrl.X_EQ + ctrl.Ad @ (x - ctrl.X_EQ)
                + ctrl.Bd @ (u - ctrl.U_EQ))

    e_prior = pred_err(prior_dyn)
    ctrl.learn()
    e_gp = pred_err(lambda x, u: np.asarray(ctrl.dynamics_func(x, u)))
    assert e_gp < e_prior / 3.0, (e_prior, e_gp)

    exp = BaseExperiment(env_func(), ctrl)
    _, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
    assert np.isfinite(metrics['average_rmse'])
    exp.close()
    env.close()


QCFG = dict(seed=42, cost='quadratic', quad_type=2, ctrl_freq=30,
            pyb_freq=240, episode_len_sec=2, randomized_init=False,
            init_state={'init_x': 0.3, 'init_x_dot': 0, 'init_z': 1.0,
                        'init_z_dot': 0, 'init_theta': 0,
                        'init_theta_dot': 0},
            task='stabilization',
            task_info={'stabilization_goal': [0, 1],
                       'stabilization_goal_tolerance': 0.005},
            done_on_out_of_bound=False,
            constraints=[{'constraint_form': 'default_constraint',
                          'constrained_variable': 'input'}])


def test_gp_mpc_quadrotor_2d_corrects_wrong_prior():
    """GP-MPC generalizes past cartpole: on the 6-state planar quadrotor a
    +30% wrong prior mass is repaired by the residual GP (one-step), and
    the learned controller completes a closed-loop evaluation.
    Reference role: gp_mpc.py supports any env exposing a symbolic prior
    (gp_mpc.py:264-286 residual targets are env-agnostic)."""
    env_func = partial(make, 'quadrotor', **QCFG)
    ctrl = make('gp_mpc', env_func, q_mpc=[5, 0.1, 5, 0.1, 0.1, 0.1],
                r_mpc=[0.1, 0.1], horizon=10,
                prior_info={'prior_prop': {'M': 0.035}},
                train_iterations=1, num_samples=60,
                optimization_iterations=120, sparse_gp=False, seed=0)
    ctrl.reset()

    env = env_func()
    env.reset()
    rng = np.random.default_rng(3)
    hover = np.array([0.0, 0.0, 1.0, 0.0, 0.0, 0.0], np.float32)
    xs = (hover + rng.uniform(-0.2, 0.2, (20, 6))).astype(np.float32)
    us = (np.asarray(ctrl.U_EQ)
          + rng.uniform(-0.02, 0.02, (20, 2))).astype(np.float32)

    def pred_err(dyn):
        errs = []
        for x, u in zip(xs, us):
            env.reset()
            env.set_state(x)
            xn, *_ = env.step(u)
            errs.append(np.linalg.norm(np.asarray(dyn(x, u)) - xn[:6]))
        return float(np.mean(errs))

    def prior_dyn(x, u):
        return (ctrl.X_EQ + ctrl.Ad @ (x - ctrl.X_EQ)
                + ctrl.Bd @ (u - ctrl.U_EQ))

    e_prior = pred_err(prior_dyn)
    ctrl.learn()
    e_gp = pred_err(lambda x, u: np.asarray(ctrl.dynamics_func(x, u)))
    assert e_gp < e_prior / 2.0, (e_prior, e_gp)

    exp = BaseExperiment(env_func(), ctrl)
    _, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
    assert np.isfinite(metrics['average_rmse'])
    exp.close()
    env.close()
