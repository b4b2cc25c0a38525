"""MPC family tests: QP solver correctness + closed-loop control."""

from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.ops.qp import admm_qp
from safe_control_gym_tpu.utils.registration import make


def test_admm_qp_analytic():
    # min 0.5 x'x - x1 s.t. x1+x2=1, x >= 0.2 -> x = [0.8, 0.2].
    P = jnp.eye(2)
    q = jnp.array([-1.0, 0.0])
    A = jnp.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = jnp.array([1.0, 0.2, 0.2])
    u = jnp.array([1.0, jnp.inf, jnp.inf])
    sol = admm_qp(P, q, A, l, u, iters=400)
    assert np.allclose(np.asarray(sol.x), [0.8, 0.2], atol=1e-4)
    assert float(sol.prim_res) < 1e-5


def test_admm_qp_unconstrained_matches_solve():
    rng = np.random.default_rng(0)
    n = 8
    M = rng.standard_normal((n, n))
    P = M @ M.T + np.eye(n)
    q = rng.standard_normal(n)
    A = np.zeros((1, n))
    sol = admm_qp(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                  jnp.asarray(A, jnp.float32), jnp.array([-np.inf]),
                  jnp.array([np.inf]), iters=400)
    x_ref = np.linalg.solve(P, -q)
    assert np.allclose(np.asarray(sol.x), x_ref, atol=1e-3)


def test_admm_qp_polish_accuracy():
    """OSQP-style polish: on an ill-conditioned QP a short ADMM run exits
    feasible-but-suboptimal; the active-set KKT polish must recover the
    exact optimum (the failure mode observed on horizon-20 tube QPs where
    30k unpolished iterations were needed for an accurate action)."""
    rng = np.random.default_rng(1)
    n, m = 40, 60
    M = rng.standard_normal((n, n))
    # Condition number ~1e4 via scaled spectrum.
    U, _, Vt = np.linalg.svd(M)
    P = (U * np.geomspace(1.0, 1e-4, n)) @ U.T
    q = rng.standard_normal(n)
    A = np.vstack([np.eye(n), rng.standard_normal((m - n, n))])
    l = np.concatenate([np.full(n, -1.0), np.full(m - n, -5.0)])
    u = np.concatenate([np.full(n, 1.0), np.full(m - n, 5.0)])
    args = [jnp.asarray(v, jnp.float32) for v in (P, q, A, l, u)]
    rough = admm_qp(*args, iters=300, tol=1e-3)
    polished = admm_qp(*args, iters=300, tol=1e-3, polish=True)
    # Reference solution: very long ADMM run.
    ref = admm_qp(*args, iters=200000, tol=1e-9)
    x_ref = np.asarray(ref.x)
    err_rough = np.abs(np.asarray(rough.x) - x_ref).max()
    err_pol = np.abs(np.asarray(polished.x) - x_ref).max()
    assert float(polished.dual_res) <= float(rough.dual_res)
    assert err_pol < 1e-3, f'polish err {err_pol} (rough {err_rough})'
    assert err_pol <= err_rough + 1e-6


CARTPOLE_STAB = dict(
    seed=42, cost='quadratic', ctrl_freq=15, pyb_freq=750, episode_len_sec=6,
    constraints=[{'constraint_form': 'default_constraint',
                  'constrained_variable': 'input'}],
    task_info={'stabilization_goal': [0.5],
               'stabilization_goal_tolerance': 0.01},
    init_state={'init_theta': 0.15}, randomized_init=False)


@pytest.mark.parametrize('algo,kwargs', [
    ('mpc', dict(sqp_iters=3)),
    ('linear_mpc', dict()),
    ('mpc_acados', dict(use_RTI=True)),
])
def test_mpc_cartpole_stabilization(algo, kwargs):
    env_func = partial(make, 'cartpole', **CARTPOLE_STAB)
    ctrl = make(algo, env_func, q_mpc=[1], r_mpc=[0.1], horizon=20, **kwargs)
    exp = BaseExperiment(env_func(), ctrl)
    data, m = exp.run_evaluation(n_episodes=1, verbose=False)
    # Reaches the goal well before the time limit.
    assert m['average_length'] < 90
    final = data['state'][0][-1]
    assert abs(final[0] - 0.5) < 0.02
    # Input constraint (|u| <= 10) respected in execution.
    u = np.abs(np.concatenate(data['current_clipped_action']))
    assert u.max() <= 10.0 + 1e-5
    exp.close()


def test_mpc_respects_tight_input_constraint():
    cfg = dict(CARTPOLE_STAB)
    cfg['constraints'] = [{'constraint_form': 'bounded_constraint',
                           'constrained_variable': 'input',
                           'lower_bounds': [-3.0], 'upper_bounds': [3.0]}]
    env_func = partial(make, 'cartpole', **cfg)
    ctrl = make('mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=20,
                sqp_iters=3)
    exp = BaseExperiment(env_func(), ctrl)
    data, m = exp.run_evaluation(n_episodes=1, verbose=False)
    # Commanded actions stay within the MPC-visible bound.
    for a in data['action']:
        assert np.abs(a).max() <= 3.0 + 1e-2
    exp.close()


def test_linear_mpc_quadrotor_tracking():
    env_func = partial(
        make, 'quadrotor', seed=42, quad_type=2, task='traj_tracking',
        cost='quadratic', ctrl_freq=50, pyb_freq=1000, episode_len_sec=4,
        randomized_init=False, init_state={'init_z': 0.5},
        task_info={'trajectory_type': 'circle', 'num_cycles': 1,
                   'trajectory_plane': 'zx',
                   'trajectory_position_offset': [0.5, 0],
                   'trajectory_scale': -0.5})
    ctrl = make('linear_mpc', env_func, q_mpc=[5, 0.1, 5, 0.1, 0.1, 0.1],
                r_mpc=[0.1], horizon=25)
    exp = BaseExperiment(env_func(), ctrl)
    data, m = exp.run_evaluation(n_episodes=1, verbose=False)
    assert m['average_rmse'] < 0.2
    assert m['average_length'] == 200
    exp.close()


def test_mpc_results_dict_contains_horizons():
    env_func = partial(make, 'cartpole', **CARTPOLE_STAB)
    ctrl = make('mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=10,
                sqp_iters=2)
    ctrl.reset()
    env = env_func()
    obs, info = env.reset()
    action = ctrl.select_action(obs, info)
    assert len(ctrl.results_dict['horizon_states']) == 1
    assert ctrl.results_dict['horizon_states'][0].shape == (4, 11)
    assert len(ctrl.results_dict['goal_states']) == 1
    env.close()
    ctrl.close()
