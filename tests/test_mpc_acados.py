"""MPC_ACADOS (real-time iteration) behavioral semantics
(reference controllers/mpc/mpc_acados.py:164-228: use_RTI selects a single
warm-started SQP iteration per control step — the HPIPM SQP_RTI schedule —
versus the converged multi-iteration SQP mode).

These tests make the 1-SQP-iteration subclass carry measurable, tested
semantics: RTI does strictly less work per step, relies on the warm start,
and still tracks with bounded extra cost versus full SQP."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import make

CFG = dict(seed=0, cost='quadratic', ctrl_freq=15, pyb_freq=750,
           episode_len_sec=4, randomized_init=False,
           init_state={'init_theta': 0.12, 'init_x': -0.3},
           task_info={'stabilization_goal': [0.4],
                      'stabilization_goal_tolerance': 0.0},
           constraints=[{'constraint_form': 'default_constraint',
                         'constrained_variable': 'input'}],
           done_on_out_of_bound=False)


def _run(use_RTI, n_steps=40):
    env_func = partial(make, 'cartpole', **CFG)
    ctrl = make('mpc_acados', env_func, horizon=12, q_mpc=[5, 0.1, 5, 0.1],
                r_mpc=[0.1], use_RTI=use_RTI, seed=0)
    ctrl.reset()
    env = env_func()
    obs, info = env.reset()
    cost = 0.0
    for _ in range(n_steps):
        action = ctrl.select_action(obs, info)
        assert not ctrl.terminate_loop
        obs, _, _, info = env.step(action)
        cost += float(info['mse'])
    t_wall = np.asarray(ctrl.results_dict['t_wall'])
    ctrl.close()
    env.close()
    return cost, t_wall, ctrl


def test_rti_schedule_is_one_iteration():
    env_func = partial(make, 'cartpole', **CFG)
    rti = make('mpc_acados', env_func, q_mpc=[1], r_mpc=[0.1], use_RTI=True,
               seed=0)
    sqp = make('mpc_acados', env_func, q_mpc=[1], r_mpc=[0.1], use_RTI=False,
               seed=0)
    assert rti.sqp_iters == 1
    assert sqp.sqp_iters == 5
    assert rti.warmstart
    rti.close()
    sqp.close()


def test_rti_tracks_with_bounded_cost_vs_sqp():
    """RTI (1 warm-started iteration/step) must stabilize the same task
    with total MSE within 2x of converged SQP — the acados SQP_RTI
    trade (mpc_acados.py:164-175)."""
    cost_sqp, t_sqp, _ = _run(use_RTI=False)
    cost_rti, t_rti, _ = _run(use_RTI=True)
    assert np.isfinite(cost_rti) and np.isfinite(cost_sqp)
    assert cost_rti <= max(2.0 * cost_sqp, cost_sqp + 0.05), \
        (cost_rti, cost_sqp)
    # Steady-state per-step wall time: RTI does 1/5 the SQP work. Compare
    # medians of the post-warmup tail (first steps include compile).
    med_rti = float(np.median(t_rti[5:]))
    med_sqp = float(np.median(t_sqp[5:]))
    assert med_rti < med_sqp, (med_rti, med_sqp)


def test_linear_ls_cost_scaling():
    """acados LINEAR_LS semantics: the QP Hessian's stage blocks are
    Q/dt and R/dt while the terminal block stays the unscaled Q
    (W = blkdiag(Q/dt, R/dt), W_e = Q — mpc_acados.py:104-117)."""
    env_func = partial(make, 'cartpole', **CFG)
    ctrl = make('mpc_acados', env_func, horizon=4, q_mpc=[2, 1, 2, 1],
                r_mpc=[0.5], seed=0)
    ctrl.reset()
    nx, nu, T = ctrl.model.nx, ctrl.model.nu, ctrl.T
    P_qp = np.asarray(ctrl._P_qp)
    dt = ctrl.dt
    # Stage state blocks: Q/dt.
    for k in range(T):
        blk = P_qp[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx]
        np.testing.assert_allclose(blk, np.asarray(ctrl.Q) / dt, rtol=1e-5)
    # Terminal block: unscaled Q.
    term = P_qp[T * nx:(T + 1) * nx, T * nx:(T + 1) * nx]
    np.testing.assert_allclose(term, np.asarray(ctrl.Q), rtol=1e-5)
    # Input blocks: R/dt.
    ofs = (T + 1) * nx
    for k in range(T):
        blk = P_qp[ofs + k * nu:ofs + (k + 1) * nu,
                   ofs + k * nu:ofs + (k + 1) * nu]
        np.testing.assert_allclose(blk, np.asarray(ctrl.R) / dt, rtol=1e-5)
    ctrl.close()


def test_stage_scaling_changes_solution_vs_plain_mpc():
    """The 1/dt stage weighting must actually move the solution: with
    dt = 1/15 the stage cost dominates the terminal 15x more than in the
    plain parent MPC, so the first action differs measurably."""
    env_func = partial(make, 'cartpole', **CFG)
    acados = make('mpc_acados', env_func, horizon=10, q_mpc=[5, 0.1, 5, 0.1],
                  r_mpc=[0.1], use_RTI=False, seed=0)
    plain = make('mpc', env_func, horizon=10, q_mpc=[5, 0.1, 5, 0.1],
                 r_mpc=[0.1], sqp_iters=5, seed=0)
    acados.reset()
    plain.reset()
    env = env_func()
    obs, info = env.reset()
    a1 = acados.select_action(obs, info)
    a2 = plain.select_action(obs, info)
    assert np.all(np.isfinite(a1)) and np.all(np.isfinite(a2))
    assert float(np.max(np.abs(a1 - a2))) > 1e-3, (a1, a2)
    acados.close()
    plain.close()
    env.close()


def test_integrator_and_constraint_validation():
    """Only ERK integration and box constraints are accepted
    (mpc_acados.py:119-136, :166)."""
    import pytest
    env_func = partial(make, 'cartpole', **CFG)
    with pytest.raises(ValueError, match='ERK'):
        make('mpc_acados', env_func, integrator_type='IRK', seed=0)
    cfg_quad = dict(CFG)
    cfg_quad['constraints'] = [
        {'constraint_form': 'quadratic_constraint',
         'constrained_variable': 'state',
         'P': np.eye(4).tolist(), 'b': 1.0}]
    env_func_quad = partial(make, 'cartpole', **cfg_quad)
    with pytest.raises(ValueError, match='BoundedConstraint'):
        make('mpc_acados', env_func_quad, seed=0)
