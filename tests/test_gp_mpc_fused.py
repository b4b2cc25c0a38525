"""Fused GP-MPC dispatch: chance-constraint tightening + SQP in ONE jitted
program.

The reference computes the tightening host-side per step
(precompute_probabilistic_limits, gp_mpc.py:288-362) and then calls IPOPT;
round 2 of this rebuild mirrored that split (numpy loop over T + device GP
variance query + separate solve dispatch). These tests pin the round-3
fusion: the in-jit tightening must equal the host reference loop exactly,
and the fused solve must return the same action as the split path.
"""

from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import make

CFG = dict(seed=42, cost='quadratic', ctrl_freq=10, pyb_freq=500,
           episode_len_sec=2, randomized_init=False,
           init_state={'init_theta': 0.1},
           task_info={'stabilization_goal': [0.3],
                      'stabilization_goal_tolerance': 0.02},
           constraints=[{'constraint_form': 'default_constraint',
                         'constrained_variable': 'input'},
                        {'constraint_form': 'default_constraint',
                         'constrained_variable': 'state'}])


@pytest.fixture(scope='module')
def trained_ctrl():
    # 60 samples / 120 Adam iters: enough that GP variance stays moderate
    # (28 tightening-cap binds, not ~80) — under-trained GPs drive the
    # tightened QPs near-degenerate and f32 noise amplifies to % level in
    # the batch-vs-sequential comparison.
    env_func = partial(make, 'cartpole', **CFG)
    ctrl = make('gp_mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=10,
                prior_info={'prior_prop': {'pole_length': 1.0}},
                num_samples=60, optimization_iterations=120, seed=0)
    ctrl.reset()
    ctrl.learn()
    # Two closed-loop steps so x_prev/u_prev (the tightening inputs) exist.
    env = env_func()
    obs, info = env.reset()
    ctrl.setup_results_dict()
    a = ctrl.select_action(obs, info)
    obs, _, _, info = env.step(a)
    ctrl.select_action(obs, info)
    env.close()
    return ctrl, np.asarray(obs)


def test_fused_program_active(trained_ctrl):
    ctrl, _ = trained_ctrl
    assert ctrl._gp_trained
    assert ctrl._fused_jit is not None
    assert ctrl._tighten_jit is not None


def test_in_jit_tightening_matches_host_loop(trained_ctrl):
    """The lax.scan tightening == the host numpy-loop reference
    (gp_mpc.py:288-362 structure) on the live previous trajectory."""
    ctrl, _ = trained_ctrl
    nx, nu, T = ctrl.model.nx, ctrl.model.nu, ctrl.T
    host_s, host_u = ctrl._constraint_tightening(step=0)
    x_prev_T = jnp.asarray(np.asarray(ctrl.x_prev).T, jnp.float32)
    u_prev_T = jnp.asarray(
        np.atleast_2d(ctrl.u_prev).reshape(nu, T).T, jnp.float32)
    f_s, f_u, n_binds = ctrl._tighten_jit(
        x_prev_T, u_prev_T, ctrl._tighten_params, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(host_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_u), np.asarray(host_u),
                               rtol=1e-4, atol=1e-5)
    assert int(n_binds) == int(ctrl._last_cap_binds)
    # Tightening must be non-trivial for this test to mean anything.
    assert float(np.max(np.asarray(f_s))) > 0


def test_no_prev_trajectory_zero_tightening(trained_ctrl):
    ctrl, _ = trained_ctrl
    nx, nu, T = ctrl.model.nx, ctrl.model.nu, ctrl.T
    f_s, f_u, n_binds = ctrl._tighten_jit(
        jnp.zeros((T + 1, nx), jnp.float32), jnp.zeros((T, nu), jnp.float32),
        ctrl._tighten_params, jnp.float32(0.0))
    assert float(np.max(np.abs(np.asarray(f_s)))) == 0.0
    assert float(np.max(np.abs(np.asarray(f_u)))) == 0.0
    assert int(n_binds) == 0


def test_fused_action_matches_split_path(trained_ctrl):
    """One-dispatch fused solve == host-tightening + separate solve."""
    ctrl, obs = trained_ctrl
    nx, nu, T = ctrl.model.nx, ctrl.model.nu, ctrl.T
    goal = ctrl.get_references(0)
    obs_j = jnp.asarray(obs[:nx], jnp.float32)
    goal_j = jnp.asarray(goal.T, jnp.float32)
    X0 = jnp.tile(obs_j, (T + 1, 1))
    U0 = jnp.tile(jnp.asarray(ctrl.U_EQ, jnp.float32), (T, 1))
    z0 = jnp.zeros((ctrl._n_z,), jnp.float32)
    y0 = jnp.zeros((ctrl._m_rows,), jnp.float32)
    X1, U1, *_ = ctrl._dispatch_solve(obs_j, goal_j, X0, U0, z0, y0, 0)
    fused = ctrl._fused_jit
    try:
        ctrl._fused_jit = None  # forces the split host path
        X2, U2, *_ = ctrl._dispatch_solve(obs_j, goal_j, X0, U0, z0, y0, 0)
    finally:
        ctrl._fused_jit = fused
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2),
                               rtol=1e-3, atol=1e-4)


def test_batched_matches_sequential(trained_ctrl):
    """select_action_batch == the same per-problem program run one-by-one."""
    ctrl, _ = trained_ctrl
    nx, nu, T = ctrl.model.nx, ctrl.model.nu, ctrl.T
    rng = np.random.default_rng(3)
    x0s = rng.uniform(-0.15, 0.15, (4, nx)).astype(np.float32)
    u_batch, feas, binds = ctrl.select_action_batch(x0s, passes=2)
    assert u_batch.shape == (4, nu)
    assert feas.all()
    goal_j = jnp.asarray(ctrl.get_references(0).T, jnp.float32)
    for i in range(4):
        x0 = jnp.asarray(x0s[i])
        X0 = jnp.tile(x0, (T + 1, 1))
        U0 = jnp.tile(jnp.asarray(ctrl.U_EQ, jnp.float32), (T, 1))
        z0 = jnp.zeros((ctrl._n_z,), jnp.float32)
        y0 = jnp.zeros((ctrl._m_rows,), jnp.float32)
        ts = jnp.zeros((T + 1, ctrl._ms), jnp.float32)
        tu = jnp.zeros((T, ctrl._mu), jnp.float32)
        X, U, z, y, res = ctrl._solve_raw(x0, goal_j, X0, U0, z0, y0,
                                          ts, tu, ctrl.dynamics_params)
        ts, tu, _ = ctrl._tighten_raw(X, U, ctrl._tighten_params,
                                      jnp.float32(1.0))
        X, U, z, y, res = ctrl._solve_raw(x0, goal_j, X, U, z, y,
                                          ts, tu, ctrl.dynamics_params)
        np.testing.assert_allclose(u_batch[i], np.asarray(U[0]),
                                   rtol=1e-3, atol=1e-4)


def test_cap_binds_recorded(trained_ctrl):
    ctrl, _ = trained_ctrl
    binds = ctrl.results_dict.get('tightening_cap_binds')
    assert binds is not None and len(binds) == 2
    assert all(isinstance(b, int) and b >= 0 for b in binds)
