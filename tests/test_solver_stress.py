"""Solver-robustness stress suite: drives the SQP+ADMM stack into the
regimes where the reference leans on IPOPT/qpOASES (long horizons, active
constraints at the optimum, infeasible starts, the fallback ladder —
reference mpc.py:298-316 and mpc.yaml:2's T=50 default)."""

from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import make


def _cfg(goal, bounds):
    return dict(seed=0, cost='quadratic', ctrl_freq=15, pyb_freq=750,
                episode_len_sec=6, randomized_init=False,
                init_state={'init_x': 0.0},
                task_info={'stabilization_goal': [goal],
                           'stabilization_goal_tolerance': 0.0},
                constraints=[{'constraint_form': 'bounded_constraint',
                              'constrained_variable': 'state',
                              'active_dims': [0],
                              'lower_bounds': [-bounds],
                              'upper_bounds': [bounds]},
                             {'constraint_form': 'default_constraint',
                              'constrained_variable': 'input'}],
                done_on_out_of_bound=False, done_on_violation=False)


def test_long_horizon_active_constraint():
    """T=50 (the reference mpc.yaml default): goal BEYOND the state bound,
    so the constraint is active at the optimum. The SQP must converge and
    park exactly on the bound without meaningful violation."""
    env_func = partial(make, 'cartpole', **_cfg(goal=0.9, bounds=0.7))
    ctrl = make('mpc', env_func, horizon=50, q_mpc=[5, 0.1, 5, 0.1],
                r_mpc=[0.1], sqp_iters=3, qp_iters=600, seed=0)
    ctrl.reset()
    env = env_func()
    obs, info = env.reset()
    xs = []
    for _ in range(45):
        action = ctrl.select_action(obs, info)
        assert not ctrl.terminate_loop, 'T=50 solve declared infeasible'
        obs, _, _, info = env.step(action)
        xs.append(float(obs[0]))
    assert max(xs) < 0.7 + 2e-3, max(xs)       # rides, never crosses
    assert xs[-1] > 0.68, xs[-1]               # actually reaches the bound


def test_infeasible_start_hard_constraints_fallback():
    """Start OUTSIDE the feasible set with hard constraints: the QP is
    infeasible and the fallback ladder must fire (terminate_loop, zero /
    previous action — reference mpc.py:298-316), never crash."""
    env_func = partial(make, 'cartpole', **_cfg(goal=0.0, bounds=0.5))
    ctrl = make('mpc', env_func, horizon=10, q_mpc=[5, 0.1, 5, 0.1],
                r_mpc=[0.1], sqp_iters=3, qp_iters=400, seed=0)
    ctrl.reset()
    env = env_func()
    obs, info = env.reset()
    obs = env.set_state([0.9, 0.0, 0.0, 0.0])
    action = ctrl.select_action(obs, info)
    assert ctrl.terminate_loop
    assert np.allclose(action, 0.0)            # first rung: zero action


def test_infeasible_start_soft_constraints_recovers():
    """Same infeasible start with soft constraints: slacks absorb the
    violation; the controller must solve (heavy slack penalty = the
    ill-conditioned ADMM regime the staged-rho + early-exit budget exists
    for) and drive the state back inside the bounds."""
    env_func = partial(make, 'cartpole', **_cfg(goal=0.0, bounds=0.5))
    ctrl = make('mpc', env_func, horizon=10, q_mpc=[5, 0.1, 5, 0.1],
                r_mpc=[0.1], sqp_iters=3, soft_constraints=True, seed=0)
    ctrl.reset()
    env = env_func()
    obs, info = env.reset()
    obs = env.set_state([0.9, 0.0, 0.0, 0.0])
    for i in range(30):
        action = ctrl.select_action(obs, info)
        assert not ctrl.terminate_loop, f'soft solve infeasible at step {i}'
        obs, _, _, info = env.step(action)
    assert abs(float(obs[0])) < 0.5, obs       # back inside the bound


def test_warmstart_poisoned_recovers():
    """A garbage previous solution (the warm start after a solver fault)
    must not poison the next solve."""
    env_func = partial(make, 'cartpole', **_cfg(goal=0.3, bounds=0.7))
    ctrl = make('mpc', env_func, horizon=15, q_mpc=[1], r_mpc=[0.1],
                sqp_iters=3, seed=0)
    ctrl.reset()
    env = env_func()
    obs, info = env.reset()
    a_clean = ctrl.select_action(obs, info)
    # Poison: absurd previous trajectory + stale duals.
    ctrl.x_prev = np.full((4, 16), 50.0)
    ctrl.u_prev = np.full((15,), -40.0)
    import jax.numpy as jnp
    ctrl._qp_warm = (jnp.full((ctrl._n_z,), 1e3, jnp.float32),
                     jnp.full((ctrl._m_rows,), -1e3, jnp.float32))
    a_poisoned = ctrl.select_action(obs, info)
    assert not ctrl.terminate_loop
    assert np.all(np.isfinite(a_poisoned))
    assert abs(float(a_poisoned[0]) - float(a_clean[0])) < 0.5, \
        (a_clean, a_poisoned)


def test_feas_tol_configurable():
    """feas_tol is a real config knob: an absurdly tight tolerance declares
    the same (solvable) problem infeasible; the scaling-aware default does
    not (reference parity for the fallback semantics, mpc.py:298-316)."""
    env_func = partial(make, 'cartpole', **_cfg(goal=0.3, bounds=0.7))
    strict = make('mpc', env_func, horizon=10, q_mpc=[1], r_mpc=[0.1],
                  feas_tol=1e-9, feas_tol_relative=False, qp_iters=100,
                  seed=0)
    strict.reset()
    env = env_func()
    obs, info = env.reset()
    strict.select_action(obs, info)
    assert strict.terminate_loop
    default = make('mpc', env_func, horizon=10, q_mpc=[1], r_mpc=[0.1],
                   seed=0)
    default.reset()
    obs, info = env.reset()
    default.select_action(obs, info)
    assert not default.terminate_loop


def test_mpsc_certification_at_rpi_boundary():
    """Certify actions from states pushed toward the constraint boundary:
    the filter must either certify with a corrected, bound-respecting
    action or decline via the kinf fallback — never crash or emit an
    unsafe certified action."""
    CFG = dict(seed=42, cost='quadratic', ctrl_freq=15, pyb_freq=750,
               task='stabilization',
               task_info={'stabilization_goal': [0.0],
                          'stabilization_goal_tolerance': 0.005},
               init_state={'init_theta': 0.0}, randomized_init=False,
               episode_len_sec=6,
               constraints=[{'constraint_form': 'default_constraint',
                             'constrained_variable': 'state',
                             'upper_bounds': [1.5, 2, 0.3, 2],
                             'lower_bounds': [-1.5, -2, -0.3, -2]},
                            {'constraint_form': 'default_constraint',
                             'constrained_variable': 'input',
                             'upper_bounds': [5], 'lower_bounds': [-5]}],
               done_on_out_of_bound=False)
    env_func = partial(make, 'cartpole', **CFG)
    sf = make('linear_mpsc', env_func, horizon=10, q_lin=[1], r_lin=[1],
              integration_algo='rk4', n_samples=60, tau=0.95,
              warmstart=True, use_terminal_set=True,
              cost_function='one_step_cost')
    sf.learn()
    env = env_func()
    obs, _ = env.reset()
    sf.reset_before_run(env=env)
    rng = np.random.default_rng(1)
    certified = declined = 0
    for _ in range(20):
        x0 = np.array([1.35 + 0.1 * rng.random(),
                       0.5 * rng.standard_normal(),
                       0.1 * rng.standard_normal(),
                       0.2 * rng.standard_normal()], np.float32)
        env.reset()
        obs = env.set_state(x0)
        unsafe_u = np.array([4.5], np.float32)   # slam toward the bound
        u, success = sf.certify_action(obs[:4], unsafe_u)
        if success:
            certified += 1
            assert np.all(np.abs(u) <= 5 + 1e-6)
            assert np.all(np.isfinite(u))
        else:
            declined += 1
    # The filter must actually engage at the boundary (not rubber-stamp).
    assert certified + declined == 20
    assert certified > 0
