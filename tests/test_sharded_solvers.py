"""Multi-chip beyond RL: mesh-sharded batched certification and MPC sweeps.

The batched tube-certification and batched NMPC programs are pure vmapped
solves, so sharding the batch axis over a ``jax.sharding.Mesh`` splits the
B independent problems across chips inside one SPMD program (solver
constants replicated, zero collectives). These tests run on the 8-device
virtual CPU mesh (tests/conftest.py) and pin (a) actual shard placement and
(b) numerical equivalence with the single-device batch.
"""

from functools import partial

import jax
import numpy as np
import pytest

from safe_control_gym_tpu.parallel.sharding import make_env_mesh
from safe_control_gym_tpu.utils.registration import make

CONSTRAINED_CARTPOLE = dict(
    seed=42, cost='quadratic', ctrl_freq=15, pyb_freq=750, episode_len_sec=6,
    randomized_init=False, init_state={'init_theta': 0.1},
    task_info={'stabilization_goal': [0.0],
               'stabilization_goal_tolerance': 0.005},
    constraints=[
        {'constraint_form': 'default_constraint',
         'constrained_variable': 'state',
         'upper_bounds': [1.5, 2, 0.3, 2],
         'lower_bounds': [-1.5, -2, -0.3, -2]},
        {'constraint_form': 'default_constraint',
         'constrained_variable': 'input',
         'upper_bounds': [5], 'lower_bounds': [-5]}])


def _need_devices(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f'requires {n} devices')


def test_sharded_certification_matches_single_device():
    _need_devices()
    env_func = partial(make, 'cartpole', **CONSTRAINED_CARTPOLE)
    sf = make('linear_mpsc', env_func, horizon=10, q_lin=[1], r_lin=[1],
              integration_algo='rk4', n_samples=120, tau=0.95, seed=0,
              use_terminal_set=False)
    sf.learn()
    # Mild states/actions: every problem certifies decisively, so the
    # feasibility flags cannot flip between the two compilations of the
    # same math (borderline residuals may differ at f32 fusion level).
    rng = np.random.default_rng(3)
    states = rng.normal(0, 0.08, (8, 4)).astype(np.float32)
    actions = rng.uniform(-1, 1, (8, 1)).astype(np.float32)
    u_ref, ok_ref = sf.certify_action_batch(states, actions)
    assert ok_ref.all()

    mesh = make_env_mesh(8, axis_name='data')
    sf.shard_over(mesh)
    # Placement: the batch really lands distributed over all 8 chips.
    placed = sf._place_batched(np.zeros((8, 4), np.float32))[0]
    assert len(placed.sharding.device_set) == 8
    assert not placed.sharding.is_fully_replicated
    u_sh, ok_sh = sf.certify_action_batch(states, actions)
    np.testing.assert_array_equal(ok_ref, ok_sh)
    np.testing.assert_allclose(u_ref, u_sh, atol=1e-3)
    sf.close()


def test_sharded_nmpc_sweep_matches_single_device():
    _need_devices()
    env_func = partial(make, 'cartpole', **CONSTRAINED_CARTPOLE)
    ctrl = make('mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=10,
                sqp_iters=3, seed=0)
    ctrl.reset()
    rng = np.random.default_rng(5)
    x0s = rng.uniform(-0.3, 0.3, (16, 4)).astype(np.float32)
    u_ref, feas_ref = ctrl.select_action_batch(x0s)
    assert feas_ref.all()

    mesh = make_env_mesh(8, axis_name='data')
    ctrl.shard_over(mesh)
    placed = ctrl._place_batched(np.zeros((16, 4), np.float32))
    assert len(placed.sharding.device_set) == 8
    u_sh, feas_sh = ctrl.select_action_batch(x0s)
    np.testing.assert_array_equal(feas_ref, feas_sh)
    np.testing.assert_allclose(u_ref, u_sh, atol=1e-3)
    ctrl.close()
