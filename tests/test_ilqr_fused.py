"""Fused single-dispatch iLQR solve + batched trajectory optimization.

The host learn() loop (reference ilqr.py:96-183 parity) pays one device
dispatch per env step per iteration; learn_fused() runs the whole
optimization as ONE jitted program and solve_batch() vmaps it. These
tests pin equivalence between the two paths and batch/sequential
consistency.
"""

from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import get_config, make

TASK_INFO = {'stabilization_goal': [0.6, 0.0],
             'stabilization_goal_tolerance': 0.0}


def _env_func(**overrides):
    kw = dict(seed=8, cost='quadratic', task='stabilization',
              task_info=TASK_INFO, randomized_init=False,
              episode_len_sec=2, ctrl_freq=15, pyb_freq=750,
              disturbances=None)
    kw.update(overrides)
    return partial(make, 'cartpole', **kw)


def _make_ilqr(**algo):
    kw = dict(get_config('ilqr'), max_iterations=8, epsilon=0.01,
              output_dir='/tmp/ilqr_fused_test')
    kw.update(algo)
    return make('ilqr', _env_func(), **kw)


def test_fused_learn_matches_host_loop():
    host = _make_ilqr()
    host.learn()
    host_cost = host.total_cost
    host_K = np.asarray(host.gains_fb_best)
    host_ff = np.asarray(host.input_ff_best)

    fused = _make_ilqr(fused_solve=True)
    fused.learn()
    # Same optimization on the same deterministic env: best cost agrees
    # tightly, policies agree where the host loop recorded them (the host
    # rollout can terminate early on done, truncating its stacks).
    assert fused.total_cost == pytest.approx(host_cost, rel=1e-3, abs=1e-3)
    T = min(host_K.shape[0], fused.gains_fb_best.shape[0])
    np.testing.assert_allclose(fused.gains_fb_best[:T], host_K[:T],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(fused.input_ff_best[:, :T], host_ff[:, :T],
                               rtol=1e-3, atol=1e-3)
    host.close()
    fused.close()


def test_fused_policy_stabilizes_in_env():
    ctrl = _make_ilqr(fused_solve=True)
    ctrl.learn()
    env = _env_func()()
    obs, info = env.reset()
    ctrl.reset_before_run()
    for _ in range(env.CTRL_STEPS):
        obs, _, done, _ = env.step(ctrl.select_action(obs, training=False))
        if done:
            break
    # Mild Q/R weights: assert controlled progress toward the goal with
    # the pole upright (full convergence needs a longer episode).
    assert float(obs[0]) > 0.2
    assert abs(float(obs[2])) < 0.1
    env.close()
    ctrl.close()


def test_solve_batch_consistent_with_single():
    ctrl = _make_ilqr(fused_solve=True)
    nominal = np.asarray(ctrl.env._nominal_init_state(), np.float32)
    x0s = np.stack([nominal,
                    nominal + np.asarray([0.1, 0, 0.05, 0], np.float32),
                    nominal + np.asarray([-0.1, 0, -0.05, 0], np.float32)])
    out = ctrl.solve_batch(x0s)
    assert out['gains_fb'].shape[0] == 3
    assert np.isfinite(out['cost']).all()
    # Row 0 starts from the nominal init — matches learn_fused's solve.
    ctrl.learn()
    assert out['cost'][0] == pytest.approx(ctrl.total_cost,
                                           rel=1e-4, abs=1e-4)
    np.testing.assert_allclose(out['gains_fb'][0], ctrl.gains_fb_best,
                               rtol=1e-5, atol=1e-5)
    # Different initial states produce different feedforward corrections
    # but all converge to finite cost curves.
    assert not np.allclose(out['cost'][1], out['cost'][0])
    assert np.isfinite(out['cost_curves']).all()
    ctrl.close()
