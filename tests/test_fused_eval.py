"""Fused closed-loop policy evaluation (experiments/fused_eval.py).

CPU backend (conftest) exercises the per-step-scan path end-to-end and
pins the action semantics exactly against each controller's
``select_action``; the policy-in-kernel path is the same program the
bench CLOSED-LOOP rows time and is statistically pinned on hardware in
tests/test_kernel_stochastic_tpu.py.

Reference role: the host evaluation loops (base_experiment.py:54-115,
ppo.py:193-215, sac.py:337-370).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.experiments.fused_eval import (
    evaluate_policy_fused, policy_eval_spec)
from safe_control_gym_tpu.utils.registration import get_config, make


def _ppo(tmp_path, **env_kw):
    cfg = get_config('ppo')
    env_func = partial(make, 'cartpole', seed=7,
                       normalized_rl_action_space=True, **env_kw)
    return make('ppo', env_func, output_dir=str(tmp_path), seed=0, **cfg)


def test_ppo_scan_eval_runs_and_is_deterministic(tmp_path):
    ctrl = _ppo(tmp_path)
    try:
        r1 = ctrl.evaluate_fused(batch=32, n_steps=200, seed=5)
        r2 = ctrl.evaluate_fused(batch=32, n_steps=200, seed=5)
        assert r1['path'] == 'per-step-scan'   # CPU backend in tests
        assert r1['total_steps'] == 32 * 200
        # A fresh (near-zero-action) policy lets the pole fall: episodes end.
        assert r1['episodes'] > 0
        assert r1['ep_length_mean'] > 1
        assert np.isfinite(r1['ep_return_mean'])
        assert np.isfinite(r1['rmse'])
        assert r1['steps_per_sec'] > 0
        # Same seed -> same program + keys -> identical statistics.
        for k in ('episodes', 'ep_return_mean', 'rmse'):
            assert r1[k] == r2[k], k
        # Stochastic (collect-distribution) mode also runs.
        rs = ctrl.evaluate_fused(batch=32, n_steps=200, seed=5,
                                 stochastic=True)
        assert rs['episodes'] > 0
    finally:
        ctrl.close()


def test_ppo_action_fn_matches_select_action(tmp_path):
    """The scan path's action function IS select_action (incl. the frozen
    obs-normalizer fold) — the ground truth the kernel path is packed
    from and statistically pinned against."""
    ctrl = _ppo(tmp_path)
    try:
        spec = policy_eval_spec(ctrl, ctrl.env, stochastic=False)
        obs = jnp.asarray(np.linspace(-0.2, 0.2, 16, dtype=np.float32)
                          .reshape(4, 4))
        got = np.asarray(spec['action_fn'](obs, jax.random.PRNGKey(0)))
        want = np.stack([np.atleast_1d(ctrl.select_action(np.asarray(o)))
                         for o in obs])
        assert np.allclose(got, want, atol=1e-5), (got, want)
    finally:
        ctrl.close()


def test_sac_ddpg_action_fn_matches_select_action(tmp_path):
    env_func = partial(make, 'cartpole', seed=7,
                       normalized_rl_action_space=True)
    obs = jnp.asarray(np.linspace(-0.2, 0.2, 16, dtype=np.float32)
                      .reshape(4, 4))
    for algo in ('sac', 'ddpg'):
        cfg = get_config(algo)
        ctrl = make(algo, env_func, output_dir=str(tmp_path), seed=0, **cfg)
        try:
            spec = policy_eval_spec(ctrl, ctrl.env)
            assert spec['squash'] is True
            got = np.asarray(spec['action_fn'](obs, jax.random.PRNGKey(0)))
            want = np.stack([np.atleast_1d(ctrl.select_action(np.asarray(o)))
                             for o in obs])
            assert np.allclose(got, want, atol=1e-5), (algo, got, want)
            r = ctrl.evaluate_fused(batch=16, n_steps=120, seed=3)
            assert r['episodes'] > 0 and np.isfinite(r['ep_return_mean'])
        finally:
            ctrl.close()


def test_constrained_env_reports_violations(tmp_path):
    cfg = get_config('ppo')
    constraints = [{'constraint_form': 'default_constraint',
                    'constrained_variable': 'state'},
                   {'constraint_form': 'default_constraint',
                    'constrained_variable': 'input'}]
    env_func = partial(make, 'cartpole', seed=7,
                       normalized_rl_action_space=True,
                       constraints=constraints)
    ctrl = make('ppo', env_func, output_dir=str(tmp_path), seed=0, **cfg)
    try:
        r = ctrl.evaluate_fused(batch=16, n_steps=150, seed=1)
        assert 'total_violations' in r
        assert r['total_violations'] >= 0
    finally:
        ctrl.close()


def test_gates(tmp_path):
    # Stochastic SAC: state-dependent std has no in-kernel/scan analog.
    env_func = partial(make, 'cartpole', seed=7,
                       normalized_rl_action_space=True)
    sac = make('sac', env_func, output_dir=str(tmp_path), seed=0,
               **get_config('sac'))
    try:
        with pytest.raises(ValueError, match='stochastic'):
            policy_eval_spec(sac, sac.env, stochastic=True)
    finally:
        sac.close()
    # Squashed policies on a physical (non-normalized) action space: the
    # controller's affine unscale is not what the kernel squash computes.
    env_func_raw = partial(make, 'cartpole', seed=7,
                           normalized_rl_action_space=False)
    ddpg = make('ddpg', env_func_raw, output_dir=str(tmp_path), seed=0,
                **get_config('ddpg'))
    try:
        with pytest.raises(ValueError, match='normalized'):
            policy_eval_spec(ddpg, ddpg.env)
    finally:
        ddpg.close()


def test_mesh_sharded_eval_matches_single_device(tmp_path):
    """Sharding the env fleet over a mesh must not change the statistics:
    the rollout is per-env deterministic given the key, and the reduction
    is per-env — replica consistency like the dryrun's other paths."""
    from safe_control_gym_tpu.parallel.sharding import make_env_mesh
    ctrl = _ppo(tmp_path)
    try:
        mesh = make_env_mesh(8, axis_name='env')
        kw = dict(batch=32, n_steps=150, seed=4, return_per_env=True)
        r1 = ctrl.evaluate_fused(**kw)
        r2 = ctrl.evaluate_fused(mesh=mesh, **kw)
        assert r2['path'] == 'per-step-scan-sharded'
        assert np.allclose(r1['per_env']['reward_sum'],
                           r2['per_env']['reward_sum'], atol=1e-5)
        assert np.array_equal(r1['per_env']['done_count'],
                              r2['per_env']['done_count'])
        with pytest.raises(ValueError, match='per-chip'):
            ctrl.evaluate_fused(mesh=mesh, use_kernel=True, **kw)
    finally:
        ctrl.close()


def test_quadrotor_2d_scan_eval(tmp_path):
    cfg = get_config('ppo')
    env_func = partial(make, 'quadrotor', seed=7, quad_type=2,
                       normalized_rl_action_space=True,
                       task_info={'stabilization_goal': [0, 1],
                                  'stabilization_goal_tolerance': 0.05},
                       init_state={'init_z': 1.0})
    ctrl = make('ppo', env_func, output_dir=str(tmp_path), seed=0, **cfg)
    try:
        r = ctrl.evaluate_fused(batch=16, n_steps=150, seed=2)
        assert r['path'] == 'per-step-scan'
        assert r['episodes'] > 0 and np.isfinite(r['ep_return_mean'])
    finally:
        ctrl.close()
