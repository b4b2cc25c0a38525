"""GP-MPC closed-loop epoch training + real online learning.

Covers the reference's learn() epoch loop (gp_mpc.py:841-962): data comes
from the controller's OWN closed-loop runs, retraining happens per epoch,
and the test-run cost improves over the untrained prior. Also covers the
online-learning path the reference only declares (gp_mpc.py:981-983) and
the public env.set_state API used for data collection.
"""

from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import make

pytestmark = pytest.mark.slow  # multi-epoch GP training: ~minutes per test

CFG = dict(seed=42, cost='quadratic', ctrl_freq=10, pyb_freq=500,
           episode_len_sec=2, randomized_init=False,
           init_state={'init_theta': 0.1},
           task_info={'stabilization_goal': [0.3],
                      'stabilization_goal_tolerance': 0.02},
           constraints=[{'constraint_form': 'default_constraint',
                         'constrained_variable': 'input'}])


def _make_ctrl(**overrides):
    env_func = partial(make, 'cartpole', **CFG)
    kw = dict(q_mpc=[1], r_mpc=[0.1], horizon=10,
              prior_info={'prior_prop': {'pole_length': 1.0}},
              num_samples=40, optimization_iterations=60, seed=0)
    kw.update(overrides)
    ctrl = make('gp_mpc', env_func, **kw)
    ctrl.reset()
    return ctrl


def test_set_state_public_api():
    env = make('cartpole', **CFG)
    env.reset()
    target = np.array([0.5, -0.2, 0.05, 0.1], np.float32)
    obs = env.set_state(target)
    assert np.allclose(env.state, target)
    assert np.allclose(np.asarray(obs)[:4], target)
    obs2, _, _, _ = env.step(np.zeros(1))
    assert np.all(np.isfinite(obs2))
    env.close()


def test_gp_approx_validated():
    with pytest.raises(NotImplementedError):
        _make_ctrl(gp_approx='taylor')


def test_epoch_training_from_own_runs():
    """Epoch loop: epoch 0 = prior runs; later epochs train on harvested
    closed-loop data and the GP explains the residuals the prior misses."""
    ctrl = _make_ctrl(num_epochs=3, num_train_episodes_per_epoch=1,
                      num_test_episodes_per_epoch=1,
                      same_test_initial_state=True,
                      rand_data_selection=False,
                      terminate_train_on_done=True,
                      terminate_test_on_done=False)
    train_runs, test_runs = ctrl.learn()
    assert set(train_runs) == {0, 1, 2} and set(test_runs) == {0, 1, 2}
    assert ctrl._gp_trained
    # Training data must be transitions of the controller's own runs:
    # every harvested input row appears in some recorded run trajectory.
    obs_bank = np.vstack([np.atleast_2d(np.asarray(r['obs']))[:, :4]
                          for runs in train_runs.values()
                          for r in runs.values()])
    for row in ctrl.data_inputs[:, :4]:
        d = np.min(np.linalg.norm(obs_bank - row[None], axis=1))
        assert d < 1e-5
    # The trained GP must predict the harvested residuals much better than
    # the prior alone (which predicts zero residual) — epoch-over-epoch the
    # residual model explains the controller's own data.
    mean, _ = ctrl.gaussian_process.predict(ctrl.data_inputs)
    resid = ctrl.data_targets
    rmse_gp = float(np.sqrt(np.mean((mean - resid) ** 2)))
    rmse_prior = float(np.sqrt(np.mean(resid ** 2)))
    assert rmse_gp < 0.5 * rmse_prior
    # Closed-loop test cost with the trained GP beats the prior's epoch-0.
    cost0 = test_runs[0][0]['full_traj_common_cost']
    cost_last = test_runs[2][0]['full_traj_common_cost']
    assert cost_last < cost0
    ctrl.close()


def test_online_learning_updates_without_recompile():
    """online_learning appends residual data per step into the padded
    capacity and refreshes the posterior; the jitted SQP program is NOT
    recompiled (fixed shapes — the GP data travels as arguments)."""
    ctrl = _make_ctrl(num_samples=30, online_learning=True, online_buffer=8,
                      train_iterations=1)
    ctrl.learn()   # LHS bootstrap (num_epochs=1 path)
    gp0 = ctrl.gaussian_process.gps[0]
    n_real_before = int(np.sum(np.asarray(gp0._point_noise) == 0.0))
    assert gp0.X.shape[0] == 30 + 8  # capacity padding
    env = make('cartpole', **CFG)
    ctrl.reset_before_run()
    obs, info = env.reset()
    for _ in range(4):
        action = ctrl.select_action(obs, info)
        assert np.all(np.isfinite(action))
        obs, _, _, info = env.step(action)
    n_real_after = int(np.sum(np.asarray(gp0._point_noise) == 0.0))
    assert n_real_after == n_real_before + 3  # first step has no transition
    # One compiled program for all steps: shapes never changed. (The live
    # dispatch program is the round-3 fused tightening+solve when GP-aware;
    # the split _solve_jit otherwise.)
    prog = ctrl._fused_jit if ctrl._fused_jit is not None else ctrl._solve_jit
    assert prog._cache_size() == 1
    # Ring behavior: more steps than the buffer wraps without growing.
    for _ in range(8):
        action = ctrl.select_action(obs, info)
        obs, _, _, info = env.step(action)
    assert gp0.X.shape[0] == 38
    assert int(np.sum(np.asarray(gp0._point_noise) == 0.0)) <= 38
    env.close()
    ctrl.close()


def test_vectorized_gp_training_matches_sequential():
    """The vmapped all-dims-in-one-program training (the reference's
    batched/multitask GP role, gp_utils.py:62-215) is numerically the
    sequential per-dim path."""
    from safe_control_gym_tpu.controllers.mpc.gp_utils import \
        GaussianProcessCollection
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 3)).astype(np.float32)
    Y = (0.1 * rng.normal(size=(40, 2))).astype(np.float32)
    c_vec = GaussianProcessCollection(target_dim=2, kernel='Matern')
    c_seq = GaussianProcessCollection(target_dim=2, kernel='Matern')
    l_vec = c_vec.train(X, Y, n_train=100, vectorized=True)
    l_seq = c_seq.train(X, Y, n_train=100, vectorized=False)
    assert np.allclose(l_vec, l_seq, atol=1e-3), (l_vec, l_seq)
    m_vec, v_vec = c_vec.predict(X[:7])
    m_seq, v_seq = c_seq.predict(X[:7])
    assert np.allclose(m_vec, m_seq, atol=1e-4)
    assert np.allclose(v_vec, v_seq, atol=1e-4)
