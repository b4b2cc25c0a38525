"""Safety filter tests: MPSC + CBF + CBF-NN on cartpole."""

from functools import partial

import numpy as np
import pytest

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.utils.registration import make

CONSTRAINED_CARTPOLE = dict(
    seed=42, cost='quadratic', ctrl_freq=15, pyb_freq=750, episode_len_sec=6,
    randomized_init=False, init_state={'init_theta': 0.1},
    task_info={'stabilization_goal': [0.0],
               'stabilization_goal_tolerance': 0.005},
    constraints=[
        {'constraint_form': 'default_constraint',
         'constrained_variable': 'state',
         'upper_bounds': [1.5, 2, 0.3, 2], 'lower_bounds': [-1.5, -2, -0.3, -2]},
        {'constraint_form': 'default_constraint',
         'constrained_variable': 'input',
         'upper_bounds': [5], 'lower_bounds': [-5]}])


@pytest.fixture(scope='module')
def mpsc_filter():
    env_func = partial(make, 'cartpole', **CONSTRAINED_CARTPOLE)
    # use_terminal_set off, matching the reference's own cartpole example
    # config (ref linear_mpsc_cartpole.yaml:16): with the sound terminal
    # ball, 'come to rest within a 0.005-ball in 10 steps' is borderline
    # for these states and f32-jitter-flaky under load.
    sf = make('linear_mpsc', env_func, horizon=10, q_lin=[1], r_lin=[1],
              integration_algo='rk4', n_samples=120, tau=0.95, seed=0,
              use_terminal_set=False)
    sf.learn()
    return sf


def test_mpsc_certifies_and_runs_closed_loop(mpsc_filter):
    sf = mpsc_filter
    obs = np.array([0.0, 0.0, 0.05, 0.0], np.float32)
    sf.reset_before_run()
    cert, success = sf.certify_action(obs, np.array([0.1]), None)
    assert success
    # Benign action passes (near) unchanged.
    assert abs(float(np.squeeze(cert)) - 0.1) < 0.2
    # Closed loop with LQR stays violation-free.
    env_func = partial(make, 'cartpole', **CONSTRAINED_CARTPOLE)
    ctrl = make('lqr', env_func, q_lqr=[1], r_lqr=[0.1])
    exp = BaseExperiment(env_func(), ctrl, safety_filter=sf)
    data, m = exp.run_evaluation(n_episodes=1, verbose=False)
    assert m['average_constraint_violation'] == 0
    assert 'safety_filter_data' in data
    exp.close()


def test_mpsc_save_load(mpsc_filter, tmp_path):
    sf = mpsc_filter
    path = str(tmp_path / 'mpsc.pkl')
    sf.save(path)
    env_func = partial(make, 'cartpole', **CONSTRAINED_CARTPOLE)
    sf2 = make('linear_mpsc', env_func, horizon=10, q_lin=[1], r_lin=[1],
               integration_algo='rk4', n_samples=120, tau=0.95, seed=1)
    sf2.load(path)
    assert np.allclose(sf2.P, sf.P)
    obs = np.array([0.0, 0.0, 0.05, 0.0], np.float32)
    cert, success = sf2.certify_action(obs, np.array([0.1]), None)
    assert success
    sf2.close()


@pytest.fixture(scope='module')
def cbf_filter():
    env_func = partial(make, 'cartpole', seed=42, randomized_init=False,
                       constraints=CONSTRAINED_CARTPOLE['constraints'])
    return make('cbf', env_func, slope=0.1, seed=0)


def test_mpsc_batch_certification_matches_sequential(mpsc_filter):
    """certify_action_batch: B cold-started tube solves in one vmapped
    device program must agree with per-element solve_optimization
    (feasibility flags and certified actions)."""
    sf = mpsc_filter
    rng = np.random.default_rng(7)
    states = np.stack([
        np.array([0.2, 0.1, 0.05, -0.1]),
        np.array([-0.5, 0.3, -0.08, 0.2]),
        np.array([1.2, 0.5, 0.1, 0.3]),
        rng.normal(0, 0.2, 4)]).astype(np.float32)
    actions = np.array([[0.5], [-1.0], [4.0], [0.2]], np.float32)
    batch_u, batch_ok = sf.certify_action_batch(states, actions)
    assert batch_u.shape == (4, 1) and batch_ok.shape == (4,)
    for i in range(4):
        sf.reset_before_run()          # cold start, like the batch path
        sf.before_optimization(states[i])
        u_seq, ok_seq = sf.solve_optimization(states[i], actions[i])
        assert bool(batch_ok[i]) == bool(ok_seq), f'row {i}'
        if ok_seq:
            np.testing.assert_allclose(batch_u[i], np.atleast_1d(u_seq),
                                       atol=5e-3)
    assert np.all(np.isfinite(batch_u))


def test_rpi_set_invariance_12dim():
    """compute_RPI_set must return a truly invariant ellipse even when the
    log-det descent fails to certify (12-state quadrotor-3D regime): for
    every boundary point x (x'Px = 1) and every sampled residual w,
    (Ax + w)' P (Ax + w) <= 1."""
    from safe_control_gym_tpu.safety_filters.mpsc.mpsc_utils import \
        compute_RPI_set
    rng = np.random.default_rng(0)
    nx = 12
    # Random strictly-stable closed-loop map (spectral radius ~0.97, the
    # slow-position-modes regime where the descent struggles).
    A = rng.normal(0, 0.3, (nx, nx))
    A = A / np.max(np.abs(np.linalg.eigvals(A))) * 0.97
    w = rng.normal(0, 1e-3, (nx, 300))
    P = compute_RPI_set(A, w, tau=0.975)
    evals = np.linalg.eigvalsh(P)
    assert evals.min() > 0, 'P must be positive definite'
    # Invariance check on boundary points.
    xs = rng.normal(0, 1, (200, nx))
    L = np.linalg.cholesky(np.linalg.inv(P))
    xs = (xs / np.linalg.norm(xs, axis=1, keepdims=True)) @ L.T  # x'Px = 1
    nxt = xs @ A.T  # (200, nx), then add every residual
    vals = np.einsum('ij,jk,lk->il', nxt, P, w.T)  # cross terms
    quad_x = np.sum((nxt @ P) * nxt, axis=1)[:, None]
    quad_w = np.sum((w.T @ P) * w.T, axis=1)[None, :]
    lhs = quad_x + 2 * vals + quad_w
    assert float(lhs.max()) <= 1.0 + 1e-6, \
        f'RPI violated: max (Ax+w)P(Ax+w) = {lhs.max():.4f}'


def test_cbf_batch_certification_matches_sequential(cbf_filter):
    """certify_action_batch: B CBF-QPs in one vmapped device program must
    agree with the per-call path (actions and feasibility), including a
    mesh-sharded run when 8 devices are available."""
    sf = cbf_filter
    states = np.stack([
        np.zeros(4),
        np.array([0, 0, 0.28, 1.0]),
        np.array([0, 0, -0.2, -0.5]),
        np.array([0.1, -0.2, 0.15, 0.4])]).astype(np.float32)
    actions = np.array([[0.1], [3.0], [-3.0], [1.5]], np.float32)
    batch_u, batch_ok = sf.certify_action_batch(states, actions)
    assert batch_u.shape == (4, 1) and batch_ok.shape == (4,)
    for i in range(4):
        u_seq, ok_seq = sf.solve_optimization(states[i], actions[i])
        assert bool(batch_ok[i]) == bool(ok_seq), f'row {i}'
        np.testing.assert_allclose(batch_u[i], np.atleast_1d(u_seq),
                                   atol=5e-3)
    import jax
    if len(jax.devices()) >= 8:
        from safe_control_gym_tpu.parallel.sharding import make_env_mesh
        sf.shard_over(make_env_mesh(8, axis_name='data'))
        states8 = np.tile(states, (2, 1)).astype(np.float32)
        actions8 = np.tile(actions, (2, 1)).astype(np.float32)
        sh_u, sh_ok = sf.certify_action_batch(states8, actions8)
        np.testing.assert_allclose(sh_u[:4], batch_u, atol=5e-3)
        assert (sh_ok[:4] == batch_ok).all()
        sf._solve_mesh = None          # un-shard: module-scoped fixture
        sf._solve_batch_jit = None


def test_cbf_passthrough_when_safe(cbf_filter):
    c, s = cbf_filter.certify_action(np.zeros(4, np.float32),
                                     np.array([1.0]))
    assert s
    assert abs(float(np.squeeze(c)) - 1.0) < 1e-3


def test_cbf_saturates_and_flags_unsafe(cbf_filter):
    # State outside the superlevel set + demand beyond bounds: u clamps to
    # the input limit (exactly) and the filter reports failure.
    c, s = cbf_filter.certify_action(np.array([0, 0, 0.28, 1.0], np.float32),
                                     np.array([8.0]))
    assert not s
    assert abs(float(np.squeeze(c)) - 5.0) < 1e-2  # env bound is 5 here


def test_cbf_corrects_toward_safety(cbf_filter):
    # Inside the set but pushing outward: certified action differs from
    # uncertified in the stabilizing direction.
    state = np.array([0.0, 0.0, 0.25, 0.5], np.float32)
    c, s = cbf_filter.certify_action(state, np.array([-3.0]))
    corr = cbf_filter.results_dict['correction'][-1]
    assert corr > 0.0


def test_cbf_nn_learns_residual():
    env_func = partial(make, 'cartpole', seed=42, randomized_init=False,
                       constraints=CONSTRAINED_CARTPOLE['constraints'])
    ctrl = make('lqr', env_func, q_lqr=[1], r_lqr=[0.1])
    sfnn = make('cbf_nn', env_func, num_episodes=2, max_num_steps=40,
                train_iterations=10, uncertified_controller=ctrl, seed=0)
    sfnn.learn()
    # Buffer received data and the filter still certifies.
    assert int(sfnn.buffer.state.count) > 0
    c, s = sfnn.certify_action(np.zeros(4, np.float32), np.array([0.5]))
    assert s
    # Batched path uses the LEARNED residual terms and matches per-call.
    states = np.stack([np.zeros(4), [0, 0, 0.2, 0.5]]).astype(np.float32)
    acts = np.array([[0.5], [2.0]], np.float32)
    bu, bok = sfnn.certify_action_batch(states, acts)
    for i in range(2):
        u_seq, ok_seq = sfnn.solve_optimization(states[i], acts[i])
        assert bool(bok[i]) == bool(ok_seq)
        np.testing.assert_allclose(bu[i], np.atleast_1d(u_seq), atol=5e-3)
    sfnn.close()
