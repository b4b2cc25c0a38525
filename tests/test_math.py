"""Math-layer tests: normalization, distributions, trajectories, GP,
random processes, schedules, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.trajectories import generate_trajectory
from safe_control_gym_tpu.math import normalization as norm
from safe_control_gym_tpu.math.distributions import Categorical, Normal
from safe_control_gym_tpu.math.metrics import compute_cvar
from safe_control_gym_tpu.math.networks import (mlp_apply, mlp_init,
                                                rnn_apply, rnn_init)
from safe_control_gym_tpu.math.rotations import (euler_to_quat, normalize_angle,
                                                 quat_to_euler, quat_to_rot,
                                                 rot_xyz)
from safe_control_gym_tpu.math.schedules import ConstantSchedule, LinearSchedule


def test_running_mean_std_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((1000, 3)) * 2 + 1
    rms = norm.RunningMeanStd(shape=(3,))
    for chunk in np.split(data, 10):
        rms.update(chunk)
    assert np.allclose(rms.mean, data.mean(0), atol=1e-3)
    assert np.allclose(rms.var, data.var(0), atol=1e-2)


def test_mean_std_normalizer_read_only():
    n = norm.MeanStdNormalizer(shape=(2,))
    x = np.array([[1.0, 2.0], [3.0, 4.0]])
    n(x)
    state_before = dict(n.state_dict())
    n.set_read_only()
    n(x * 100)
    assert np.allclose(n.state_dict()['mean'], state_before['mean'])


def test_reward_std_normalizer():
    n = norm.RewardStdNormalizer(gamma=0.99)
    rews = np.ones(4)
    dones = np.zeros(4)
    out = n(rews, dones)
    assert out.shape == (4,)
    assert np.isfinite(out).all()


def test_normal_distribution_matches_scipy():
    from scipy.stats import norm as scipy_norm
    d = Normal(jnp.array([0.5, -0.5]), jnp.array([1.0, 2.0]))
    lp = float(d.log_prob(jnp.array([0.0, 0.0]))[0])
    ref = (scipy_norm.logpdf(0, 0.5, 1.0) + scipy_norm.logpdf(0, -0.5, 2.0))
    assert abs(lp - ref) < 1e-5
    assert np.allclose(np.asarray(d.mode()), [0.5, -0.5])


def test_categorical_distribution():
    d = Categorical(jnp.log(jnp.array([0.2, 0.8])))
    assert int(d.mode()) == 1
    lp = float(d.log_prob(jnp.array(1))[0])
    assert abs(lp - np.log(0.8)) < 1e-5


def test_trajectory_shapes_and_closure():
    for traj_type in ['circle', 'square', 'figure8']:
        pos, vel, speed = generate_trajectory(
            traj_type=traj_type, traj_length=6.0, num_cycles=1,
            traj_plane='zx', position_offset=(0.5, 0), scaling=0.5,
            sample_time=1 / 50)
        assert pos.shape == (301, 3)
        # A full cycle approximately returns to the start.
        assert np.linalg.norm(pos[0] - pos[-1]) < 0.1
        # Velocities consistent with finite differences.
        fd = (pos[2:] - pos[:-2]) / (2 / 50)
        err = np.abs(fd - vel[1:-1]).max()
        assert err < 0.5, (traj_type, err)


def test_figure8_formulas():
    # Exact formulas (benchmark_env.py:612-638).
    pos, vel, _ = generate_trajectory('figure8', 10.0, 1, 'xy', (0, 0), 1.0,
                                      0.1)
    t = 0.5
    idx = 5
    w = 2 * np.pi / 10.0
    assert abs(pos[idx, 0] - np.sin(w * t)) < 1e-9
    assert abs(pos[idx, 1] - np.sin(w * t) * np.cos(w * t)) < 1e-9


def test_rotation_roundtrip():
    rpy = np.array([0.3, -0.2, 1.1])
    q = euler_to_quat(jnp.asarray(rpy))
    rpy2 = np.asarray(quat_to_euler(q))
    assert np.allclose(rpy, rpy2, atol=1e-5)
    R1 = np.asarray(quat_to_rot(q))
    R2 = np.asarray(rot_xyz(*rpy))
    assert np.allclose(R1, R2, atol=1e-5)


def test_normalize_angle():
    assert abs(float(normalize_angle(jnp.asarray(3 * np.pi)))) - np.pi < 1e-6
    assert abs(float(normalize_angle(jnp.asarray(0.5))) - 0.5) < 1e-6


def test_cvar():
    data = np.array([1.0, 2.0, 3.0, 4.0])
    assert compute_cvar(data, 0.5, lower_range=True) == 1.5
    assert compute_cvar(data, 0.5, lower_range=False) == 3.5


def test_schedules():
    s = LinearSchedule(1.0, 0.0, 10)
    vals = [s() for _ in range(12)]
    assert vals[0] == 1.0
    assert vals[-1] == 0.0
    c = ConstantSchedule(0.3)
    assert c() == 0.3


def test_gp_regression_accuracy():
    from safe_control_gym_tpu.controllers.mpc.gp_utils import GaussianProcess
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (60, 1))
    Y = np.sin(X[:, 0]) + rng.normal(0, 0.01, 60)
    gp = GaussianProcess(1, kernel='Matern')
    gp.train(X, Y, n_train=300)
    x_test = np.linspace(-1.5, 1.5, 20)[:, None]
    mean, var = gp.predict(x_test)
    assert np.abs(mean - np.sin(x_test[:, 0])).max() < 0.1
    # Pure prediction function consistent with predict().
    fn = gp.make_casadi_prediction_func()
    assert abs(float(fn(jnp.asarray(x_test[3]))) - mean[3]) < 1e-4


def test_gp_collection_multi_dim():
    from safe_control_gym_tpu.controllers.mpc.gp_utils import \
        GaussianProcessCollection
    rng = np.random.default_rng(1)
    X = rng.uniform(-1, 1, (50, 2))
    Y = np.stack([X[:, 0] ** 2, X.sum(1)], axis=1)
    gpc = GaussianProcessCollection(target_dim=2)
    gpc.train(X, Y, n_train=200)
    mean, var = gpc.predict(X[:5])
    assert mean.shape == (5, 2)
    assert np.abs(mean - Y[:5]).max() < 0.2


def test_batch_gp_matches_collection():
    """BatchGaussianProcess (ref gp_utils.py:589-893 BatchGPModel parity):
    one stacked vmapped program must reproduce the per-dim collection."""
    from safe_control_gym_tpu.controllers.mpc.gp_utils import (
        BatchGaussianProcess, GaussianProcessCollection)
    rng = np.random.default_rng(2)
    X = rng.uniform(-1, 1, (40, 3))
    Y = np.stack([np.sin(X[:, 0]), X[:, 1] * X[:, 2]], axis=1)
    gpc = GaussianProcessCollection(target_dim=2, kernel='Matern')
    gpc.train(X, Y, n_train=150)
    bgp = BatchGaussianProcess(3, 2, kernel='Matern')
    bgp.train(X, Y, n_train=150)
    m_c, v_c = gpc.predict(X[:6])
    m_b, v_b = bgp.predict(X[:6])
    np.testing.assert_allclose(m_b, m_c, atol=1e-4)
    np.testing.assert_allclose(v_b, v_c, atol=1e-4)
    # Stacked pure mean function agrees with predict().
    fn = bgp.make_batched_predict_func()
    np.testing.assert_allclose(np.asarray(fn(X[3])), m_b[3], atol=1e-4)
    # Masks select input/target subsets (BatchGPModel input/target_mask).
    bgp_m = BatchGaussianProcess(2, 1, input_mask=[0, 1], target_mask=[0],
                                 kernel='Matern')
    bgp_m.train(X, Y, n_train=100)
    m_m, _ = bgp_m.predict(X[:4])
    assert m_m.shape == (4, 1)
    # State dict round-trips.
    sd = bgp.state_dict()
    bgp2 = BatchGaussianProcess(3, 2, kernel='Matern')
    bgp2.load_state_dict(sd)
    m_r, _ = bgp2.predict(X[:6])
    np.testing.assert_allclose(m_r, m_b, atol=1e-6)


def test_batch_gp_best_test_checkpointing():
    """With held-out data the batched trainer keeps the best-test iterate
    (ref gp_utils.py:769-793): its test marginal likelihood is never worse
    than the final iterate's."""
    from safe_control_gym_tpu.controllers.mpc.gp_utils import (
        BatchGaussianProcess, _nll)
    rng = np.random.default_rng(3)
    X = rng.uniform(-2, 2, (30, 1))
    Y = (np.sin(X) + rng.normal(0, 0.05, X.shape))
    Xt = rng.uniform(-2, 2, (15, 1))
    Yt = (np.sin(Xt) + rng.normal(0, 0.05, Xt.shape))
    # Overtrain deliberately so the final iterate overfits the tiny set.
    best = BatchGaussianProcess(1, 1, kernel='RBF')
    best.train(X, Y, test_x=Xt, test_y=Yt, n_train=400, learning_rate=0.1)
    final = BatchGaussianProcess(1, 1, kernel='RBF')
    final.train(X, Y, n_train=400, learning_rate=0.1)

    def test_nll(gp):
        p = jax.tree.map(lambda x: x[0], gp.params)
        return float(_nll(p, jnp.asarray(Xt, jnp.float32),
                          jnp.asarray(Yt[:, 0], jnp.float32), gp.kernel_fn))

    assert test_nll(best) <= test_nll(final) + 1e-5


def test_mlp_and_rnn_shapes():
    key = jax.random.PRNGKey(0)
    params = mlp_init(key, 4, 2, [32, 32])
    out = mlp_apply(params, jnp.ones((7, 4)))
    assert out.shape == (7, 2)
    rnn = rnn_init(key, 4, 16)
    h_seq, h_last = rnn_apply(rnn, jnp.ones((5, 3, 4)), jnp.zeros((3, 16)))
    assert h_seq.shape == (5, 3, 16)
    assert h_last.shape == (3, 16)


def test_ou_process():
    from safe_control_gym_tpu.math.random_processes import \
        OrnsteinUhlenbeckProcess
    p = OrnsteinUhlenbeckProcess(2, ConstantSchedule(0.2))
    samples = np.stack([p.sample() for _ in range(100)])
    assert samples.shape == (100, 2)
    # Temporally correlated: lag-1 autocorrelation positive.
    ac = np.corrcoef(samples[:-1, 0], samples[1:, 0])[0, 1]
    assert ac > 0.5
