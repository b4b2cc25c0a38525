"""Whole-rollout Pallas kernel (ops/rollout_kernels.py): replay-mode
equivalence with the production ``FuncEnv.step_autoreset`` scan.

Runs under the CPU interpreter with a fixed action sequence and
deterministic resets — the exact trajectory, per-env reward sums, done
counts, and final states must match the per-step production path. The
PRNG paths (on-core action/reset/noise draws) have no CPU lowering and
are exercised on the real TPU by tools/fused_rollout_bench.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from safe_control_gym_tpu.utils.registration import make


def _interpret(monkeypatch):
    import safe_control_gym_tpu.ops.rollout_kernels as rk
    monkeypatch.setattr(rk.pl, 'pallas_call',
                        functools.partial(pl.pallas_call, interpret=True))
    return rk


def _env(**over):
    kw = dict(seed=0, ctrl_freq=50, pyb_freq=1000, episode_len_sec=0.4,
              randomized_init=False, init_state={'init_x': 0.1},
              task_info={'stabilization_goal': [0],
                         'stabilization_goal_tolerance': 0.0})
    kw.update(over)
    return make('cartpole', **kw)


def _production_rollout(env, states, actions):
    """Scan the production batched step; accumulate the same per-env stats
    the kernel reports."""
    func = env.func

    def body(carry, a):
        st, rew, dones, viol = carry
        st, out, _obs = func.step_autoreset(st, a[:, None],
                                            jax.random.PRNGKey(0))
        return (st, rew + out.reward, dones + out.done.astype(jnp.float32),
                viol + out.constraint_violation.astype(jnp.float32)), None

    B = actions.shape[1]
    z = jnp.zeros((B,), jnp.float32)
    (st, rew, dones, viol), _ = jax.lax.scan(body, (states, z, z, z),
                                             actions)
    return st, rew, dones, viol


def test_replay_matches_production_step(monkeypatch):
    rk = _interpret(monkeypatch)
    env = _env()
    B, T = 128, 60  # 3 full 20-step episodes
    rng = np.random.default_rng(3)
    actions = jnp.asarray(rng.uniform(-2.0, 2.0, (T, B)), jnp.float32)

    states, _obs = env.func.reset_batch(jax.random.PRNGKey(1), B)
    st_prod, rew_prod, done_prod, _ = _production_rollout(env, states,
                                                           actions)

    cfg = rk.cartpole_rollout_cfg(env)
    out = rk.cartpole_rollout_pallas(
        states.state, cfg, 0, n_steps=T, n_substeps=env.PYB_STEPS_PER_CTRL,
        dt=env.PYB_TIMESTEP, actions=actions, draw_actions=False,
        randomized_reset=False)

    np.testing.assert_allclose(np.asarray(out['state']),
                               np.asarray(st_prod.state), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out['ctrl_step']),
                                  np.asarray(st_prod.ctrl_step,
                                             dtype=np.float32))
    env.close()


def test_replay_oob_and_goal_dones(monkeypatch):
    """Out-of-bounds terminations fire identically in both paths."""
    rk = _interpret(monkeypatch)
    env = _env(init_state={'init_theta': 1.5}, episode_len_sec=2.0)
    B, T = 64, 40
    rng = np.random.default_rng(4)
    actions = jnp.asarray(rng.uniform(-8.0, 8.0, (T, B)), jnp.float32)

    states, _obs = env.func.reset_batch(jax.random.PRNGKey(2), B)
    st_prod, rew_prod, done_prod, _ = _production_rollout(env, states,
                                                           actions)
    assert float(done_prod.max()) > 0  # theta 1.5 rad tips over fast

    cfg = rk.cartpole_rollout_cfg(env)
    out = rk.cartpole_rollout_pallas(
        states.state, cfg, 0, n_steps=T, n_substeps=env.PYB_STEPS_PER_CTRL,
        dt=env.PYB_TIMESTEP, actions=actions, draw_actions=False,
        randomized_reset=False)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


@pytest.mark.parametrize('quad_type', [2, 3])
def test_quad_replay_matches_production_step(monkeypatch, quad_type):
    rk = _interpret(monkeypatch)
    goal = [0, 1] if quad_type == 2 else [0, 0, 1]
    env = make('quadrotor', quad_type=quad_type, seed=0, ctrl_freq=50,
               pyb_freq=1000, episode_len_sec=0.4, randomized_init=False,
               init_state={'init_z': 1.0},
               task_info={'stabilization_goal': goal,
                          'stabilization_goal_tolerance': 0.0})
    B, T = 64, 48  # several 20-step episodes + a truncated tail
    nu = env.action_dim
    rng = np.random.default_rng(5)
    lo = env.physical_action_bounds[0][0]
    hi = env.physical_action_bounds[1][0]
    actions = jnp.asarray(rng.uniform(lo, hi, (T, B, nu)), jnp.float32)

    func = env.func

    def body(carry, a):
        st, rew, dones = carry
        st, out, _obs = func.step_autoreset(st, a, jax.random.PRNGKey(0))
        return (st, rew + out.reward,
                dones + out.done.astype(jnp.float32)), None

    states, _obs = func.reset_batch(jax.random.PRNGKey(1), B)
    z = jnp.zeros((B,), jnp.float32)
    (st_prod, rew_prod, done_prod), _ = jax.lax.scan(
        body, (states, z, z), actions)

    cfg = rk._quad_rollout_cfg(env)
    roll = rk.quad2d_rollout_pallas if quad_type == 2 \
        else rk.quad3d_rollout_pallas
    out = roll(states.state, cfg, 0, T, env.PYB_STEPS_PER_CTRL,
               env.PYB_TIMESTEP, actions=jnp.swapaxes(actions, 1, 2),
               draw_actions=False, randomized_reset=False)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['state']),
                               np.asarray(st_prod.state),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


_BENCH_CONSTRAINTS = [
    {'constraint_form': 'default_constraint', 'constrained_variable': 'state'},
    {'constraint_form': 'default_constraint', 'constrained_variable': 'input'},
]


def test_constrained_replay_counts_violations(monkeypatch):
    """``constrained=True`` violation accounting matches the production
    constrained step — including INPUT-box violations on the noisy
    pre-clip action (values_from(x_new, noisy), benchmark_env step_impl).
    ``action_noise=False`` keeps the replay path PRNG-free so it runs
    under the CPU interpreter."""
    rk = _interpret(monkeypatch)
    env = _env(episode_len_sec=2.0, constraints=_BENCH_CONSTRAINTS)
    B, T = 64, 40
    rng = np.random.default_rng(6)
    # Beyond the +-10 N physical bound: guarantees input violations.
    actions = jnp.asarray(rng.uniform(-12.0, 12.0, (T, B)), jnp.float32)

    states, _obs = env.func.reset_batch(jax.random.PRNGKey(3), B)
    st_prod, rew_prod, done_prod, viol_prod = _production_rollout(
        env, states, actions)
    assert float(viol_prod.sum()) > 0

    cfg = rk.cartpole_rollout_cfg(env)
    out = rk.cartpole_rollout_pallas(
        states.state, cfg, 0, n_steps=T, n_substeps=env.PYB_STEPS_PER_CTRL,
        dt=env.PYB_TIMESTEP, actions=actions, draw_actions=False,
        constrained=True, action_noise=False, randomized_reset=False)
    np.testing.assert_array_equal(np.asarray(out['violation_count']),
                                  np.asarray(viol_prod))
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


@pytest.mark.parametrize('quad_type', [2, 3])
def test_quad_constrained_replay_counts_violations(monkeypatch, quad_type):
    rk = _interpret(monkeypatch)
    goal = [0, 1] if quad_type == 2 else [0, 0, 1]
    env = make('quadrotor', quad_type=quad_type, seed=0, ctrl_freq=50,
               pyb_freq=1000, episode_len_sec=0.4, randomized_init=False,
               init_state={'init_z': 1.0},
               task_info={'stabilization_goal': goal,
                          'stabilization_goal_tolerance': 0.0},
               constraints=_BENCH_CONSTRAINTS)
    B, T = 64, 48
    nu = env.action_dim
    rng = np.random.default_rng(7)
    lo = env.physical_action_bounds[0][0]
    hi = env.physical_action_bounds[1][0]
    # 20% overshoot beyond the physical box: mixes input + state hits.
    actions = jnp.asarray(rng.uniform(1.2 * lo - 0.2 * hi, 1.2 * hi,
                                      (T, B, nu)), jnp.float32)

    func = env.func

    def body(carry, a):
        st, rew, dones, viol = carry
        st, out, _obs = func.step_autoreset(st, a, jax.random.PRNGKey(0))
        return (st, rew + out.reward, dones + out.done.astype(jnp.float32),
                viol + out.constraint_violation.astype(jnp.float32)), None

    states, _obs = func.reset_batch(jax.random.PRNGKey(4), B)
    z = jnp.zeros((B,), jnp.float32)
    (st_prod, rew_prod, done_prod, viol_prod), _ = jax.lax.scan(
        body, (states, z, z, z), actions)
    assert float(viol_prod.sum()) > 0

    cfg = rk._quad_rollout_cfg(env)
    roll = rk.quad2d_rollout_pallas if quad_type == 2 \
        else rk.quad3d_rollout_pallas
    out = roll(states.state, cfg, 0, T, env.PYB_STEPS_PER_CTRL,
               env.PYB_TIMESTEP, actions=jnp.swapaxes(actions, 1, 2),
               draw_actions=False, constrained=True, action_noise=False,
               randomized_reset=False)
    np.testing.assert_array_equal(np.asarray(out['violation_count']),
                                  np.asarray(viol_prod))
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


def test_cfg_builder_gates_unsupported():
    rk = pytest.importorskip('safe_control_gym_tpu.ops.rollout_kernels')
    env = _env(task='traj_tracking')
    with pytest.raises(ValueError):
        rk.cartpole_rollout_cfg(env)
    env.close()
    env = _env(randomized_inertial_prop=True)
    with pytest.raises(ValueError):
        rk.cartpole_rollout_cfg(env)
    env.close()
