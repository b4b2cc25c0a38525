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


_TRACK_TASK_INFO = {
    'trajectory_type': 'circle', 'num_cycles': 1, 'trajectory_plane': 'zx',
    'trajectory_position_offset': [0, 0], 'trajectory_scale': 0.2,
}


def _track_env(**over):
    kw = dict(seed=0, ctrl_freq=50, pyb_freq=1000, episode_len_sec=1.0,
              randomized_init=False, init_state={'init_x': 0.0},
              task='traj_tracking', task_info=dict(_TRACK_TASK_INFO))
    kw.update(over)
    return make('cartpole', **kw)


@pytest.mark.parametrize('cost', ['rl_reward', 'quadratic'])
def test_tracking_replay_matches_production(monkeypatch, cost):
    """TRAJ_TRACKING replay: each env reads its OWN time-indexed waypoint
    (the one-hot MXU gather) — including after out-of-bounds auto-resets
    desynchronize the batch — for both the RL reward (X_GOAL[step+1]) and
    the quadratic cost (X_GOAL[step], cartpole reference quirk)."""
    rk = _interpret(monkeypatch)
    env = _track_env(cost=cost)
    B, T = 64, 70  # past the 50-step episode: time-limit resets + desync
    rng = np.random.default_rng(8)
    # Strong enough to tip some envs over (OOB desync), not all.
    actions = jnp.asarray(rng.uniform(-5.0, 5.0, (T, B)), jnp.float32)

    states, _obs = env.func.reset_batch(jax.random.PRNGKey(5), B)
    st_prod, rew_prod, done_prod, _ = _production_rollout(env, states,
                                                          actions)
    # Resets must not be batch-synchronized, or the per-env gather is
    # untested (grid-index streaming would pass): envs that tipped over
    # early sit at a different ctrl_step than time-limit survivors.
    assert float(st_prod.ctrl_step.max()) > float(st_prod.ctrl_step.min())

    cfg = rk.cartpole_rollout_cfg(env)
    kw = rk.rollout_task_kwargs(env)
    assert kw['x_goal'].shape == np.atleast_2d(env.X_GOAL).shape
    out = rk.cartpole_rollout_pallas(
        states.state, cfg, 0, n_steps=T, n_substeps=env.PYB_STEPS_PER_CTRL,
        dt=env.PYB_TIMESTEP, actions=actions, draw_actions=False,
        randomized_reset=False, **kw)
    np.testing.assert_allclose(np.asarray(out['state']),
                               np.asarray(st_prod.state), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


def test_quadratic_cost_stabilization_replay(monkeypatch):
    """Cost.QUADRATIC (-symbolic loss: 0.5*diag(Q)/(R) weights, CLIPPED
    action error vs U_GOAL, no exponential) matches the production step."""
    rk = _interpret(monkeypatch)
    env = _env(cost='quadratic', episode_len_sec=2.0)
    B, T = 64, 40
    rng = np.random.default_rng(9)
    # Beyond the +-10 N physical bound: the clip before the action error
    # must match (a noisy-action bug would show here).
    actions = jnp.asarray(rng.uniform(-12.0, 12.0, (T, B)), jnp.float32)

    states, _obs = env.func.reset_batch(jax.random.PRNGKey(6), B)
    st_prod, rew_prod, done_prod, _ = _production_rollout(env, states,
                                                          actions)
    cfg = rk.cartpole_rollout_cfg(env)
    out = rk.cartpole_rollout_pallas(
        states.state, cfg, 0, n_steps=T, n_substeps=env.PYB_STEPS_PER_CTRL,
        dt=env.PYB_TIMESTEP, actions=actions, draw_actions=False,
        randomized_reset=False, quadratic_cost=True)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


@pytest.mark.parametrize('quad_type,cost', [
    (2, 'rl_reward'), (2, 'quadratic'), (3, 'rl_reward')])
def test_quad_tracking_replay(monkeypatch, quad_type, cost):
    """Quad tracking replay (X_GOAL[step+1] for BOTH costs,
    quadrotor.py:819-862), 2D circle / 3D figure-8."""
    rk = _interpret(monkeypatch)
    task_info = {'trajectory_type': 'circle', 'num_cycles': 1,
                 'trajectory_plane': 'zx',
                 'trajectory_position_offset': [0.5, 0],
                 'trajectory_scale': -0.5}
    if quad_type == 3:
        task_info = {'trajectory_type': 'figure8', 'num_cycles': 1,
                     'trajectory_plane': 'xy',
                     'trajectory_position_offset': [0, 0],
                     'trajectory_scale': 0.75,
                     'proj_point': [0, 0, 0.5], 'proj_normal': [0, 1, 1]}
    env = make('quadrotor', quad_type=quad_type, seed=0, ctrl_freq=50,
               pyb_freq=1000, episode_len_sec=1.0, randomized_init=False,
               init_state={'init_z': 0.5}, cost=cost,
               task='traj_tracking', task_info=task_info)
    B, T = 64, 70
    nu = env.action_dim
    rng = np.random.default_rng(10)
    lo = env.physical_action_bounds[0][0]
    hi = env.physical_action_bounds[1][0]
    actions = jnp.asarray(rng.uniform(lo, hi, (T, B, nu)), jnp.float32)

    func = env.func

    def body(carry, a):
        st, rew, dones = carry
        st, out, _obs = func.step_autoreset(st, a, jax.random.PRNGKey(0))
        return (st, rew + out.reward,
                dones + out.done.astype(jnp.float32)), None

    states, _obs = func.reset_batch(jax.random.PRNGKey(7), B)
    z = jnp.zeros((B,), jnp.float32)
    (st_prod, rew_prod, done_prod), _ = jax.lax.scan(
        body, (states, z, z), actions)
    # Desynchronized resets (see the cartpole test).
    assert float(st_prod.ctrl_step.max()) > float(st_prod.ctrl_step.min())

    cfg = rk._quad_rollout_cfg(env)
    kw = rk.rollout_task_kwargs(env)
    assert kw['x_goal'].shape == np.atleast_2d(env.X_GOAL).shape
    roll = rk.quad2d_rollout_pallas if quad_type == 2 \
        else rk.quad3d_rollout_pallas
    out = roll(states.state, cfg, 0, T, env.PYB_STEPS_PER_CTRL,
               env.PYB_TIMESTEP, actions=jnp.swapaxes(actions, 1, 2),
               draw_actions=False, randomized_reset=False, **kw)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['state']),
                               np.asarray(st_prod.state),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


def test_cfg_builder_gates_unsupported():
    rk = pytest.importorskip('safe_control_gym_tpu.ops.rollout_kernels')
    env = _env(randomized_inertial_prop=True)
    with pytest.raises(ValueError):
        rk.cartpole_rollout_cfg(env)
    env.close()
    # Tracking is now covered: the cfg builds and rollout_task_kwargs
    # supplies the goal table.
    env = _track_env()
    rk.cartpole_rollout_cfg(env)
    assert rk.rollout_task_kwargs(env)['x_goal'].ndim == 2
    env.close()
