"""Policy-in-kernel CLOSED-LOOP rollout (ops/rollout_kernels.py): the
actor MLP evaluated inside the whole-rollout Pallas kernel must reproduce
the production path — per-step XLA ``actor_dist(...).mode()`` +
``FuncEnv.step_autoreset`` — in deterministic mode under the CPU
interpreter. The stochastic mode (on-core Gaussian exploration) has no
CPU lowering; it is covered by the TPU statistical-equivalence tests
(tests/test_kernel_stochastic_tpu.py) and tools/policy_rollout_bench.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from safe_control_gym_tpu.controllers.ppo.ppo_utils import (actor_dist,
                                                            init_actor_critic)
from safe_control_gym_tpu.math.normalization import (NormalizerState,
                                                     rms_normalize)
from safe_control_gym_tpu.utils.registration import make


def _interpret(monkeypatch):
    import safe_control_gym_tpu.ops.rollout_kernels as rk
    monkeypatch.setattr(rk.pl, 'pallas_call',
                        functools.partial(pl.pallas_call, interpret=True))
    return rk


def _policy_production_rollout(env, states, params, T, obs_norm=None,
                               clip_obs=10.0, squash=False):
    """Per-step scan: deterministic policy action on the (normalized)
    state, production step + auto-reset; kernel-style stat accumulators."""
    func = env.func

    def body(carry, _):
        st, rew, dones = carry
        obs = st.state
        if obs_norm is not None:
            obs = rms_normalize(obs_norm, obs, clip_obs)
        act = actor_dist(params, obs).mode()
        if squash:
            act = jnp.tanh(act)
        st, out, _obs = func.step_autoreset(st, act, jax.random.PRNGKey(0))
        return (st, rew + out.reward,
                dones + out.done.astype(jnp.float32)), None

    B = states.state.shape[0]
    z = jnp.zeros((B,), jnp.float32)
    (st, rew, dones), _ = jax.lax.scan(body, (states, z, z), None, length=T)
    return st, rew, dones


def _cartpole(**over):
    kw = dict(seed=0, ctrl_freq=50, pyb_freq=1000, episode_len_sec=0.4,
              randomized_init=False, init_state={'init_x': 0.1},
              task_info={'stabilization_goal': [0],
                         'stabilization_goal_tolerance': 0.0})
    kw.update(over)
    return make('cartpole', **kw)


def test_cartpole_policy_rollout_matches_production(monkeypatch):
    rk = _interpret(monkeypatch)
    env = _cartpole()
    B, T = 128, 60
    params = init_actor_critic(jax.random.PRNGKey(7), 4, 1, [64, 64])
    states, _obs = env.func.reset_batch(jax.random.PRNGKey(1), B)

    st_prod, rew_prod, done_prod = _policy_production_rollout(
        env, states, params, T)

    cfg = rk.cartpole_rollout_cfg(env)
    rk.check_policy_obs(env)
    prefs = rk.pack_policy_params(params['actor'], nx=4, rows=8)
    out = rk.cartpole_rollout_pallas(
        states.state, cfg, 0, n_steps=T, n_substeps=env.PYB_STEPS_PER_CTRL,
        dt=env.PYB_TIMESTEP, draw_actions=False, randomized_reset=False,
        policy_params=prefs)

    np.testing.assert_allclose(np.asarray(out['state']),
                               np.asarray(st_prod.state),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


def test_cartpole_policy_obs_normalization_folding(monkeypatch):
    """Frozen rms obs normalization (the PPO eval path) folded into the
    kernel's per-row shift/scale + clip matches rms_normalize exactly."""
    rk = _interpret(monkeypatch)
    env = _cartpole()
    B, T = 64, 40
    params = init_actor_critic(jax.random.PRNGKey(9), 4, 1, [64, 64])
    mean = jnp.asarray([0.05, -0.1, 0.02, 0.3], jnp.float32)
    # Tiny variance on dim 3 forces the clip_obs bound to actually bind.
    var = jnp.asarray([0.5, 2.0, 0.1, 1e-4], jnp.float32)
    obs_norm = NormalizerState(mean=mean, var=var,
                               count=jnp.asarray(100.0))
    states, _obs = env.func.reset_batch(jax.random.PRNGKey(2), B)

    st_prod, rew_prod, done_prod = _policy_production_rollout(
        env, states, params, T, obs_norm=obs_norm, clip_obs=2.0)

    cfg = rk.cartpole_rollout_cfg(env)
    prefs = rk.pack_policy_params(params['actor'], nx=4, rows=8,
                                  obs_mean=mean, obs_var=var)
    out = rk.cartpole_rollout_pallas(
        states.state, cfg, 0, n_steps=T, n_substeps=env.PYB_STEPS_PER_CTRL,
        dt=env.PYB_TIMESTEP, draw_actions=False, randomized_reset=False,
        policy_params=prefs, clip_obs=2.0)

    np.testing.assert_allclose(np.asarray(out['state']),
                               np.asarray(st_prod.state),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


@pytest.mark.parametrize('quad_type', [2, 3])
def test_quad_policy_rollout_matches_production(monkeypatch, quad_type):
    rk = _interpret(monkeypatch)
    goal = [0, 1] if quad_type == 2 else [0, 0, 1]
    env = make('quadrotor', quad_type=quad_type, seed=0, ctrl_freq=50,
               pyb_freq=1000, episode_len_sec=0.4, randomized_init=False,
               init_state={'init_z': 1.0},
               task_info={'stabilization_goal': goal,
                          'stabilization_goal_tolerance': 0.0})
    B, T = 64, 48
    nx, nu = env.state_dim, env.action_dim
    params = init_actor_critic(jax.random.PRNGKey(11), nx, nu, [64, 64])
    states, _obs = env.func.reset_batch(jax.random.PRNGKey(3), B)

    # tanh-squashed output (the SAC deterministic-eval convention) keeps
    # normalized thrust commands inside the action box.
    st_prod, rew_prod, done_prod = _policy_production_rollout(
        env, states, params, T, squash=True)

    cfg = rk._quad_rollout_cfg(env)
    rk.check_policy_obs(env)
    prefs = rk.pack_policy_params(params['actor'], nx=nx, rows=16)
    roll = rk.quad2d_rollout_pallas if quad_type == 2 \
        else rk.quad3d_rollout_pallas
    out = roll(states.state, cfg, 0, T, env.PYB_STEPS_PER_CTRL,
               env.PYB_TIMESTEP, draw_actions=False, randomized_reset=False,
               policy_params=prefs, policy_squash=True)

    np.testing.assert_allclose(np.asarray(out['state']),
                               np.asarray(st_prod.state),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out['done_count']),
                                  np.asarray(done_prod))
    np.testing.assert_allclose(np.asarray(out['reward_sum']),
                               np.asarray(rew_prod), rtol=1e-4, atol=1e-4)
    env.close()


def test_check_policy_obs_gates():
    import safe_control_gym_tpu.ops.rollout_kernels as rk
    env = _cartpole(disturbances={'observation': [
        {'disturbance_func': 'white_noise', 'std': 0.01}]})
    with pytest.raises(ValueError):
        rk.check_policy_obs(env)
    env.close()
    env = _cartpole(obs_goal_horizon=1)
    with pytest.raises(ValueError):
        rk.check_policy_obs(env)
    env.close()


def test_pack_policy_params_validates():
    import safe_control_gym_tpu.ops.rollout_kernels as rk
    params = init_actor_critic(jax.random.PRNGKey(0), 4, 1, [32])
    with pytest.raises(ValueError):  # 1 hidden layer
        rk.pack_policy_params(params['actor'], nx=4, rows=8)
    params = init_actor_critic(jax.random.PRNGKey(0), 6, 1, [64, 64])
    with pytest.raises(ValueError):  # obs dim mismatch
        rk.pack_policy_params(params['actor'], nx=4, rows=8)
