"""Discrete-action PPO support (Categorical actor).

Parity target: the reference's MLPActorCritic builds a Categorical head for
``gym.spaces.Discrete`` action spaces (controllers/ppo/ppo_utils.py:150-236);
the same agent machinery must train on either head.
"""

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.ppo.ppo_utils import (
    PPOAgent, actor_dist, init_actor_critic)
from safe_control_gym_tpu.math.distributions import Categorical


def test_discrete_head_params_and_dist():
    params = init_actor_critic(jax.random.PRNGKey(0), obs_dim=4, act_dim=3,
                               hidden_dims=[16, 16], discrete=True)
    assert 'logstd' not in params
    dist = actor_dist(params, jnp.zeros((5, 4)))
    assert isinstance(dist, Categorical)
    a = dist.sample(jax.random.PRNGKey(1))
    assert a.shape == (5,)
    assert jnp.issubdtype(a.dtype, jnp.integer)
    # log_prob accepts both (...,) and (..., 1) index layouts.
    lp1 = dist.log_prob(a)
    lp2 = dist.log_prob(a[:, None])
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2))
    assert lp1.shape == (5, 1)


def test_discrete_agent_step_update_act():
    obs_space = gym.spaces.Box(-1.0, 1.0, shape=(4,))
    act_space = gym.spaces.Discrete(3)
    agent = PPOAgent(obs_space, act_space, hidden_dim=16, opt_epochs=2,
                     mini_batch_size=8, seed=0)
    assert agent.discrete and agent.act_dim == 3

    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (6, 4))
    a, v, lp = agent.step(np.asarray(obs), jax.random.PRNGKey(1))
    assert a.shape == (6,)
    assert set(np.unique(a)).issubset({0, 1, 2})
    assert v.shape == (6, 1) and lp.shape == (6, 1)

    M = 32
    k1, k2 = jax.random.split(key)
    batch = {
        'obs': jax.random.normal(k1, (M, 4)),
        'act': jax.random.randint(k2, (M, 1), 0, 3),
        'logp': jnp.full((M, 1), -1.1),
        'adv': jax.random.normal(k1, (M, 1)),
        'ret': jax.random.normal(k2, (M, 1)),
        'v': jnp.zeros((M, 1)),
    }
    losses = agent.update(batch, jax.random.PRNGKey(2))
    for name, val in losses.items():
        assert np.isfinite(val), name

    mode = agent.act(np.asarray(obs))
    assert mode.shape == (6,)
    assert set(np.unique(mode)).issubset({0.0, 1.0, 2.0})


def test_continuous_path_unchanged():
    obs_space = gym.spaces.Box(-1.0, 1.0, shape=(4,))
    act_space = gym.spaces.Box(-1.0, 1.0, shape=(2,))
    agent = PPOAgent(obs_space, act_space, hidden_dim=16, seed=0)
    assert not agent.discrete
    assert 'logstd' in agent.params
    a, v, lp = agent.step(np.zeros((3, 4), np.float32), jax.random.PRNGKey(0))
    assert a.shape == (3, 2) and lp.shape == (3, 1)
