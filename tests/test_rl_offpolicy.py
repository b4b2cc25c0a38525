"""SAC / DDPG training smoke tests + replay buffer unit tests."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.off_policy_utils import (
    replay_init, replay_push, replay_sample)
from safe_control_gym_tpu.utils.registration import get_config, make


def test_replay_ring_semantics():
    buf = replay_init({'obs': 2, 'rew': 1}, max_size=8)
    batch = {'obs': jnp.arange(12.0).reshape(6, 2),
             'rew': jnp.arange(6.0).reshape(6, 1)}
    buf = replay_push(buf, batch)
    assert int(buf.ptr) == 6
    buf = replay_push(buf, batch)  # wraps around
    assert int(buf.ptr) == 4
    assert int(buf.count) == 12
    s = replay_sample(buf, jax.random.PRNGKey(0), 32)
    assert s['obs'].shape == (32, 2)


def test_sac_learns_cartpole():
    cfg = get_config('sac')
    env_func = partial(make, 'cartpole', normalized_rl_action_space=True)
    ctrl = make('sac', env_func, output_dir='/tmp/sac_pytest', seed=0,
                **{**cfg, 'max_env_steps': 5000, 'warm_up_steps': 1000,
                   'rollout_batch_size': 8, 'train_interval': 100,
                   'train_batch_size': 64, 'max_buffer_size': 20000})
    ctrl.reset()
    ctrl.learn()
    res = ctrl.run(n_episodes=3)
    # After 5k steps SAC should be clearly better than random (~20).
    assert res['ep_returns'].mean() > 25
    # Checkpoint round trip.
    ctrl.save('/tmp/sac_pytest/ckpt.pt')
    obs = np.full(4, 0.05, np.float32)
    a1 = ctrl.select_action(obs)
    ctrl2 = make('sac', env_func, output_dir='/tmp/sac_pytest', seed=3,
                 **{**cfg, 'max_env_steps': 5000, 'rollout_batch_size': 8,
                    'max_buffer_size': 20000})
    ctrl2.load('/tmp/sac_pytest/ckpt.pt')
    assert np.allclose(ctrl2.select_action(obs), a1, atol=1e-6)
    ctrl.close()
    ctrl2.close()


def test_ddpg_trains_without_collapse():
    cfg = get_config('ddpg')
    env_func = partial(make, 'cartpole', normalized_rl_action_space=True)
    ctrl = make('ddpg', env_func, output_dir='/tmp/ddpg_pytest', seed=0,
                **{**cfg, 'max_env_steps': 4000, 'warm_up_steps': 1000,
                   'rollout_batch_size': 8, 'train_interval': 200,
                   'train_batch_size': 64, 'max_buffer_size': 20000,
                   'actor_lr': 0.0003})
    ctrl.reset()
    ctrl.learn()
    # Actor must not be saturated at the action bound after training.
    a = ctrl.select_action(np.zeros(4, np.float32))
    assert abs(float(a[0])) < 0.999
    res = ctrl.run(n_episodes=3)
    assert np.isfinite(res['ep_returns']).all()
    ctrl.close()
