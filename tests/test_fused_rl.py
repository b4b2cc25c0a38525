"""Fused multi-iteration RL training programs (fused_iterations=K)."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import get_config, make


def _env_func():
    return partial(make, 'cartpole', seed=0, normalized_rl_action_space=True)


def test_fused_ppo_trains():
    cfg = get_config('ppo')
    cfg.update(max_env_steps=2000, rollout_batch_size=4, rollout_steps=25,
               mini_batch_size=50, opt_epochs=2, fused_iterations=4,
               norm_obs=True, norm_reward=True, eval_interval=0,
               log_interval=0, save_interval=0)
    ctrl = make('ppo', _env_func(), training=True, seed=0,
                output_dir='/tmp/fusedppo', **cfg)
    p0 = np.asarray(ctrl.agent.params['logstd'])
    ctrl.learn()
    assert ctrl.total_steps >= 2000
    assert not np.allclose(p0, np.asarray(ctrl.agent.params['logstd']))
    res = ctrl.run(n_episodes=2)
    assert np.isfinite(res['ep_returns']).all()
    ctrl.close()


def test_fused_sac_trains():
    cfg = get_config('sac')
    cfg.update(max_env_steps=1500, warm_up_steps=300, train_interval=100,
               train_batch_size=32, rollout_batch_size=4,
               max_buffer_size=10000, fused_iterations=3, eval_interval=0,
               log_interval=0, save_interval=0)
    ctrl = make('sac', _env_func(), training=True, seed=0,
                output_dir='/tmp/fusedsac', **cfg)
    ctrl.learn()
    assert ctrl.total_steps >= 1500
    res = ctrl.run(n_episodes=2)
    assert np.isfinite(res['ep_returns']).all()
    ctrl.close()


def test_fused_ddpg_trains():
    cfg = get_config('ddpg')
    cfg.update(max_env_steps=1200, warm_up_steps=300, train_interval=100,
               train_batch_size=32, rollout_batch_size=4,
               max_buffer_size=10000, fused_iterations=3, eval_interval=0,
               log_interval=0, save_interval=0)
    ctrl = make('ddpg', _env_func(), training=True, seed=0,
                output_dir='/tmp/fusedddpg', **cfg)
    ctrl.learn()
    assert ctrl.total_steps >= 1200
    ctrl.close()


def test_fd_func_casadi_call_style():
    """fd_func accepts the reference's cs.integrator style (x0=, p=)."""
    import jax.numpy as jnp
    env = make('cartpole', seed=0)
    x = jnp.asarray([0.1, 0.0, 0.05, 0.0])
    u = jnp.asarray([1.0])
    a = np.asarray(env.symbolic.fd_func(x, u))
    b = np.asarray(env.symbolic.fd_func(x0=x, p=u))
    np.testing.assert_allclose(a, b)
    env.close()
