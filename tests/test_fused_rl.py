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


ADV_CFG = dict(seed=3, cost='rl_reward', normalized_rl_action_space=True,
               randomized_init=True, episode_len_sec=3, ctrl_freq=15,
               pyb_freq=750, adversary_disturbance='dynamics',
               adversary_disturbance_scale=1.0)


def test_fused_rarl_trains(tmp_path):
    """K whole (protagonist + adversary) RARL cycles in one dispatch."""
    cfg = get_config('rarl')
    cfg.update(rollout_batch_size=4, rollout_steps=16, agent_iterations=1,
               adversary_iterations=1, opt_epochs=2, mini_batch_size=32,
               fused_iterations=2, max_env_steps=4 * 16 * 2 * 2,
               log_interval=0)
    ctrl = make('rarl', partial(make, 'cartpole', **ADV_CFG), training=True,
                seed=1, output_dir=str(tmp_path), **cfg)
    p0 = np.asarray(ctrl.agent.params['logstd'])
    a0 = np.asarray(ctrl.adversary.params['logstd'])
    ctrl.learn()
    assert ctrl.total_steps >= cfg['max_env_steps']
    assert not np.allclose(p0, np.asarray(ctrl.agent.params['logstd']))
    assert not np.allclose(a0, np.asarray(ctrl.adversary.params['logstd']))
    # Flag flip retraces (static arg): frozen adversary stays frozen.
    ctrl.train_adversary = False
    a1 = np.asarray(ctrl.adversary.params['logstd'])
    ctrl.max_env_steps = ctrl.total_steps + 4 * 16 * 2 * 2
    ctrl.learn()
    assert np.allclose(a1, np.asarray(ctrl.adversary.params['logstd']))
    res = ctrl.run(n_episodes=1)
    assert np.isfinite(res['ep_returns']).all()
    ctrl.close()


def test_fused_rap_trains(tmp_path):
    """Fused RAP: in-scan balanced assignment + vmapped population update
    moves EVERY member, and members diverge (distinct batches/keys)."""
    cfg = get_config('rap')
    cfg.update(rollout_batch_size=8, rollout_steps=16, agent_iterations=1,
               adversary_iterations=1, opt_epochs=2, mini_batch_size=32,
               fused_iterations=2, max_env_steps=8 * 16 * 2 * 2,
               num_adversaries=2, log_interval=0)
    ctrl = make('rap', partial(make, 'cartpole', **ADV_CFG), training=True,
                seed=1, output_dir=str(tmp_path), **cfg)
    before = [np.asarray(a.params['actor'][-1]['b'])
              for a in ctrl.adversaries]
    ctrl.learn()
    assert ctrl.total_steps >= cfg['max_env_steps']
    after = [np.asarray(a.params['actor'][-1]['b'])
             for a in ctrl.adversaries]
    for b, a in zip(before, after):
        assert not np.allclose(b, a), 'population member did not train'
    assert not np.allclose(after[0], after[1]), \
        'population members should diverge'
    for a in ctrl.adversaries:
        for leaf in np.asarray(a.params['logstd']).ravel():
            assert np.isfinite(leaf)
    ctrl.close()


def test_fused_safe_explorer_trains(tmp_path):
    """Fused safety-projected PPO iterations in one dispatch."""
    se_cfg_env = dict(seed=7, cost='rl_reward',
                      normalized_rl_action_space=True, randomized_init=True,
                      episode_len_sec=3, ctrl_freq=15, pyb_freq=750,
                      constraints=[{'constraint_form': 'abs_bound',
                                    'constrained_variable': 'state',
                                    'bound': [1.5, 2.0, 0.3, 2.0]}],
                      done_on_violation=False, done_on_out_of_bound=False)
    cfg = get_config('safe_explorer_ppo')
    cfg.update(rollout_batch_size=4, rollout_steps=16, opt_epochs=2,
               mini_batch_size=32, fused_iterations=3,
               max_env_steps=4 * 16 * 3, constraint_epochs=1,
               constraint_steps_per_epoch=64, constraint_batch_size=32,
               log_interval=0)
    ctrl = make('safe_explorer_ppo', partial(make, 'cartpole', **se_cfg_env),
                training=True, seed=0, output_dir=str(tmp_path), **cfg)
    p0 = np.asarray(ctrl.agent.params['logstd'])
    ctrl.learn()
    assert ctrl.total_steps >= cfg['max_env_steps']
    assert not np.allclose(p0, np.asarray(ctrl.agent.params['logstd']))
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
