"""Multi-chip (8-device CPU mesh) sharded TRAINING — beyond the one-step
dryrun: PPO and SAC train for multiple iterations with the env batch
sharded over the mesh and parameters replicated, composing with the
``fused_iterations`` scan. Parameters must stay replica-consistent (the
gradient reductions really cross the mesh as collectives) and training
must actually improve the policy."""

from functools import partial

import jax
import numpy as np
import pytest

from safe_control_gym_tpu.parallel.sharding import make_env_mesh
from safe_control_gym_tpu.utils.registration import get_config, make

CFG = dict(cost='rl_reward', normalized_rl_action_space=True,
           episode_len_sec=3, ctrl_freq=15, pyb_freq=750,
           randomized_init=True)


def _replica_consistent(tree):
    for leaf in jax.tree.leaves(tree):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            if not np.array_equal(s, shards[0]):
                return False
    return True


def _eval_return(ctrl, n=4):
    res = ctrl.run(n_episodes=n)
    return float(np.mean(res['ep_returns']))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_ppo_sharded_fused_training(tmp_path):
    mesh = make_env_mesh(8)
    env_func = partial(make, 'cartpole', seed=5, **CFG)
    cfg = get_config('ppo')
    cfg.update(rollout_batch_size=16, rollout_steps=32, opt_epochs=3,
               mini_batch_size=128, fused_iterations=2,
               max_env_steps=16 * 32 * 12, actor_lr=3e-4, critic_lr=1e-3)
    ctrl = make('ppo', env_func, training=True, seed=2,
                output_dir=str(tmp_path), **cfg)
    ctrl.reset()
    r_before = _eval_return(ctrl)
    ctrl.shard_over(mesh)
    # Env state really is sharded over the mesh.
    assert not ctrl._obs.sharding.is_fully_replicated
    ctrl.learn()
    assert ctrl.total_steps >= cfg['max_env_steps']   # >=3 fused dispatches
    # Replicated consistency: every chip holds identical parameters — the
    # minibatch-mean gradients crossed the mesh as psum collectives.
    assert _replica_consistent(ctrl.agent.params)
    assert _replica_consistent(ctrl.agent.actor_opt_state)
    r_after = _eval_return(ctrl)
    assert np.isfinite(r_after)
    assert r_after > r_before, (r_before, r_after)
    ctrl.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sac_sharded_fused_training(tmp_path):
    mesh = make_env_mesh(8)
    env_func = partial(make, 'cartpole', seed=5, **CFG)
    cfg = get_config('sac')
    cfg.update(rollout_batch_size=8, train_interval=64, train_batch_size=128,
               warm_up_steps=512, max_buffer_size=20000,
               fused_iterations=2, max_env_steps=6000)
    ctrl = make('sac', env_func, training=True, seed=2,
                output_dir=str(tmp_path), **cfg)
    ctrl.reset()
    r_before = _eval_return(ctrl)
    ctrl.shard_over(mesh)
    assert not ctrl._obs.sharding.is_fully_replicated
    ctrl.learn()
    assert ctrl.total_steps >= 6000
    ts = ctrl.agent.train_state()
    assert _replica_consistent(ts)
    r_after = _eval_return(ctrl)
    assert np.isfinite(r_after)
    assert r_after > r_before, (r_before, r_after)
    ctrl.close()


ADV_CFG = dict(cost='rl_reward', normalized_rl_action_space=True,
               episode_len_sec=3, ctrl_freq=15, pyb_freq=750,
               randomized_init=True, adversary_disturbance='dynamics',
               adversary_disturbance_scale=1.0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_rarl_sharded_fused_training(tmp_path):
    """Adversarial training over the mesh: env batch sharded, BOTH agents'
    params replicated and updated through cross-chip gradient psums,
    composed with the fused multi-cycle scan."""
    mesh = make_env_mesh(8)
    env_func = partial(make, 'cartpole', seed=5, **ADV_CFG)
    cfg = get_config('rarl')
    cfg.update(rollout_batch_size=16, rollout_steps=32, agent_iterations=1,
               adversary_iterations=1, opt_epochs=2, mini_batch_size=128,
               fused_iterations=2, max_env_steps=16 * 32 * 2 * 2 * 2,
               log_interval=0)
    ctrl = make('rarl', env_func, training=True, seed=2,
                output_dir=str(tmp_path), **cfg)
    ctrl.reset()
    a0 = np.asarray(ctrl.adversary.params['logstd'])
    ctrl.shard_over(mesh)
    assert not ctrl._obs.sharding.is_fully_replicated
    ctrl.learn()
    assert ctrl.total_steps >= cfg['max_env_steps']
    assert _replica_consistent(ctrl.agent.params)
    assert _replica_consistent(ctrl.adversary.params)
    assert _replica_consistent(ctrl.adversary.actor_opt_state)
    assert not np.allclose(a0, np.asarray(ctrl.adversary.params['logstd']))
    assert np.isfinite(_eval_return(ctrl, n=2))
    ctrl.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_rap_sharded_fused_training(tmp_path):
    """Population training over the mesh: the in-scan assignment gather
    crosses shards; every member stays replica-consistent."""
    mesh = make_env_mesh(8)
    env_func = partial(make, 'cartpole', seed=5, **ADV_CFG)
    cfg = get_config('rap')
    cfg.update(rollout_batch_size=16, rollout_steps=32, agent_iterations=1,
               adversary_iterations=1, opt_epochs=2, mini_batch_size=128,
               fused_iterations=2, max_env_steps=16 * 32 * 2 * 2 * 2,
               num_adversaries=2, log_interval=0)
    ctrl = make('rap', env_func, training=True, seed=2,
                output_dir=str(tmp_path), **cfg)
    ctrl.reset()
    ctrl.shard_over(mesh)
    assert not ctrl._obs.sharding.is_fully_replicated
    ctrl.learn()
    assert ctrl.total_steps >= cfg['max_env_steps']
    assert _replica_consistent(ctrl.agent.params)
    for adv in ctrl.adversaries:
        assert _replica_consistent(adv.params)
    assert np.isfinite(_eval_return(ctrl, n=2))
    ctrl.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_ppo_tensor_parallel_training_matches_single_device(tmp_path):
    """dp x tp: actor/critic weights megatron-partitioned over the 'model'
    mesh axis (parallel/sharding.py mlp_tp_shardings) while the env batch
    shards over 'env'. The distributed run must (a) really place hidden
    weights across model shards, (b) keep env-axis replicas consistent,
    and (c) reproduce the single-device training result — XLA's inserted
    psum collectives are exact up to f32 reduction order."""
    from safe_control_gym_tpu.parallel.sharding import make_dp_tp_mesh

    cfg = get_config('ppo')
    cfg.update(rollout_batch_size=16, rollout_steps=32, opt_epochs=2,
               mini_batch_size=128, fused_iterations=2,
               max_env_steps=16 * 32 * 4, actor_lr=3e-4, critic_lr=1e-3)

    def build(out):
        env_func = partial(make, 'cartpole', seed=5, **CFG)
        ctrl = make('ppo', env_func, training=True, seed=2,
                    output_dir=str(out), **cfg)
        ctrl.reset()
        return ctrl

    ref = build(tmp_path / 'single')
    ref.learn()
    p_ref = jax.tree.map(np.asarray, ref.agent.params)
    ref.close()

    ctrl = build(tmp_path / 'tp')
    mesh = make_dp_tp_mesh(n_model=2, n_devices=8)
    ctrl.shard_over(mesh, model_axis='model')
    w0 = ctrl.agent.params['actor'][0]['w']
    assert not w0.sharding.is_fully_replicated          # (a) tp is real
    assert len(w0.sharding.device_set) == 8
    ctrl.learn()
    # (b) env-axis replicas of each model shard identical.
    by_model = {}
    for s in ctrl.agent.params['actor'][0]['w'].addressable_shards:
        by_model.setdefault(str(s.index), []).append(np.asarray(s.data))
    assert len(by_model) == 2                           # two model shards
    for reps in by_model.values():
        assert len(reps) == 4                           # four env replicas
        for r in reps[1:]:
            assert np.array_equal(r, reps[0])
    # (c) numerically the same training trajectory as one device.
    p_tp = jax.tree.map(np.asarray, ctrl.agent.params)
    for l_ref, l_tp in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_tp)):
        np.testing.assert_allclose(l_tp, l_ref, rtol=0, atol=5e-5)
    ctrl.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sac_tensor_parallel_training_matches_single_device(tmp_path):
    """dp x tp for the off-policy stack: actor + twin-Q + target nets
    megatron-partitioned over 'model', replay/env batch over 'env'.

    Horizon note: past ~512 env steps single-vs-sharded diverges to 1e-2
    REGARDLESS of tp (measured: dp-only 3.27e-2 vs dp x tp 3.21e-2 at 768
    steps; both <=1.4e-5 at 512) — f32 reduction-order noise amplified by
    the off-policy feedback loop (params -> behavior actions -> replay
    contents -> bootstrapped min-Q targets). Equivalence is asserted at a
    horizon where it is meaningful."""
    from safe_control_gym_tpu.parallel.sharding import make_dp_tp_mesh

    cfg = get_config('sac')
    cfg.update(rollout_batch_size=8, train_interval=32, train_batch_size=64,
               warm_up_steps=256, max_buffer_size=4000,
               fused_iterations=1, max_env_steps=512)

    def build(out):
        env_func = partial(make, 'cartpole', seed=5, **CFG)
        ctrl = make('sac', env_func, training=True, seed=2,
                    output_dir=str(out), **cfg)
        ctrl.reset()
        return ctrl

    ref = build(tmp_path / 'single')
    ref.learn()
    p_ref = jax.tree.map(np.asarray, ref.agent.params)
    ref.close()

    ctrl = build(tmp_path / 'tp')
    mesh = make_dp_tp_mesh(n_model=2, n_devices=8)
    ctrl.shard_over(mesh, model_axis='model')
    w0 = ctrl.agent.params['q1'][0]['w']
    assert not w0.sharding.is_fully_replicated
    assert len(w0.sharding.device_set) == 8
    ctrl.learn()
    # env-axis replicas of each model shard identical; model shards real.
    by_model = {}
    for s in ctrl.agent.params['q1'][0]['w'].addressable_shards:
        by_model.setdefault(str(s.index), []).append(np.asarray(s.data))
    assert len(by_model) == 2
    for reps in by_model.values():
        for r in reps[1:]:
            assert np.array_equal(r, reps[0])
    p_tp = jax.tree.map(np.asarray, ctrl.agent.params)
    for l_ref, l_tp in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_tp)):
        np.testing.assert_allclose(l_tp, l_ref, rtol=0, atol=5e-5)
    ctrl.close()
