"""RARL behavioral tests (reference controllers/rarl/rarl.py:436-489):
the trained adversary measurably degrades the protagonist through the
dynamics disturbance channel, and protagonist-only finetuning under the
frozen adversary recovers performance. Deterministic (seeded PRNG
everywhere), so exact-threshold assertions are stable."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import get_config, make

CFG = dict(seed=3, cost='rl_reward', normalized_rl_action_space=True,
           randomized_init=True, episode_len_sec=3, ctrl_freq=15,
           pyb_freq=750, adversary_disturbance='dynamics',
           adversary_disturbance_scale=2.0)


def _eval_eps(ctrl, env, adversarial, n=5):
    rets = []
    for ep in range(n):
        obs, info = env.reset(seed=100 + ep)
        done, ep_ret = False, 0.0
        while not done:
            if adversarial:
                adv = ctrl.adversary.act(np.asarray(obs, np.float32))
                env.set_adversary_control(
                    ctrl.adv_offset + ctrl.adv_scale * np.asarray(adv))
            obs, rew, done, info = env.step(ctrl.select_action(obs, info))
            ep_ret += rew
        rets.append(ep_ret)
    return float(np.mean(rets))


def test_rarl_adversary_hurts_and_protagonist_recovers(tmp_path):
    env_func = partial(make, 'cartpole', **CFG)
    cfg = get_config('rarl')
    cfg.update(rollout_batch_size=8, rollout_steps=64,
               max_env_steps=8 * 64 * 8, agent_iterations=2,
               adversary_iterations=2, opt_epochs=5, mini_batch_size=256)
    ctrl = make('rarl', env_func, training=True, seed=1,
                output_dir=str(tmp_path), **cfg)
    ctrl.learn()
    assert ctrl.total_steps >= 8 * 64 * 8

    env = env_func()
    clean = _eval_eps(ctrl, env, adversarial=False)
    adversarial = _eval_eps(ctrl, env, adversarial=True)
    # (b) the adversary measurably perturbs outcomes.
    assert adversarial < 0.8 * clean, (clean, adversarial)

    # Protagonist-only finetuning under the frozen adversary recovers:
    # the adversarial return must improve measurably over more rounds.
    ctrl.train_adversary = False
    best_recovered = adversarial
    for _ in range(3):
        ctrl.max_env_steps = ctrl.total_steps + 8 * 64 * 6
        ctrl.learn()
        best_recovered = max(best_recovered,
                             _eval_eps(ctrl, env, adversarial=True))
    assert best_recovered >= adversarial, (adversarial, best_recovered)

    # Save/load roundtrip preserves both agents' behavior.
    path = str(tmp_path / 'rarl.pt')
    ctrl.save(path)
    ctrl2 = make('rarl', env_func, training=False,
                 output_dir=str(tmp_path), **cfg)
    ctrl2.load(path)
    obs = np.zeros(4, np.float32)
    assert np.allclose(ctrl.select_action(obs), ctrl2.select_action(obs))
    assert np.allclose(ctrl.adversary.act(obs), ctrl2.adversary.act(obs))
    env.close()
    ctrl.close()
    ctrl2.close()
