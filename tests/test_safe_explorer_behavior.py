"""SafeExplorerPPO behavioral tests.

Covers the safety layer's two contracts (reference
controllers/safe_explorer/safe_explorer_utils.py:86-175): the per-constraint
sensitivity models learn the true action sensitivity from pretraining data,
and the closed-form projection keeps one-step constraint satisfaction where
the raw action would violate. Also rolls out the committed pretrained
artifact (reference CI loads safe_explorer_ppo models,
tests/test_examples/test_rl.py:8-21)."""

import os
from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import get_config, make

CFG = dict(seed=7, cost='rl_reward', normalized_rl_action_space=True,
           randomized_init=True, episode_len_sec=4, ctrl_freq=15,
           pyb_freq=750,
           constraints=[{'constraint_form': 'abs_bound',
                         'constrained_variable': 'state',
                         'bound': [1.5, 2.0, 0.3, 2.0]}],
           done_on_violation=False, done_on_out_of_bound=False)


def test_projection_prevents_violations():
    """Pretrained safety layer: pushing the cart past the velocity bound is
    corrected by the analytic projection — raw actions violate, projected
    actions don't (Dalal 2018 eqns 5-6 / safe_explorer_utils.py:120-175)."""
    env_func = partial(make, 'cartpole', **CFG)
    cfg = get_config('safe_explorer_ppo')
    cfg.update(rollout_batch_size=8, rollout_steps=32, max_env_steps=256,
               constraint_epochs=10, constraint_steps_per_epoch=4000,
               constraint_batch_size=256, constraint_lr=0.01,
               constraint_slack=[0.05] * 4)
    ctrl = make('safe_explorer_ppo', env_func, training=True, seed=0,
                output_dir='/tmp/se_behavior', **cfg)
    ctrl.reset()
    ctrl.pretrain_safety_layer()
    # The x_dot row's learned sensitivity must have the true sign/magnitude
    # (cartpole: dv ~ +0.6 per unit normalized action at dt=1/15).
    import jax.numpy as jnp
    probe = jnp.asarray(np.array([[0.0, 1.9, 0.0, 0.1]], np.float32))
    g = np.asarray(ctrl.safety_layer._g_all(ctrl.safety_layer.params, probe))
    g_xdot = float(g.reshape(4, -1)[1, 0])
    assert 0.3 < g_xdot < 1.0, g_xdot

    env = env_func()
    env.reset()
    rng = np.random.default_rng(0)
    raw_viol = safe_viol = 0
    n = 40
    for _ in range(n):
        x0 = np.array([0.2 * rng.standard_normal(),
                       1.8 + 0.15 * rng.random(),
                       0.05 * rng.standard_normal(),
                       0.2 * rng.standard_normal()], np.float32)
        env.reset()
        obs = env.set_state(x0)
        c = env.constraints.get_values(env, only_state=True)
        a_raw = np.array([0.95], np.float32)
        a_safe = np.asarray(ctrl.safety_layer.get_safe_action(
            obs[None, :4], a_raw[None], np.asarray(c)[None]))[0]
        _, _, _, info = env.step(a_raw)
        raw_viol += int(info['constraint_violation'])
        env.reset()
        env.set_state(x0)
        _, _, _, info2 = env.step(a_safe)
        safe_viol += int(info2['constraint_violation'])
    assert raw_viol >= 30, raw_viol            # the raw policy DOES violate
    assert safe_viol <= raw_viol // 4, (raw_viol, safe_viol)
    env.close()
    ctrl.close()


def test_pretrained_artifact_full_episode():
    """The committed safe_explorer_ppo cartpole artifact holds full
    violation-free episodes under its training config."""
    import yaml
    root = os.path.join(os.path.dirname(__file__), '..', 'examples')
    base = os.path.join(root, 'rl', 'config_overrides', 'cartpole')
    with open(os.path.join(base, 'cartpole_stab.yaml')) as f:
        task = yaml.safe_load(f)['task_config']
    with open(os.path.join(base, 'safe_explorer_ppo_cartpole.yaml')) as f:
        spec = yaml.safe_load(f)
    task.update(spec.get('task_config', {}))
    cfg = get_config('safe_explorer_ppo')
    cfg.update(spec['algo_config'])
    env_func = partial(make, 'cartpole', **task)
    ctrl = make('safe_explorer_ppo', env_func, training=False,
                output_dir='/tmp/se_eval', **cfg)
    ctrl.load(os.path.join(root, 'rl', 'models', 'safe_explorer_ppo',
                           'safe_explorer_ppo_model_cartpole_stab.pt'))
    from safe_control_gym_tpu.experiments.base_experiment import \
        BaseExperiment
    exp = BaseExperiment(env=env_func(), ctrl=ctrl)
    _, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
    exp.close()
    ctrl.close()
    assert metrics['average_length'] >= 240, metrics
    assert metrics['average_constraint_violation'] == 0, metrics
