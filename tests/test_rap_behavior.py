"""RAP behavioral tests (reference controllers/rarl/rap.py + rarl_utils
split_obs_by_adversary semantics): the env batch is split across the
adversary population in a balanced way, each env's adversary action comes
from its ASSIGNED member, and training updates every member on its own
slice."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.utils.registration import get_config, make

CFG = dict(seed=3, cost='rl_reward', normalized_rl_action_space=True,
           randomized_init=True, episode_len_sec=3, ctrl_freq=15,
           pyb_freq=750, adversary_disturbance='dynamics',
           adversary_disturbance_scale=1.0)


def _make_rap(tmp_path, **over):
    env_func = partial(make, 'cartpole', **CFG)
    cfg = get_config('rap')
    cfg.update(rollout_batch_size=8, rollout_steps=16,
               max_env_steps=8 * 16 * 2, agent_iterations=1,
               adversary_iterations=1, opt_epochs=2, mini_batch_size=64)
    cfg.update(over)
    cfg['num_adversaries'] = 2
    return make('rap', env_func, training=True, seed=1,
                output_dir=str(tmp_path), **cfg)


def test_rap_assignment_balanced(tmp_path):
    ctrl = _make_rap(tmp_path)
    for _ in range(5):
        assign = np.asarray(ctrl._sample_assignment())
        counts = np.bincount(assign, minlength=ctrl.num_adversaries)
        assert (counts == ctrl.N // ctrl.num_adversaries).all(), counts
    ctrl.close()


def test_rap_gather_routes_assigned_adversary(tmp_path):
    """Rig each population member to a distinct constant output; every env's
    recorded adversary action must equal its assigned member's constant."""
    ctrl = _make_rap(tmp_path)
    consts = [-0.5, 0.5]
    for k, adv in enumerate(ctrl.adversaries):
        actor = [{'w': jnp.zeros_like(l['w']), 'b': jnp.zeros_like(l['b'])}
                 for l in adv.params['actor']]
        actor[-1]['b'] = jnp.full_like(actor[-1]['b'], consts[k])
        adv.params = {**adv.params, 'actor': actor,
                      'logstd': jnp.full_like(adv.params['logstd'], -10.0)}
    ctrl.reset()
    assign = ctrl._sample_assignment()
    (_, _, _, _, a_data, _) = ctrl._pop_rollout_jit(
        ctrl.agent.params, ctrl._stacked_adv_params(), assign,
        ctrl._env_states, ctrl._obs, ctrl._next_key())
    a_act = np.asarray(a_data['act'])          # (T, N, adv_dim)
    expected = np.asarray([consts[k] for k in np.asarray(assign)])
    assert np.allclose(a_act, expected[None, :, None], atol=1e-3), \
        (a_act[0].ravel(), expected)
    ctrl.close()


def test_rap_learn_updates_every_member(tmp_path):
    ctrl = _make_rap(tmp_path)
    before = [jax.tree.map(np.asarray, a.params) for a in ctrl.adversaries]
    prot_before = jax.tree.map(np.asarray, ctrl.agent.params)
    ctrl.learn()
    assert ctrl.total_steps >= ctrl.max_env_steps

    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert changed(prot_before, ctrl.agent.params)
    for prev, adv in zip(before, ctrl.adversaries):
        assert changed(prev, adv.params)
    # Evaluation path still runs.
    res = ctrl.run(n_episodes=1)
    assert np.isfinite(res['ep_returns']).all()
    ctrl.close()
