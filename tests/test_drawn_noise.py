"""Batched pre-drawn disturbance noise (FuncEnv.step_autoreset fast path).

Every supported disturbance type is either stateless-with-noise
(uniform/white/periodic) or stateful-without-noise (impulse/step), so the
batched hot loop pre-draws each channel's randomness in ONE (batch, dim)
kernel instead of per-env key splits (reference channel semantics:
/root/reference/safe_control_gym/envs/disturbances.py:38-67,166-259).
These tests pin (a) distributional correctness of the drawn path, (b)
bit-equality with the keyed path for deterministic (stateful) specs, and
(c) that stateless disturbances now ride the fast auto-reset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import make

TI = {'stabilization_goal': [0.7, 0.0], 'stabilization_goal_tolerance': 0.0}


def _batch(env, n, seed=0):
    st, obs = jax.jit(lambda k: env.func.reset_batch(k, n))(
        jax.random.PRNGKey(seed))
    return st, obs


def test_white_noise_drawn_statistics():
    dist = {'action': [{'disturbance_func': 'white_noise', 'std': 0.5}]}
    env = make('cartpole', seed=1, disturbances=dist, randomized_init=False,
               task_info=TI)
    st, _ = _batch(env, 16)
    sar = jax.jit(env.func.step_autoreset)
    acts = jnp.zeros((16, 1))
    vals = []
    for i in range(200):
        st, out, _ = sar(st, acts, jax.random.PRNGKey(10 + i))
        vals.append(np.asarray(out.noisy_action))
    vals = np.stack(vals)
    # Per-env, per-step i.i.d. N(0, 0.5): distinct across envs, right moments.
    assert len(np.unique(vals[0].round(6))) > 12
    assert abs(vals.mean()) < 0.03
    assert abs(vals.std() - 0.5) < 0.02
    env.close()


def test_impulse_drawn_path_matches_keyed_step():
    # Impulse is deterministic per step (offset lives in dist state): the
    # drawn batched path must be bit-identical to vmap(step) on the same
    # states while no env is done.
    dist = {'action': [{'disturbance_func': 'impulse', 'magnitude': 3.0,
                        'step_offset': 2, 'duration': 4}]}
    env = make('cartpole', seed=0, disturbances=dist, randomized_init=False,
               task_info=TI)
    st, _ = _batch(env, 4)
    stk = st
    acts = jnp.zeros((4, 1))
    step_v = jax.jit(jax.vmap(env.func.step))
    sar = jax.jit(env.func.step_autoreset)
    for i in range(6):
        st, od, _ = sar(st, acts, jax.random.PRNGKey(100 + i))
        stk, ok = step_v(stk, acts)
        assert not np.asarray(od.done).any()
        np.testing.assert_array_equal(np.asarray(od.noisy_action),
                                      np.asarray(ok.noisy_action))
    # The impulse actually fired (magnitude reached the action).
    assert np.asarray(od.noisy_action).max() == pytest.approx(3.0)
    env.close()


def test_obs_noise_drawn_per_env_and_at_reset():
    dist = {'observation': [{'disturbance_func': 'white_noise', 'std': 0.1}]}
    env = make('cartpole', seed=0, disturbances=dist, randomized_init=False,
               task_info=TI)
    st, obs0 = _batch(env, 16)
    # Reset obs carries per-env noise (parity with _observe(at_reset=True)).
    assert len(np.unique(np.asarray(obs0)[:, 0].round(7))) > 8
    st, out, obs1 = jax.jit(env.func.step_autoreset)(
        st, jnp.zeros((16, 1)), jax.random.PRNGKey(5))
    d = np.asarray(out.obs) - np.asarray(out.state)
    assert len(np.unique(d[:, 0].round(7))) > 8
    assert d.std() == pytest.approx(0.1, abs=0.05)
    env.close()


def test_stateless_disturbance_rides_fast_autoreset():
    # With only stateless disturbances the auto-reset must preserve
    # disturbance behavior across episode boundaries AND re-randomize init
    # states (the fast path touches only state/ctrl_step).
    dist = {'action': [{'disturbance_func': 'uniform',
                        'low': 0.1, 'high': 0.2}]}
    env = make('cartpole', seed=3, disturbances=dist, randomized_init=True,
               episode_len_sec=0.2, task_info=TI)  # 3-step episodes @15Hz
    n = 8
    st, _ = _batch(env, n)
    sar = jax.jit(env.func.step_autoreset)
    acts = jnp.zeros((n, 1))
    saw_done = False
    for i in range(12):
        st, out, _ = sar(st, acts, jax.random.PRNGKey(i))
        noise = np.asarray(out.noisy_action)
        assert (noise >= 0.1 - 1e-6).all() and (noise <= 0.2 + 1e-6).all()
        if np.asarray(out.done).any():
            saw_done = True
            # Counter reset for done envs only.
            assert (np.asarray(st.ctrl_step)[np.asarray(out.done)] == 0).all()
    assert saw_done
    env.close()


def test_periodic_noise_drawn_matches_envelope():
    freq, scale = 2.0, 0.7
    dist = {'action': [{'disturbance_func': 'periodic', 'scale': scale,
                        'frequency': freq}]}
    env = make('cartpole', seed=0, disturbances=dist, randomized_init=False,
               task_info=TI)
    st, _ = _batch(env, 32)
    st, out, _ = jax.jit(env.func.step_autoreset)(
        st, jnp.zeros((32, 1)), jax.random.PRNGKey(0))
    noise = np.asarray(out.noisy_action)
    # sin with random phase: bounded by scale, distinct per env.
    assert (np.abs(noise) <= scale + 1e-6).all()
    assert len(np.unique(noise.round(6))) > 16
    env.close()


def test_reset_batch_per_env_keys_with_disturbances():
    # With disturbances, reset_batch must hand every env a distinct key so
    # vmap(func.step) (the non-drawn consumer) gets independent noise.
    dist = {'action': [{'disturbance_func': 'white_noise', 'std': 1.0}]}
    env = make('cartpole', seed=0, disturbances=dist, randomized_init=False,
               task_info=TI)
    st, _ = _batch(env, 8)
    keys = np.asarray(jax.random.key_data(st.key)
                      if jnp.issubdtype(st.key.dtype, jax.dtypes.prng_key)
                      else st.key)
    assert len({tuple(k) for k in keys.reshape(8, -1)}) == 8
    _, out = jax.jit(jax.vmap(env.func.step))(st, jnp.zeros((8, 1)))
    assert len(np.unique(np.asarray(out.noisy_action).round(6))) > 4
    env.close()
