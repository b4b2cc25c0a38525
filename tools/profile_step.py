"""Ablate the full-env-step overhead vs the Pallas physics ceiling.

Variants (all 4096 envs x fused scans, ctrl 50 Hz / pyb 1000 Hz):
  full         - the bench.py workload (step + action RNG + auto-reset)
  noreset      - step + action RNG, no auto-reset
  cachedreset  - auto-reset reuses ONE precomputed fresh state pytree
  noactrng     - constant actions, no auto-reset (pure step cost)
  physonly     - raw 20-substep physics advance only (the Pallas kernel
                 ceiling on TPU; the XLA substep scan elsewhere)

Usage: python tools/profile_step.py [cartpole|quadrotor_2D|quadrotor_3D]
Prints one M-steps/s line per variant + a JSON summary (the source of
PERFORMANCE.md's ablation tables).
"""
import json
import sys
import time

import jax
try:
    jax.config.update('jax_default_prng_impl', 'rbg')
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

N_ENVS = 4096


def timeit(fn, *args, n_steps):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return N_ENVS * n_steps / best / 1e6


def make_env(system):
    from safe_control_gym_tpu.utils.registration import make
    kw = dict(seed=0, ctrl_freq=50, pyb_freq=1000, episode_len_sec=5)
    if system == 'quadrotor_2D':
        kw.update(quad_type=2, randomized_init=False,
                  init_state={'init_z': 1.0},
                  task_info={'stabilization_goal': [0, 1],
                             'stabilization_goal_tolerance': 0.0})
    elif system == 'quadrotor_3D':
        kw.update(quad_type=3, randomized_init=False,
                  init_state={'init_z': 1.0},
                  task_info={'stabilization_goal': [0, 0, 1],
                             'stabilization_goal_tolerance': 0.0})
    name = 'quadrotor' if system.startswith('quadrotor') else system
    return make(name, **kw)


def main(system='cartpole'):
    # The 12-state 3D kernel is heavier; a shorter scan keeps each timed
    # rep ~seconds while still amortizing dispatch far below 1%.
    n_steps = 4096 if system == 'quadrotor_3D' else 8192
    env = make_env(system)
    func = env.func
    act_dim = func.act_dim
    reset_v = jax.vmap(func.reset)
    step_v = jax.vmap(func.step)
    keys = jax.random.split(jax.random.PRNGKey(0), N_ENVS)
    states0, _ = reset_v(keys)
    lo = jnp.asarray(env.action_space.low, jnp.float32)
    hi = jnp.asarray(env.action_space.high, jnp.float32)
    mid = jnp.broadcast_to((lo + hi) / 2, (N_ENVS, act_dim))

    def scan_over(body):
        def run(states, key):
            (states, key), out = jax.lax.scan(body, (states, key), None,
                                              length=n_steps)
            return out.sum()
        return jax.jit(run)

    # full
    def body_full(carry, _):
        states, key = carry
        key, k_act, k_reset = jax.random.split(key, 3)
        actions = lo + (hi - lo) * jax.random.uniform(
            k_act, (N_ENVS, act_dim))
        states, out = step_v(states, actions)
        reset_keys = jax.random.split(k_reset, N_ENVS)
        fresh, _ = reset_v(reset_keys)
        states = jax.tree.map(
            lambda f, s: jnp.where(
                out.done.reshape((N_ENVS,) + (1,) * (s.ndim - 1)), f, s)
            if s.ndim >= 1 else jnp.where(out.done, f, s), fresh, states)
        return (states, key), out.reward.sum()

    # no reset
    def body_noreset(carry, _):
        states, key = carry
        key, k_act = jax.random.split(key)
        actions = lo + (hi - lo) * jax.random.uniform(
            k_act, (N_ENVS, act_dim))
        states, out = step_v(states, actions)
        return (states, key), out.reward.sum()

    # cached reset
    fresh0, _ = reset_v(jax.random.split(jax.random.PRNGKey(7), N_ENVS))
    def body_cached(carry, _):
        states, key = carry
        key, k_act = jax.random.split(key)
        actions = lo + (hi - lo) * jax.random.uniform(
            k_act, (N_ENVS, act_dim))
        states, out = step_v(states, actions)
        states = jax.tree.map(
            lambda f, s: jnp.where(
                out.done.reshape((N_ENVS,) + (1,) * (s.ndim - 1)), f, s)
            if s.ndim >= 1 else jnp.where(out.done, f, s), fresh0, states)
        return (states, key), out.reward.sum()

    # constant actions, no auto-reset (pure env step)
    def body_noactrng(carry, _):
        states, key = carry
        states, out = step_v(states, mid)
        return (states, key), out.reward.sum()

    # physics only: the raw substep advance (Pallas kernel on TPU),
    # stripped of the action pipeline / reward / done / obs logic.
    dyn_dim = env.DISTURBANCE_MODES.get('dynamics', {'dim': 1})['dim']
    zero_f = jnp.zeros((dyn_dim,), jnp.float32)
    adv = env._advance_pure
    dp1 = jax.tree.map(lambda l: l[0], states0.dyn_params)
    mid1 = (lo + hi) / 2

    def phys_run(x0, _key):
        def body(x, _):
            x = jax.vmap(lambda xi: adv(xi, mid1, zero_f, dp1))(x)
            return x, ()
        x, _ = jax.lax.scan(body, x0, None, length=n_steps)
        return x.sum()

    results = {}
    for name, body in [('full', body_full), ('noreset', body_noreset),
                       ('cachedreset', body_cached),
                       ('noactrng', body_noactrng)]:
        results[name] = round(timeit(scan_over(body), states0,
                                     jax.random.PRNGKey(1), n_steps=n_steps),
                              1)
        print(system, name, results[name], 'M steps/s', flush=True)
    results['physonly'] = round(timeit(jax.jit(phys_run), states0.state,
                                       jax.random.PRNGKey(1),
                                       n_steps=n_steps), 1)
    print(system, 'physonly', results['physonly'], 'M steps/s', flush=True)
    print(json.dumps({'system': system, 'n_envs': N_ENVS,
                      'n_steps': n_steps, **results}))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'cartpole')
