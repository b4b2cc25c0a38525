"""Ablate the full-env-step overhead vs the Pallas physics ceiling.

Variants (all 4096 envs x 8192-step fused scans, cartpole 50/1000 Hz):
  full         - the bench.py workload (step + action RNG + auto-reset)
  noreset      - step + action RNG, no auto-reset
  cachedreset  - auto-reset reuses ONE precomputed fresh state pytree
  noactrng     - constant actions, no auto-reset (pure step cost)
  physonly     - raw 20-substep physics advance only
"""
import json
import time

import jax
try:
    jax.config.update('jax_default_prng_impl', 'rbg')
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

N_ENVS = 4096
N_STEPS = 8192


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return N_ENVS * N_STEPS / best / 1e6


def main():
    from safe_control_gym_tpu.utils.registration import make
    env = make('cartpole', seed=0, ctrl_freq=50, pyb_freq=1000,
               episode_len_sec=5)
    func = env.func
    reset_v = jax.vmap(func.reset)
    step_v = jax.vmap(func.step)
    keys = jax.random.split(jax.random.PRNGKey(0), N_ENVS)
    states0, _ = reset_v(keys)

    def scan_over(body):
        def run(states, key):
            (states, key), out = jax.lax.scan(body, (states, key), None,
                                              length=N_STEPS)
            return out.sum()
        return jax.jit(run)

    # full
    def body_full(carry, _):
        states, key = carry
        key, k_act, k_reset = jax.random.split(key, 3)
        actions = jax.random.uniform(k_act, (N_ENVS, 1), minval=-10., maxval=10.)
        states, out = step_v(states, actions)
        reset_keys = jax.random.split(k_reset, N_ENVS)
        fresh, _ = reset_v(reset_keys)
        states = jax.tree.map(
            lambda f, s: jnp.where(out.done.reshape((N_ENVS,) + (1,) * (s.ndim - 1)), f, s)
            if s.ndim >= 1 else jnp.where(out.done, f, s), fresh, states)
        return (states, key), out.reward.sum()

    # no reset
    def body_noreset(carry, _):
        states, key = carry
        key, k_act = jax.random.split(key)
        actions = jax.random.uniform(k_act, (N_ENVS, 1), minval=-10., maxval=10.)
        states, out = step_v(states, actions)
        return (states, key), out.reward.sum()

    # cached reset
    fresh0, _ = reset_v(jax.random.split(jax.random.PRNGKey(7), N_ENVS))
    def body_cached(carry, _):
        states, key = carry
        key, k_act = jax.random.split(key)
        actions = jax.random.uniform(k_act, (N_ENVS, 1), minval=-10., maxval=10.)
        states, out = step_v(states, actions)
        states = jax.tree.map(
            lambda f, s: jnp.where(out.done.reshape((N_ENVS,) + (1,) * (s.ndim - 1)), f, s)
            if s.ndim >= 1 else jnp.where(out.done, f, s), fresh0, states)
        return (states, key), out.reward.sum()

    # constant actions
    const_act = jnp.ones((N_ENVS, 1)) * 2.0
    def body_noactrng(carry, _):
        states, key = carry
        states, out = step_v(states, const_act)
        return (states, key), out.reward.sum()

    results = {}
    for name, body in [('full', body_full), ('noreset', body_noreset),
                       ('cachedreset', body_cached),
                       ('noactrng', body_noactrng)]:
        results[name] = round(timeit(scan_over(body), states0,
                                     jax.random.PRNGKey(1)), 1)
        print(name, results[name], 'M steps/s', flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
