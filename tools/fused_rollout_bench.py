"""Measure the whole-rollout Pallas kernel on the real TPU.

Same workload as bench.py's production rows (4096 envs, ctrl 50 Hz /
pyb 1000 Hz, random actions, with/without constraints+disturbances) but
the entire T-step loop is ONE kernel launch (ops/rollout_kernels.py) —
per-step dispatch, pack/unpack, and RNG launches all disappear.

Timing protocol (stricter than bench.py's, because this kernel is fast
enough that the remote-TPU tunnel's constant dispatch+fetch cost — ~35 ms
measured as a no-op round trip — dominates short programs):

* every timed run fetches a value to the host (``block_until_ready`` alone
  measured UNRELIABLE on the remote axon backend for pallas outputs: it
  can return in ~40 us while the device still computes);
* each row reports BOTH the end-to-end amortized rate at the long T
  (includes the tunnel round trip — the honest wall-clock number) and the
  device-only rate from a two-point slope in T (cancels the constant
  tunnel cost — the on-chip kernel throughput).

Run SOLO (CLAUDE.md measurement rule): concurrent jobs poison the number
through host contention.
"""

import argparse
import json
import os
import time

os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')

import jax
import jax.numpy as jnp

from safe_control_gym_tpu.utils.utils import enable_persistent_compile_cache


def _timed(roll_fn, state0, cfg, kw, n_steps, n_reps):
    kw = dict(kw, n_steps=n_steps)
    out = roll_fn(state0, cfg, 1, **kw)
    warm = (float(out['done_count'].mean()),
            float(out['reward_sum'].mean()),
            float(out['violation_count'].mean()))
    best = float('inf')
    for i in range(n_reps):
        t0 = time.perf_counter()
        out = roll_fn(state0, cfg, 2 + i, **kw)
        float(jnp.sum(out['reward_sum']))  # force device completion + fetch
        best = min(best, time.perf_counter() - t0)
    return best, warm


def measure(system, constrained, batch, n_steps, n_reps):
    from safe_control_gym_tpu.experiments.benchmark_suite import _env_kwargs
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    from safe_control_gym_tpu.utils.registration import make

    env = make(system.replace('_3D', ''), **_env_kwargs(system, constrained))
    cfg_fn, roll_fn = {
        'cartpole': (rk.cartpole_rollout_cfg, rk.cartpole_rollout_pallas),
        'quadrotor': (rk.quad2d_rollout_cfg, rk.quad2d_rollout_pallas),
        'quadrotor_3D': (rk.quad3d_rollout_cfg, rk.quad3d_rollout_pallas),
    }[system]
    cfg = cfg_fn(env)
    states, _ = jax.jit(lambda k: env.func.reset_batch(k, batch))(
        jax.random.PRNGKey(0))
    kw = dict(n_substeps=env.PYB_STEPS_PER_CTRL, dt=env.PYB_TIMESTEP,
              draw_actions=True, constrained=constrained,
              randomized_reset=bool(env.RANDOMIZED_INIT))
    if constrained:
        std = float(jnp.atleast_1d(
            env.disturbances['action'].disturbances[0].std)[0])
        cfg = cfg.at[(rk._C if system == 'cartpole' else rk._Q)
                     ['NOISE_STD']].set(std)
    t_short, _ = _timed(roll_fn, states.state, cfg, kw, n_steps // 8, n_reps)
    t_long, warm = _timed(roll_fn, states.state, cfg, kw, n_steps, n_reps)
    dc, rs, vc = warm
    # Sanity on the RNG path: episodes terminate and reset, rewards land
    # in (0, T].
    assert dc > 0 and 0 < rs <= n_steps, (system, dc, rs)
    env.close()
    slope = (t_long - t_short) / (n_steps - n_steps // 8)
    return dict(amortized=batch * n_steps / t_long,
                device_slope=batch / slope,
                mean_done_count=dc, mean_reward_sum=rs,
                mean_violation_count=vc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4096)
    p.add_argument('--steps', type=int, default=32768)
    p.add_argument('--reps', type=int, default=3)
    p.add_argument('--systems', nargs='*',
                   default=['cartpole', 'quadrotor', 'quadrotor_3D'])
    args = p.parse_args()
    enable_persistent_compile_cache()
    for system in args.systems:
        for constrained in (False, True):
            r = measure(system, constrained, args.batch, args.steps,
                        args.reps)
            workload = ('constraints+disturbances, random actions'
                        if constrained else 'random actions')
            print(json.dumps({
                'metric': (f'{system} fused-rollout kernel steps/sec/chip '
                           f'({args.batch} envs, 50/1000Hz, {workload})'),
                'value': round(r['amortized'], 1),
                'unit': 'ctrl steps/s',
                'device_slope_steps_per_sec': round(r['device_slope'], 1),
                'mean_done_count': round(r['mean_done_count'], 2),
                'mean_reward_sum': round(r['mean_reward_sum'], 1),
                'mean_violation_count': round(r['mean_violation_count'], 3),
            }), flush=True)


if __name__ == '__main__':
    main()
