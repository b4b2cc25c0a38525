"""Reproduction of the reference's headline benchmark protocol.

The reference's README performance table (README.md:169-193) measures
"speed-up = elapsed simulated time / elapsed wall-clock time" under
open-loop random actions for cartpole and quadrotor, with and without
constraints + disturbances. This module runs the same protocol on the
TPU-native envs — both single-env (apples-to-apples with the reference's
numbers) and batched (the TPU-native operating point) — and prints a
markdown table.

Run: python -m safe_control_gym_tpu.experiments.benchmark_suite [--batch N]
"""

from __future__ import annotations

import argparse
import time

import jax

# Hardware RNG: same choice as bench.py (threefry bit-gen was ~1/3 of the
# env-step cost on v5e).
try:
    jax.config.update('jax_default_prng_impl', 'rbg')
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.utils.registration import make

# Reference numbers (README.md:181-189, i7-1068NG7 CPU, no GUI).
REFERENCE_SPEEDUPS = {
    ('cartpole', False): 24.73,
    ('cartpole', True): 22.39,
    ('quadrotor', False): 9.28,
    ('quadrotor', True): 7.62,
}

CONSTRAINTS = {
    'cartpole': [{'constraint_form': 'default_constraint',
                  'constrained_variable': 'state'},
                 {'constraint_form': 'default_constraint',
                  'constrained_variable': 'input'}],
    'quadrotor': [{'constraint_form': 'default_constraint',
                   'constrained_variable': 'state'},
                  {'constraint_form': 'default_constraint',
                   'constrained_variable': 'input'}],
}

DISTURBANCES = {'action': [{'disturbance_func': 'white_noise', 'std': 0.1}]}


def _env_kwargs(system, constrained, tracking=False):
    kw = dict(seed=0, ctrl_freq=50, pyb_freq=1000, episode_len_sec=5)
    if system == 'quadrotor':
        kw.update(quad_type=2, randomized_init=False,
                  init_state={'init_z': 1.0},
                  task_info={'stabilization_goal': [0, 1],
                             'stabilization_goal_tolerance': 0.0})
    if system == 'quadrotor_3D':
        kw.update(quad_type=3, randomized_init=False,
                  init_state={'init_z': 1.0},
                  task_info={'stabilization_goal': [0, 0, 1],
                             'stabilization_goal_tolerance': 0.0})
    if tracking:
        # The reference's tracking benchmark task (circle reference,
        # e.g. examples/mpc/.../cartpole_track.yaml).
        kw.update(task='traj_tracking', task_info={
            'trajectory_type': 'circle', 'num_cycles': 1,
            'trajectory_plane': 'zx',
            'trajectory_position_offset': [0.5, 0] if system != 'cartpole'
            else [0, 0],
            'trajectory_scale': -0.5 if system != 'cartpole' else 0.2})
    if constrained:
        kw.update(constraints=CONSTRAINTS[system.replace('_3D', '')],
                  disturbances=DISTURBANCES)
    return kw


def measure_single_env(system, constrained, n_steps=2000):
    """Single env, host-loop stepping — the reference's exact protocol."""
    env = make(system.replace('_3D', ''), **_env_kwargs(system, constrained))
    env.reset()
    rng = np.random.default_rng(0)
    lo, hi = env.action_space.low, env.action_space.high
    # Warm up the jitted step.
    env.step(rng.uniform(lo, hi).astype(np.float32))
    env.reset()
    t0 = time.perf_counter()
    steps = 0
    for _ in range(n_steps):
        action = rng.uniform(lo, hi).astype(np.float32)
        _, _, done, _ = env.step(action)
        steps += 1
        if done:
            env.reset()
    wall = time.perf_counter() - t0
    sim_time = steps * env.CTRL_TIMESTEP
    env.close()
    return sim_time / wall, steps / wall


def kernel_covers(system, constrained, tracking=False):
    """True when the whole-rollout kernel covers this benchmark config.

    The documented coverage gate is the cfg builder (it raises ValueError
    outside coverage); probing it separately lets callers fall back to the
    per-step scan WITHOUT swallowing ValueErrors raised by the actual
    kernel run (which would mask real regressions)."""
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    env = make(system.replace('_3D', ''),
               **_env_kwargs(system, constrained, tracking))
    try:
        cfg_fn = {'cartpole': rk.cartpole_rollout_cfg,
                  'quadrotor': rk.quad2d_rollout_cfg,
                  'quadrotor_3D': rk.quad3d_rollout_cfg}[system]
        cfg_fn(env)
        return True
    except ValueError:
        return False
    finally:
        env.close()


def measure_rollout_kernel(system, constrained, batch=4096, n_steps=32768,
                           n_reps=3, tracking=False):
    """Whole-rollout Pallas kernel — the full open-loop workload in ONE
    kernel launch (ops/rollout_kernels.py).

    Same semantics as ``measure_batched``'s workload (action pipeline,
    20 substeps, reward/done/constraints, batched auto-reset; replay mode
    is equivalence-tested against ``FuncEnv.step_autoreset`` in
    tests/test_rollout_kernel.py) but with zero per-step dispatch: the
    state lives in VMEM across ``grid=(T,)`` steps and the on-core PRNG
    draws actions/noise/resets. Raises ValueError for env configurations
    the kernel does not cover (callers fall back to ``measure_batched``).

    Returns ``(speedup, steps_per_sec, extras)`` where ``steps_per_sec``
    is the end-to-end amortized rate (includes the one dispatch+fetch
    round trip — the honest wall-clock number) and ``extras`` carries the
    device-only two-point-slope rate plus episode-statistics sanity
    values from the warm-up run.
    """
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    env = make(system.replace('_3D', ''),
               **_env_kwargs(system, constrained, tracking))
    try:
        cfg_fn, roll_fn, cidx = {
            'cartpole': (rk.cartpole_rollout_cfg, rk.cartpole_rollout_pallas,
                         rk._C),
            'quadrotor': (rk.quad2d_rollout_cfg, rk.quad2d_rollout_pallas,
                          rk._Q),
            'quadrotor_3D': (rk.quad3d_rollout_cfg, rk.quad3d_rollout_pallas,
                             rk._Q),
        }[system]
        cfg = cfg_fn(env)  # ValueError when the config is outside the kernel
        if constrained:
            std = float(jnp.atleast_1d(
                env.disturbances['action'].disturbances[0].std)[0])
            cfg = cfg.at[cidx['NOISE_STD']].set(std)
        states, _ = jax.jit(lambda k: env.func.reset_batch(k, batch))(
            jax.random.PRNGKey(0))
        state0 = states.state
        kw = dict(n_substeps=env.PYB_STEPS_PER_CTRL, dt=env.PYB_TIMESTEP,
                  draw_actions=True, constrained=constrained,
                  randomized_reset=bool(env.RANDOMIZED_INIT),
                  **rk.rollout_task_kwargs(env))

        def timed(t_steps):
            # Warm-up run: absorbs the compile AND validates the episode
            # statistics BEFORE any timing, so a broken kernel can never
            # report numbers (explicit raise — asserts strip under -O).
            out = roll_fn(state0, cfg, 1, n_steps=t_steps, **kw)
            warm = (float(out['done_count'].mean()),
                    float(out['reward_sum'].mean()),
                    float(out['violation_count'].mean()))
            dc, rs, _ = warm
            if not (dc > 0 and 0 < rs <= t_steps):
                raise RuntimeError(
                    'rollout kernel sanity check failed: '
                    f'{system} constrained={constrained} done_count={dc} '
                    f'reward_sum={rs} over {t_steps} steps')
            best = float('inf')
            for i in range(n_reps):
                t0 = time.perf_counter()
                out = roll_fn(state0, cfg, 2 + i, n_steps=t_steps, **kw)
                # MUST fetch a value: bare block_until_ready measured
                # unreliable for pallas outputs on the remote axon backend
                # (returns while the device still computes).
                float(jnp.sum(out['reward_sum']))
                best = min(best, time.perf_counter() - t0)
            return best, warm

        t_short, _ = timed(n_steps // 8)
        t_long, (dc, rs, vc) = timed(n_steps)
        slope = (t_long - t_short) / (n_steps - n_steps // 8)
        steps_per_sec = batch * n_steps / t_long
        sim_time = batch * n_steps * env.CTRL_TIMESTEP
        extras = dict(device_slope_steps_per_sec=batch / slope,
                      mean_done_count=dc, mean_reward_sum=rs,
                      mean_violation_count=vc)
        return sim_time / t_long, steps_per_sec, extras
    finally:
        env.close()


def measure_closed_loop_kernel(system, batch=4096, n_steps=8192, n_reps=3,
                               hidden=64):
    """Closed-loop policy-in-kernel rollout — the RL collect/eval workload
    (actor MLP forward + full env step per control step), stochastic
    Gaussian exploration from the on-core PRNG: ONE kernel launch for the
    whole T-step rollout (ops/rollout_kernels.py policy mode). This is
    the workload class the per-step scan served at ~3x lower throughput
    (reference rollout machinery: subproc_vec_env.py:20-64,
    ppo.py:259-303, ~1.2k steps/s).

    Returns ``(steps_per_sec, extras)`` like ``measure_rollout_kernel``.
    """
    import jax.numpy as jnp

    from safe_control_gym_tpu.controllers.ppo.ppo_utils import \
        init_actor_critic
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    env = make(system.replace('_3D', ''), **_env_kwargs(system, False))
    try:
        nx, nu = env.state_dim, env.action_dim
        params = init_actor_critic(jax.random.PRNGKey(0), nx, nu,
                                   [hidden] * 2)
        cfg_fn, roll_fn, rows, cidx = {
            'cartpole': (rk.cartpole_rollout_cfg, rk.cartpole_rollout_pallas,
                         8, rk._C),
            'quadrotor': (rk.quad2d_rollout_cfg, rk.quad2d_rollout_pallas,
                          16, rk._Q),
            'quadrotor_3D': (rk.quad3d_rollout_cfg, rk.quad3d_rollout_pallas,
                             16, rk._Q),
        }[system]
        cfg = cfg_fn(env)
        rk.check_policy_obs(env)
        std = jnp.exp(params['logstd'])
        cfg = jax.lax.dynamic_update_slice(cfg, std, (cidx['P_STD'],))
        prefs = rk.pack_policy_params(params['actor'], nx=nx, rows=rows)
        states, _ = jax.jit(lambda k: env.func.reset_batch(k, batch))(
            jax.random.PRNGKey(1))
        state0 = states.state
        kw = dict(n_substeps=env.PYB_STEPS_PER_CTRL, dt=env.PYB_TIMESTEP,
                  draw_actions=False, randomized_reset=False,
                  policy_params=prefs, policy_stochastic=True)

        def timed(t_steps):
            out = roll_fn(state0, cfg, 1, n_steps=t_steps, **kw)
            warm = (float(out['done_count'].mean()),
                    float(out['reward_sum'].mean()))
            dc, rs = warm
            if not (dc > 0 and 0 < rs <= t_steps):
                raise RuntimeError(
                    'closed-loop kernel sanity check failed: '
                    f'{system} done_count={dc} reward_sum={rs}')
            best = float('inf')
            for i in range(n_reps):
                t0 = time.perf_counter()
                out = roll_fn(state0, cfg, 2 + i, n_steps=t_steps, **kw)
                float(jnp.sum(out['reward_sum']))
                best = min(best, time.perf_counter() - t0)
            return best, warm

        t_short, _ = timed(n_steps // 8)
        t_long, (dc, rs) = timed(n_steps)
        slope = (t_long - t_short) / (n_steps - n_steps // 8)
        extras = dict(device_slope_steps_per_sec=batch / slope,
                      mean_done_count=dc, mean_reward_sum=rs)
        return batch * n_steps / t_long, extras
    finally:
        env.close()


def measure_batched(system, constrained, batch=4096, n_steps=4096,
                    n_reps=3, unroll=1):
    """Batched fused rollout — the TPU-native operating point.

    ``unroll`` unrolls the scan body: the hot loop is launch-latency
    bound (PERFORMANCE.md roofline), so replicating the body lets XLA
    overlap/fuse the small inter-step glue ops (auto-reset selects,
    action slicing) across iterations at the cost of a proportionally
    larger program."""
    env = make(system.replace('_3D', ''), **_env_kwargs(system, constrained))
    func = env.func
    reset_v = jax.vmap(func.reset)
    step_v = jax.vmap(func.step)
    act_dim = func.act_dim
    lo = jnp.asarray(env.action_space.low, jnp.float32)
    hi = jnp.asarray(env.action_space.high, jnp.float32)

    def rollout(states, key):
        # Hoist the per-step RNG out of the scan: ONE (T, B, act) uniform
        # kernel + T pre-split reset keys as scan xs, instead of 3 key
        # splits + an RNG launch per iteration (measured on v5e: 207 ->
        # 223M steps/s at 4096 envs; the per-step launches were ~2 us of a
        # ~20 us batch step). Identical distribution — random actions and
        # iid reset draws per step.
        k_act, k_reset = jax.random.split(key)
        actions = jax.random.uniform(k_act, (n_steps, batch, act_dim),
                                     minval=lo, maxval=hi)
        reset_keys = jax.random.split(k_reset, n_steps)

        def body(states, xs):
            a, kr = xs
            # Fused step + batched auto-reset (FuncEnv.step_autoreset).
            states, out, _obs = func.step_autoreset(states, a, kr)
            # Per-step reduction keeps the scan output O(T), not O(T x B).
            return states, out.reward.sum()

        states, rewards = jax.lax.scan(body, states, (actions, reset_keys),
                                       unroll=unroll)
        return states, rewards.sum()

    rollout_jit = jax.jit(rollout, donate_argnums=(0,))
    reset_batch_jit = jax.jit(lambda k: func.reset_batch(k, batch))
    states, _ = reset_batch_jit(jax.random.PRNGKey(0))
    states, r = rollout_jit(states, jax.random.PRNGKey(1))
    jax.block_until_ready(r)
    best = float('inf')
    for i in range(n_reps):
        states, _ = reset_batch_jit(jax.random.PRNGKey(2 + i))
        t0 = time.perf_counter()
        states, r = rollout_jit(states, jax.random.PRNGKey(10 + i))
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    total_steps = batch * n_steps
    sim_time = total_steps * env.CTRL_TIMESTEP
    env.close()
    return sim_time / best, total_steps / best


def run(batch=4096, single_steps=2000, skip_single=False):
    # NOTE: under the remote-TPU tunnel every single-env step pays the
    # dispatch round-trip; run the single-env protocol on the CPU backend
    # (JAX_PLATFORMS=cpu / jax_platforms config) for an apples-to-apples
    # host number, and the batched protocol on the TPU.
    rows = []
    # quadrotor_3D has no published reference row — shown for completeness.
    for system in ('cartpole', 'quadrotor', 'quadrotor_3D'):
        for constrained in ((False, True) if system != 'quadrotor_3D'
                            else (False,)):
            ref = REFERENCE_SPEEDUPS.get((system, constrained),
                                         float('nan'))
            if skip_single:
                su1, sps1 = float('nan'), float('nan')
            else:
                su1, sps1 = measure_single_env(system, constrained,
                                               n_steps=single_steps)
            sub, spsb = measure_batched(system, constrained, batch=batch)
            rows.append((system, constrained, ref, su1, sps1, sub, spsb))
    print('| system | constraints+dist | reference speed-up | single-env '
          'speed-up | batched speed-up | batched steps/s |')
    print('|---|---|---|---|---|---|')
    import math
    for system, c, ref, su1, sps1, sub, spsb in rows:
        ref_s = 'n/a' if math.isnan(ref) else f'{ref:.2f}x'
        su1_s = ('n/a' if math.isnan(su1)
                 else f'{su1:.1f}x ({sps1:,.0f}/s)')
        print(f'| {system} | {"yes" if c else "no"} | {ref_s} | '
              f'{su1_s} | {sub:,.0f}x | {spsb:,.0f} |')
    return rows


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=4096)
    parser.add_argument('--single_steps', type=int, default=2000)
    parser.add_argument('--skip_single', action='store_true')
    args = parser.parse_args()
    run(batch=args.batch, single_steps=args.single_steps,
        skip_single=args.skip_single)
