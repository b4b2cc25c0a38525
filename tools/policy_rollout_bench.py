"""Closed-loop policy rollout throughput: policy-in-kernel vs per-step scan.

Measures the workload RL training and policy evaluation actually run —
MLP actor forward + full env step per control step — three ways:

  1. policy-in-kernel whole-rollout Pallas kernel (ONE launch, state in
     VMEM, actor dots on the MXU, exploration noise from the on-core PRNG);
  2. the production per-step fused scan (XLA actor + FuncEnv.step_autoreset
     under lax.scan) — what PPO/SAC `learn()` rode before round 5;
  3. two-point slope of (1) to separate device throughput from the ~35 ms
     remote-tunnel round trip (MEASUREMENT RULE, CLAUDE.md).

Run SOLO on the real chip:  python tools/policy_rollout_bench.py [--stochastic]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update('jax_default_prng_impl', 'rbg')
except Exception:
    pass

from safe_control_gym_tpu.controllers.ppo.ppo_utils import (actor_dist,
                                                            init_actor_critic)
from safe_control_gym_tpu.ops import rollout_kernels as rk
from safe_control_gym_tpu.utils.registration import make
from safe_control_gym_tpu.utils.utils import enable_persistent_compile_cache

enable_persistent_compile_cache()

SYSTEMS = {
    'cartpole': dict(kw=dict(), kernel=rk.cartpole_rollout_pallas,
                     cfg=rk.cartpole_rollout_cfg, rows=8),
    'quadrotor_2D': dict(kw=dict(quad_type=2, init_state={'init_z': 1.0},
                                 task_info={'stabilization_goal': [0, 1],
                                            'stabilization_goal_tolerance': 0.0}),
                         kernel=rk.quad2d_rollout_pallas,
                         cfg=rk.quad2d_rollout_cfg, rows=16),
    'quadrotor_3D': dict(kw=dict(quad_type=3, init_state={'init_z': 1.0},
                                 task_info={'stabilization_goal': [0, 0, 1],
                                            'stabilization_goal_tolerance': 0.0}),
                         kernel=rk.quad3d_rollout_pallas,
                         cfg=rk.quad3d_rollout_cfg, rows=16),
}


def measure(system, batch=4096, n_steps=8192, n_reps=3, stochastic=False,
            scan_steps=2048, hidden=64):
    spec = SYSTEMS[system]
    env_id = 'quadrotor' if system.startswith('quad') else system
    env = make(env_id, seed=0, ctrl_freq=50, pyb_freq=1000,
               episode_len_sec=5, randomized_init=False, **spec['kw'])
    try:
        nx, nu = env.state_dim, env.action_dim
        params = init_actor_critic(jax.random.PRNGKey(0), nx, nu, [hidden] * 2)
        cfg = spec['cfg'](env)
        rk.check_policy_obs(env)
        if stochastic:
            idx = rk._C if system == 'cartpole' else rk._Q
            std = jnp.exp(params['logstd'])
            cfg = jax.lax.dynamic_update_slice(cfg, std, (idx['P_STD'],))
        prefs = rk.pack_policy_params(params['actor'], nx=nx,
                                      rows=spec['rows'])
        states, _ = jax.jit(lambda k: env.func.reset_batch(k, batch))(
            jax.random.PRNGKey(1))
        state0 = states.state
        kw = dict(n_substeps=env.PYB_STEPS_PER_CTRL, dt=env.PYB_TIMESTEP,
                  draw_actions=False, randomized_reset=False,
                  policy_params=prefs, policy_stochastic=stochastic,
                  policy_squash=not stochastic)

        def timed_kernel(t_steps):
            out = spec['kernel'](state0, cfg, 1, n_steps=t_steps, **kw)
            float(out['reward_sum'].sum())  # fetch INSIDE the timed region
            best = float('inf')
            for i in range(n_reps):
                t0 = time.perf_counter()
                out = spec['kernel'](state0, cfg, 2 + i, n_steps=t_steps,
                                     **kw)
                float(out['reward_sum'].sum())
                best = min(best, time.perf_counter() - t0)
            return best

        t_short = timed_kernel(n_steps // 8)
        t_long = timed_kernel(n_steps)
        slope = (t_long - t_short) / (n_steps - n_steps // 8)

        # -- per-step scan reference (the pre-round-5 closed-loop path) --
        func = env.func

        def scan_rollout(st, key):
            def body(carry, k):
                st, rew = carry
                dist = actor_dist(params, st.state)
                act = dist.sample(k) if stochastic else jnp.tanh(dist.mode())
                st, out, _ = func.step_autoreset(st, act,
                                                 jax.random.PRNGKey(0))
                return (st, rew + out.reward.sum()), None
            keys = jax.random.split(key, scan_steps)
            (st, rew), _ = jax.lax.scan(body, (st, jnp.zeros(())), keys)
            return st, rew

        scan_jit = jax.jit(scan_rollout)
        _, r = scan_jit(states, jax.random.PRNGKey(2))
        float(r)
        best_scan = float('inf')
        for i in range(n_reps):
            t0 = time.perf_counter()
            _, r = scan_jit(states, jax.random.PRNGKey(3 + i))
            float(r)
            best_scan = min(best_scan, time.perf_counter() - t0)

        return {
            'system': system, 'batch': batch, 'stochastic': stochastic,
            'hidden': hidden,
            'kernel_steps_per_sec': batch * n_steps / t_long,
            'kernel_device_slope_steps_per_sec': batch / slope,
            'scan_steps_per_sec': batch * scan_steps / best_scan,
            'speedup_vs_scan': (batch * n_steps / t_long)
            / (batch * scan_steps / best_scan),
        }
    finally:
        env.close()


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=4096)
    ap.add_argument('--n_steps', type=int, default=8192)
    ap.add_argument('--stochastic', action='store_true')
    ap.add_argument('--systems', nargs='*', default=list(SYSTEMS))
    args = ap.parse_args()
    for system in args.systems:
        print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                          for k, v in measure(
                              system, batch=args.batch,
                              n_steps=args.n_steps,
                              stochastic=args.stochastic).items()}),
              flush=True)
