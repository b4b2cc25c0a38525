"""Measure adversarial-RL training wall-clock: fused vs per-iteration.

Protocol: cartpole 50/1000 Hz with a dynamics-channel adversary, RARL
(protagonist + adversary PPO) and RAP (population of 2). Budget =
8 alternating cycles of (2 protagonist + 2 adversary) iterations at
32 envs x 64 steps (65,536 env steps). `fused_iterations=K` runs K whole
cycles per dispatch; the comparison is total learn() wall-clock after a
throwaway compile run. Run strictly solo (the dev tunnel charges tens of
ms per dispatch; see CLAUDE.md measurement rule).

Usage: python tools/rarl_wallclock.py [rarl|rap|all] [--fused-only]
"""

import sys
import time
from functools import partial

if '--cpu' in sys.argv:
    # Must run before the first trace; the JAX_PLATFORMS env var does not
    # work here (sitecustomize pins the axon plugin).
    import jax
    jax.config.update('jax_platforms', 'cpu')

from safe_control_gym_tpu.utils.registration import get_config, make

ENV_CFG = dict(seed=3, cost='rl_reward', normalized_rl_action_space=True,
               randomized_init=True, episode_len_sec=4, ctrl_freq=50,
               pyb_freq=1000, adversary_disturbance='dynamics',
               adversary_disturbance_scale=1.0)

N, T = 32, 64
CYCLES = 8          # (2 prot + 2 adv) iterations each
STEPS = N * T * 4 * CYCLES


def build(algo, fused_k, seed=1):
    cfg = get_config(algo)
    cfg.update(rollout_batch_size=N, rollout_steps=T, agent_iterations=2,
               adversary_iterations=2, opt_epochs=5, mini_batch_size=256,
               max_env_steps=STEPS, log_interval=0,
               fused_iterations=fused_k)
    if algo == 'rap':
        cfg['num_adversaries'] = 2
    return make(algo, partial(make, 'cartpole', **ENV_CFG), training=True,
                seed=seed, output_dir=f'/tmp/{algo}_wallclock',
                checkpoint_path='', **cfg)


def run(algo, fused_k):
    # Throwaway compile pass (tiny budget) so the timed run is warm.
    warm = build(algo, fused_k)
    warm.max_env_steps = N * T * 4 * (fused_k if fused_k > 1 else 1)
    warm.learn()
    warm.close()

    ctrl = build(algo, fused_k)
    t0 = time.perf_counter()
    ctrl.learn()
    dt = time.perf_counter() - t0
    print(f'{algo} fused_iterations={fused_k}: {dt:.2f} s '
          f'for {ctrl.total_steps} env steps '
          f'({ctrl.total_steps / dt / 1e3:.1f}k steps/s)', flush=True)
    ctrl.close()
    return dt


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    fused_only = '--fused-only' in sys.argv
    for algo in (['rarl', 'rap'] if which == 'all' else [which]):
        t_fused = run(algo, CYCLES)
        if not fused_only:
            t_iter = run(algo, 1)
            print(f'{algo}: fused speedup {t_iter / t_fused:.1f}x '
                  f'({t_iter:.2f} s -> {t_fused:.2f} s)', flush=True)
