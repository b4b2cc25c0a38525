"""RL training throughput: env-steps/s INSIDE ``learn()``, post-compile.

Times a full ``learn()`` call — fused collect + gradient updates + host
bookkeeping — after a first warm-up ``learn()`` has absorbed every
compile, for PPO on all three systems and SAC/DDPG on cartpole. This is
the number that governs time-to-solve scaling on bigger tasks (the
whole-rollout kernel bounds the collect phase from above; this measures
what training actually achieves end-to-end, update step included).

Reference comparison: the torch reference collects rollouts through
subprocess pipes at ~1.2k env steps/s (subproc_vec_env.py:20-64,
ppo.py:259-303) before any gradient time.

Run SOLO on the real chip:  python tools/rl_training_throughput.py
"""

import argparse
import json
import shutil
import tempfile
import time
from functools import partial

import jax

try:
    jax.config.update('jax_default_prng_impl', 'rbg')
except Exception:
    pass

from safe_control_gym_tpu.utils.registration import get_config, make
from safe_control_gym_tpu.utils.utils import enable_persistent_compile_cache

enable_persistent_compile_cache()

SYSTEM_KW = {
    'cartpole': dict(),
    'quadrotor_2D': dict(quad_type=2, init_state={'init_z': 1.0},
                         task_info={'stabilization_goal': [0, 1],
                                    'stabilization_goal_tolerance': 0.0}),
    'quadrotor_3D': dict(quad_type=3, init_state={'init_z': 1.0},
                         task_info={'stabilization_goal': [0, 0, 1],
                                    'stabilization_goal_tolerance': 0.0}),
}


def _env_func(system):
    env_id = 'quadrotor' if system.startswith('quad') else system
    return partial(make, env_id, seed=0, normalized_rl_action_space=True,
                   ctrl_freq=50, pyb_freq=1000, episode_len_sec=5,
                   **SYSTEM_KW[system])


def _timed_learn(ctrl):
    """learn() twice: the first absorbs all compiles, the second is the
    measured post-compile wall (identical program — total_steps reset)."""
    ctrl.learn()
    steps = ctrl.total_steps
    ctrl.total_steps = 0
    t0 = time.perf_counter()
    ctrl.learn()
    wall = time.perf_counter() - t0
    return steps, wall


def measure_ppo(system, n_envs=512, t_steps=64, fused=8, programs=2):
    cfg = get_config('ppo')
    steps_per_iter = n_envs * t_steps
    cfg.update(rollout_batch_size=n_envs, rollout_steps=t_steps,
               mini_batch_size=steps_per_iter // 8,
               fused_iterations=fused,
               max_env_steps=steps_per_iter * fused * programs,
               eval_interval=0, log_interval=0, save_interval=0,
               num_checkpoints=0)
    out_dir = tempfile.mkdtemp(prefix='rl_tput_')
    ctrl = make('ppo', _env_func(system), training=True, seed=0,
                output_dir=out_dir, **cfg)
    try:
        steps, wall = _timed_learn(ctrl)
        return {'algo': 'ppo', 'system': system, 'n_envs': n_envs,
                'rollout_steps': t_steps, 'fused_iterations': fused,
                'env_steps': steps, 'wall_s': wall,
                'env_steps_per_sec': steps / wall}
    finally:
        ctrl.close()
        shutil.rmtree(out_dir, ignore_errors=True)


def measure_offpolicy(algo, system='cartpole', n_envs=32, programs=2,
                      fused=8, train_interval=320):
    cfg = get_config(algo)
    steps_per_iter = train_interval
    cfg.update(rollout_batch_size=n_envs, train_interval=train_interval,
               train_batch_size=512, warm_up_steps=0,
               max_buffer_size=50000, fused_iterations=fused,
               max_env_steps=steps_per_iter * fused * programs,
               eval_interval=0, log_interval=0, save_interval=0,
               num_checkpoints=0)
    out_dir = tempfile.mkdtemp(prefix='rl_tput_')
    ctrl = make(algo, _env_func(system), training=True, seed=0,
                output_dir=out_dir, **cfg)
    try:
        steps, wall = _timed_learn(ctrl)
        return {'algo': algo, 'system': system, 'n_envs': n_envs,
                'train_interval': train_interval, 'fused_iterations': fused,
                'env_steps': steps, 'wall_s': wall,
                'env_steps_per_sec': steps / wall}
    finally:
        ctrl.close()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--n_envs', type=int, default=512)
    ap.add_argument('--rollout_steps', type=int, default=64)
    ap.add_argument('--fused', type=int, default=8)
    ap.add_argument('--systems', nargs='*', default=list(SYSTEM_KW))
    ap.add_argument('--skip_offpolicy', action='store_true')
    args = ap.parse_args()
    for system in args.systems:
        r = measure_ppo(system, n_envs=args.n_envs,
                        t_steps=args.rollout_steps, fused=args.fused)
        print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                          for k, v in r.items()}), flush=True)
    if not args.skip_offpolicy:
        for algo in ('sac', 'ddpg'):
            r = measure_offpolicy(algo)
            print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                              for k, v in r.items()}), flush=True)
