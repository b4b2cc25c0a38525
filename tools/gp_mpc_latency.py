"""Measure GP-MPC per-step latency on the real chip (PERFORMANCE.md entry).

Protocol (matches the round-2 measurement it supersedes): cartpole,
horizon 15, 60 training points, state+input default constraints; per-step
``select_action`` wall time median over a closed-loop run after warmup.
Run strictly solo. Variants: exact GP, sparse (FITC) GP, and the batched
solver throughput at B=256.

Usage: python tools/gp_mpc_latency.py [exact|sparse|batch|all]
"""

import sys
import time
from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import make

CFG = dict(seed=7, cost='quadratic', ctrl_freq=15, pyb_freq=750,
           episode_len_sec=4, randomized_init=False,
           init_state={'init_theta': 0.1},
           task_info={'stabilization_goal': [0.3],
                      'stabilization_goal_tolerance': 0.0},
           constraints=[{'constraint_form': 'default_constraint',
                         'constrained_variable': 'input'},
                        {'constraint_form': 'default_constraint',
                         'constrained_variable': 'state'}],
           done_on_out_of_bound=False)


def build(sparse):
    env_func = partial(make, 'cartpole', **CFG)
    ctrl = make('gp_mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=15,
                prior_info={'prior_prop': {'pole_length': 1.0}},
                num_samples=60, optimization_iterations=120, seed=0,
                sparse_gp=sparse, n_ind_points=30)
    ctrl.reset()
    ctrl.learn()
    return ctrl, env_func


def per_step(sparse):
    ctrl, env_func = build(sparse)
    env = env_func()
    obs, info = env.reset()
    ctrl.setup_results_dict()
    ctrl.reset_before_run()
    times = []
    for i in range(24):
        t0 = time.perf_counter()
        a = ctrl.select_action(obs, info)
        times.append(time.perf_counter() - t0)
        obs, _, _, info = env.step(a)
    env.close()
    # Skip compile steps (first two: cold + warm-started program variants).
    med = float(np.median(times[3:]))
    tag = 'sparse' if sparse else 'exact'
    print(f'gp-mpc per-step latency ({tag}, h=15, 60 pts): '
          f'{med*1000:.1f} ms median (first steps incl. compile: '
          f'{[round(t*1000) for t in times[:3]]} ms)')
    return ctrl


def batch(ctrl):
    rng = np.random.default_rng(0)
    B = 256
    x0s = rng.uniform(-0.3, 0.3, (B, ctrl.model.nx)).astype(np.float32)
    u0, feas, binds = ctrl.select_action_batch(x0s)   # compile
    t0 = time.perf_counter()
    u0, feas, binds = ctrl.select_action_batch(x0s)
    dt = time.perf_counter() - t0
    print(f'batched gp-mpc: {B} solves in {dt*1000:.1f} ms -> '
          f'{B/dt:.0f} solves/s, {int(feas.sum())}/{B} feasible')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    ctrl = None
    if which in ('exact', 'all'):
        ctrl = per_step(sparse=False)
    if which in ('sparse', 'all'):
        per_step(sparse=True)
    if which in ('batch', 'all') and ctrl is not None:
        batch(ctrl)
    elif which == 'batch':
        ctrl, _ = build(False)
        batch(ctrl)
