"""Batched iLQR: B full trajectory optimizations in one device call.

The reference's iLQR (ilqr.py:96-183) is a host loop — every iteration
rolls the policy out one env.step at a time, so a single solve is
hundreds of sequential dispatches and batching is impossible. Here the
whole optimization (closed-loop rollout under lax.scan + backward pass +
lambda adaptation + revert-to-best) is one jitted program, and
``iLQR.solve_batch`` vmaps it over B initial states: B independent
trajectory optimizations per device call — the same pattern as the
batched NMPC/GP-MPC/MPSC solvers.

Run: python batched_ilqr_demo.py [B]
"""

import sys
import time
from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.registration import get_config, make


def main(B=64):
    env_func = partial(
        make, 'cartpole', seed=0, cost='quadratic', task='stabilization',
        task_info={'stabilization_goal': [0.5, 0.0],
                   'stabilization_goal_tolerance': 0.0},
        randomized_init=False, episode_len_sec=3, ctrl_freq=15,
        pyb_freq=750)
    ctrl = make('ilqr', env_func,
                **{**get_config('ilqr'), 'max_iterations': 10,
                   'fused_solve': True, 'output_dir': '/tmp/batched_ilqr'})

    rng = np.random.default_rng(0)
    nominal = np.asarray(ctrl.env._nominal_init_state(), np.float32)
    x0s = nominal + rng.uniform(-0.2, 0.2, (B, nominal.shape[0])) \
        .astype(np.float32)

    t0 = time.perf_counter()
    out = ctrl.solve_batch(x0s)          # compile + solve
    compile_and_solve = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = ctrl.solve_batch(x0s)
    warm = time.perf_counter() - t0

    conv = int(np.sum(out['converged']))
    print(f'B={B} iLQR solves: warm {warm:.3f}s '
          f'({B / warm:,.0f} solves/s), first-call {compile_and_solve:.1f}s')
    print(f'converged {conv}/{B}, cost mean {out["cost"].mean():.3f} '
          f'min {out["cost"].min():.3f} max {out["cost"].max():.3f}')
    ctrl.close()
    return out


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
