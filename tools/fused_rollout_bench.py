"""Measure the whole-rollout Pallas kernel on the real TPU.

Same workload as bench.py's production rows (4096 envs, ctrl 50 Hz /
pyb 1000 Hz, random actions, with/without constraints+disturbances) but
the entire T-step loop is ONE kernel launch (ops/rollout_kernels.py) —
per-step dispatch, pack/unpack, and RNG launches all disappear. The
measurement itself lives in
``experiments.benchmark_suite.measure_rollout_kernel`` (shared with
bench.py); this is the standalone CLI.

Timing protocol (stricter than the per-step scan's, because this kernel
is fast enough that the remote-TPU tunnel's constant dispatch+fetch cost
— ~35 ms measured as a no-op round trip — dominates short programs):

* every timed run fetches a value to the host (``block_until_ready``
  alone measured UNRELIABLE on the remote axon backend for pallas
  outputs: it can return in ~40 us while the device still computes);
* each row reports BOTH the end-to-end amortized rate at the long T
  (includes the tunnel round trip — the honest wall-clock number) and
  the device-only rate from a two-point slope in T (cancels the constant
  tunnel cost — the on-chip kernel throughput).

Run SOLO (CLAUDE.md measurement rule): concurrent jobs poison the number
through host contention.
"""

import argparse
import json
import os

os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')

from safe_control_gym_tpu.utils.utils import enable_persistent_compile_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4096)
    p.add_argument('--steps', type=int, default=32768)
    p.add_argument('--reps', type=int, default=3)
    p.add_argument('--systems', nargs='*',
                   default=['cartpole', 'quadrotor', 'quadrotor_3D'])
    args = p.parse_args()
    enable_persistent_compile_cache()
    from safe_control_gym_tpu.experiments.benchmark_suite import \
        measure_rollout_kernel
    for system in args.systems:
        for constrained in (False, True):
            _, sps, extras = measure_rollout_kernel(
                system, constrained, batch=args.batch, n_steps=args.steps,
                n_reps=args.reps)
            workload = ('constraints+disturbances, random actions'
                        if constrained else 'random actions')
            print(json.dumps({
                'metric': (f'{system} fused-rollout kernel steps/sec/chip '
                           f'({args.batch} envs, 50/1000Hz, {workload})'),
                'value': round(sps, 1),
                'unit': 'ctrl steps/s',
                **{k: round(v, 3) for k, v in extras.items()},
            }), flush=True)


if __name__ == '__main__':
    main()
