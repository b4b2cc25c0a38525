"""Sweep lax.scan unroll for the bench rollout (launch-latency probe).

The hot loop is per-op launch-latency bound; unrolling the scan body
gives XLA unroll-many bodies to fuse/overlap per loop iteration. Sweeps
unroll in {1, 2, 4, 8} for each system's plain bench row and prints one
JSON line with the winner (the source for bench.py's unroll choice).

Usage: python tools/unroll_sweep.py [system ...]   (solo!)
"""

import json
import sys

from safe_control_gym_tpu.experiments.benchmark_suite import measure_batched

SYSTEMS = sys.argv[1:] or ['cartpole', 'quadrotor_2D', 'quadrotor_3D']


def main():
    out = {}
    for system in SYSTEMS:
        suite_id = 'quadrotor' if system == 'quadrotor_2D' else system
        n_steps = 8192 if system == 'cartpole' else 4096
        row = {}
        for unroll in (1, 2, 4, 8):
            _, sps = measure_batched(suite_id, constrained=False, batch=4096,
                                     n_steps=n_steps, n_reps=2,
                                     unroll=unroll)
            row[unroll] = round(sps / 1e6, 1)
            print(f'{system} unroll={unroll}: {row[unroll]} M steps/s',
                  flush=True)
        out[system] = row
    print(json.dumps({'metric': 'bench rollout unroll sweep (M steps/s)',
                      **out}))


if __name__ == '__main__':
    main()
