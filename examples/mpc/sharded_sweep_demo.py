"""Mesh-sharded controller sweeps: split B independent solves over chips.

Batched NMPC (`MPC.select_action_batch`) and batched tube certification
(`LinearMPSC.certify_action_batch`) are pure vmapped programs, so
`shard_over(mesh)` distributes the batch axis across a
``jax.sharding.Mesh`` — each chip solves its shard inside ONE SPMD
program, solver constants replicated, zero collectives. No reference
equivalent (the reference runs one IPOPT/qpOASES process per problem).

On a single-chip machine, run with a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python sharded_sweep_demo.py cpu [B]
"""

import sys
import time
from functools import partial

import numpy as np

CFG = dict(seed=0, cost='quadratic', ctrl_freq=15, pyb_freq=750,
           randomized_init=False,
           task_info={'stabilization_goal': [0.0],
                      'stabilization_goal_tolerance': 0.01},
           constraints=[{'constraint_form': 'default_constraint',
                         'constrained_variable': 'state',
                         'upper_bounds': [1.5, 2, 0.3, 2],
                         'lower_bounds': [-1.5, -2, -0.3, -2]},
                        {'constraint_form': 'default_constraint',
                         'constrained_variable': 'input',
                         'upper_bounds': [5], 'lower_bounds': [-5]}])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    from safe_control_gym_tpu.parallel.sharding import make_env_mesh
    from safe_control_gym_tpu.utils.registration import make
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_dev = len(jax.devices())
    mesh = make_env_mesh(n_dev, axis_name='data')
    env_func = partial(make, 'cartpole', **CFG)
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-0.3, 0.3, (B, 4)).astype(np.float32)

    ctrl = make('mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=10,
                sqp_iters=3, seed=0)
    ctrl.reset()
    ctrl.shard_over(mesh)
    u, feas = ctrl.select_action_batch(x0s)           # compile
    t0 = time.perf_counter()
    u, feas = ctrl.select_action_batch(x0s)
    dt = time.perf_counter() - t0
    print(f'NMPC sweep: {B} solves over {n_dev} devices in {dt*1000:.0f} ms'
          f' -> {B/dt:.0f} solves/s, {int(feas.sum())}/{B} feasible')

    sf = make('linear_mpsc', env_func, horizon=10, q_lin=[1], r_lin=[1],
              integration_algo='rk4', n_samples=120, tau=0.95, seed=0,
              use_terminal_set=False)
    sf.learn()
    sf.shard_over(mesh)
    acts = rng.uniform(-2, 2, (B, 1)).astype(np.float32)
    cert, ok = sf.certify_action_batch(x0s, acts)     # compile
    t0 = time.perf_counter()
    cert, ok = sf.certify_action_batch(x0s, acts)
    dt = time.perf_counter() - t0
    print(f'certification sweep: {B} over {n_dev} devices in '
          f'{dt*1000:.0f} ms -> {B/dt:.0f} certs/s, '
          f'{int(ok.sum())}/{B} feasible')


if __name__ == '__main__':
    main()
