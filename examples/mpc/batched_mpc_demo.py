"""Batched MPC: solve B receding-horizon problems in one fused program.

The reference's IPOPT/qpOASES solvers run one problem per process; here the
whole SQP+ADMM solve is a pure jittable function, so ``jax.vmap`` turns it
into a batched solver — B MPC problems from B different states solved in a
single device call. This is the foundation for robust/scenario MPC and for
massively parallel controller evaluation.

Run: python batched_mpc_demo.py [B]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.utils.registration import make


def build_batched_solver(horizon=20):
    env_func = partial(
        make, 'cartpole', seed=0, cost='quadratic', ctrl_freq=15,
        pyb_freq=750,
        constraints=[{'constraint_form': 'default_constraint',
                      'constrained_variable': 'input'}],
        task_info={'stabilization_goal': [0.0],
                   'stabilization_goal_tolerance': 0.01},
        randomized_init=False)
    ctrl = make('mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=horizon,
                sqp_iters=3)
    ctrl.reset()
    T = ctrl.T
    nx = ctrl.model.nx
    goal = jnp.tile(jnp.zeros((nx,), jnp.float32), (T + 1, 1))

    def solve_one(x0):
        X0 = jnp.tile(x0, (T + 1, 1))
        U0 = jnp.tile(jnp.asarray(ctrl.U_EQ, jnp.float32), (T, 1))
        z0 = jnp.zeros((ctrl._n_z,), jnp.float32)
        y0 = jnp.zeros((ctrl._m_rows,), jnp.float32)
        ts = jnp.zeros((T + 1, ctrl._ms), jnp.float32)
        tu = jnp.zeros((T, ctrl._mu), jnp.float32)
        X, U, z, y, res = ctrl._solve_raw(x0, goal, X0, U0, z0, y0, ts, tu)
        return U[0], res

    return ctrl, jax.jit(jax.vmap(solve_one))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ctrl, batched = build_batched_solver()
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 4)), jnp.float32)
    u0, res = batched(x0s)
    jax.block_until_ready(u0)
    t0 = time.perf_counter()
    u0, res = batched(x0s)
    jax.block_until_ready(u0)
    dt = time.perf_counter() - t0
    res_np = np.asarray(res)
    print(f'{B} MPC solves (h={ctrl.T}, 3 SQP x 250 ADMM) in {dt*1000:.1f}ms '
          f'-> {B/dt:.0f} solves/s, median residual '
          f'{float(np.median(res_np)):.2e}, '
          f'{int((res_np < 1e-2).sum())}/{B} converged')


if __name__ == '__main__':
    main()
