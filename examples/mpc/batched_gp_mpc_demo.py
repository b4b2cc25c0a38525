"""Batched GP-MPC: B cautious-MPC solves in one fused device program.

GP-MPC is the framework's most expensive controller — per problem it is
GP-mean dynamics + chance-constraint tightening + an SQP solve (the
reference runs one IPOPT process per problem, select_action_with_gp,
gp_mpc.py:584-676). Here the WHOLE step (tightening passes included) is a
pure jittable function, so ``jax.vmap`` turns it into a batched solver:
B problems from B different initial states in a single dispatch.

Run: python batched_gp_mpc_demo.py [B]
"""

import sys
import time
from functools import partial

import jax
import numpy as np

from safe_control_gym_tpu.utils.registration import make


def build_controller(horizon=15):
    env_func = partial(
        make, 'cartpole', seed=0, cost='quadratic', ctrl_freq=15,
        pyb_freq=750,
        constraints=[{'constraint_form': 'default_constraint',
                      'constrained_variable': 'input'},
                     {'constraint_form': 'default_constraint',
                      'constrained_variable': 'state'}],
        task_info={'stabilization_goal': [0.0],
                   'stabilization_goal_tolerance': 0.01},
        randomized_init=False)
    ctrl = make('gp_mpc', env_func, q_mpc=[1], r_mpc=[0.1], horizon=horizon,
                prior_info={'prior_prop': {'pole_length': 1.0}},
                num_samples=60, optimization_iterations=120, seed=0)
    ctrl.reset()
    ctrl.learn()   # one-shot LHS bootstrap of the residual GP
    return ctrl


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ctrl = build_controller()
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-0.3, 0.3, (B, ctrl.model.nx)).astype(np.float32)
    # Warmup / compile.
    u0, feas, binds = ctrl.select_action_batch(x0s)
    t0 = time.perf_counter()
    u0, feas, binds = ctrl.select_action_batch(x0s)
    dt = time.perf_counter() - t0
    print(f'{B} GP-MPC solves (h={ctrl.T}, 2 tightening passes, '
          f'{ctrl.data_inputs.shape[0]} GP points) in {dt*1000:.1f}ms '
          f'-> {B/dt:.0f} solves/s, {int(feas.sum())}/{B} feasible, '
          f'{int((binds > 0).sum())} with capped tightening')


if __name__ == '__main__':
    main()
