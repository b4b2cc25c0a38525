"""Per-phase latency breakdown of the fused GP-MPC select_action program.

VERDICT r3 item 6 asks for GP-MPC at 50 Hz (<= 20 ms/step) *or a proven
floor*. This tool separates the three very different costs that
tools/gp_mpc_latency.py's closed-loop wall-clock number lumps together:

  rtt        - one trivial dispatch + device_get round-trip through the
               remote-TPU tunnel (pure environment overhead; ~0.1 ms on a
               locally-attached chip).
  device     - the fused program's own execution time, estimated by
               pipelining N async dispatches and blocking once (the host
               keeps the device queue full, so total/N ~ program time).
  wall       - one dispatch + fetch, what a closed-loop controller pays
               per step in THIS environment (~ device + rtt when the
               program is shorter than the round-trip).

Phases (each its own jitted program, timed the same way):
  tighten    - chance-constraint tightening scan alone (GP variance +
               covariance propagation, reference gp_mpc.py:288-362).
  fused sqp2 - the production program (2 SQP/ADMM solves + final polish).
  fused sqp1 - RTI-style single warm-started SQP iteration (the
               reference's acados real-time story, mpc_acados.py:164-175).
  nopolish   - sqp2 with the active-set polish disabled (isolates the
               batched-LU polish cost).

Usage: python tools/gp_mpc_profile.py   (run strictly solo)
Prints one JSON line (the source of PERFORMANCE.md's floor analysis).
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gp_mpc_latency import build  # noqa: E402  (same protocol)

N_PIPE = 24


def _timed(fn, *args, fetch=True):
    """Median wall of dispatch+fetch, and pipelined device estimate."""
    out = fn(*args)
    jax.block_until_ready(out)
    walls = []
    for _ in range(9):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out) if fetch else jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(N_PIPE)]
    jax.block_until_ready(outs[-1])
    pipe = (time.perf_counter() - t0) / N_PIPE
    return float(np.median(walls)) * 1e3, pipe * 1e3


def main():
    import safe_control_gym_tpu.controllers.mpc.mpc as mpc_mod
    from safe_control_gym_tpu.ops import qp as qp_mod

    ctrl, env_func = build(sparse=False)
    env = env_func()
    obs, info = env.reset()
    ctrl.setup_results_dict()
    ctrl.reset_before_run()
    for _ in range(3):  # populate a realistic warm start
        a = ctrl.select_action(obs, info)
        obs, _, _, info = env.step(a)

    nx, nu, T = ctrl.model.nx, ctrl.model.nu, ctrl.T
    goal_j = np.asarray(ctrl.get_references(3).T, np.float32)
    obs_j = np.asarray(obs, np.float32)
    x_guess = np.roll(ctrl.x_prev, -1, axis=1)
    x_guess[:, -1] = ctrl.x_prev[:, -1]
    X0 = np.asarray(x_guess.T, np.float32)
    U0 = np.asarray(np.roll(np.atleast_2d(ctrl.u_prev), -1, -1)
                    .reshape(nu, T).T, np.float32)
    z0, y0 = ctrl._qp_warm
    x_prev_T = np.asarray(np.asarray(ctrl.x_prev).T, np.float32)
    u_prev_T = np.asarray(np.atleast_2d(ctrl.u_prev).reshape(nu, T).T,
                          np.float32)
    has_prev = np.float32(1.0)
    fused_args = (obs_j, goal_j, X0, U0, z0, y0, x_prev_T, u_prev_T,
                  has_prev, ctrl.dynamics_params, ctrl._tighten_params)

    res = {}

    # Pure tunnel round-trip: a trivial program, dispatched + fetched.
    noop = jax.jit(lambda x: x + 1.0)
    res['rtt'] = dict(zip(('wall_ms', 'device_ms'),
                          _timed(noop, np.float32(1.0))))

    res['tighten'] = dict(zip(('wall_ms', 'device_ms'), _timed(
        ctrl._tighten_jit, x_prev_T, u_prev_T, ctrl._tighten_params,
        has_prev)))

    res['fused_sqp2'] = dict(zip(('wall_ms', 'device_ms'),
                                 _timed(ctrl._fused_jit, *fused_args)))

    # Polish off (patch the module global admm_qp; build_and_solve resolves
    # it at call time) -> rebuild the fused program.
    orig = mpc_mod.admm_qp
    mpc_mod.admm_qp = (lambda *a, polish=False, **k:
                       qp_mod.admm_qp(*a, polish=False, **k))
    try:
        ctrl.setup_optimizer(ctrl.solver)
        res['fused_sqp2_nopolish'] = dict(zip(
            ('wall_ms', 'device_ms'), _timed(ctrl._fused_jit, *fused_args)))
    finally:
        mpc_mod.admm_qp = orig

    # RTI-style single SQP iteration (warm-started).
    ctrl.sqp_iters = 1
    ctrl.setup_optimizer(ctrl.solver)
    res['fused_sqp1'] = dict(zip(('wall_ms', 'device_ms'),
                                 _timed(ctrl._fused_jit, *fused_args)))
    env.close()

    out = {'metric': 'gp-mpc fused-program phase breakdown (cartpole h=15, '
                     '60 pts, exact GP)', 'unit': 'ms'}
    for k, v in res.items():
        out[k] = {kk: round(vv, 2) for kk, vv in v.items()}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
