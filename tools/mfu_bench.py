"""Achieved FLOP/s and MXU utilization for the matmul-bearing programs.

The env-step hot loop is scalar VPU work (PERFORMANCE.md roofline:
MFU is the wrong lens there); the MXU-bearing programs are RL gradient
updates, the batched ADMM QP, and the GP-MPC fused solve. This tool
publishes, for each, XLA's own FLOP count (``compiled.cost_analysis()``)
against measured execution time:

  * ppo_update        - PPOAgent's jitted epochs x minibatches update at
                        the production rollout size (512 envs x 64 steps);
  * ppo_fused_iter    - one full fused PPO training iteration
                        (collect + update) as ``learn()`` runs it;
  * sac_fused_iter    - one fused SAC phase (collect + K gradient steps);
  * admm_qp_batched   - 1024 vmapped MPC-sized ADMM QPs (horizon 20
                        cartpole: n=104 vars, m=124 rows, 250 iters)
                        under the mandatory full-f32 matmul guard;
  * gp_mpc_fused      - the fused GP-MPC select_action (tightening scan +
                        2 SQP/ADMM + polish, exact GP, 60 points).

Peaks (TPU v5e, one chip): 197 TFLOP/s bf16 MXU. The solver programs
REQUIRE full-f32 matmul algebra (PERFORMANCE.md "Batched MPC": with
default bf16 operands ~1% of ADMM problems converge) — XLA implements a
HIGHEST-precision f32 matmul as 6 bf16 MXU passes, so the attainable
peak for those programs is ~197/6 = 32.8 TFLOP/s; both ratios are
reported. Run SOLO on the real chip: python tools/mfu_bench.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.utils.utils import enable_persistent_compile_cache

enable_persistent_compile_cache()

PEAK_BF16 = 197e12
PEAK_F32_6PASS = PEAK_BF16 / 6
N_PIPE = 16


def _flops(lowered_compiled):
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get('flops', float('nan')))


def _fetch(out):
    """Force completion by FETCHING a scalar (MEASUREMENT RULE,
    CLAUDE.md: bare block_until_ready on the remote axon backend can
    return while the device still computes)."""
    leaf = next(l for l in jax.tree.leaves(out) if hasattr(l, 'dtype'))
    float(jnp.sum(leaf.astype(jnp.float32)))


def _measure(name, fn, args, f32_guard, analytic_flops=None):
    """Wall (dispatch+fetch) + pipelined device-time estimate + XLA flops.

    ``analytic_flops``: hand-counted FLOPs for programs whose loops XLA's
    cost model undercounts (it does not reliably multiply scan/while BODY
    counts by the trip count — measured 1.16 GFLOP reported vs ~17 GFLOP
    analytic for the 80-grad-step PPO update). When provided, utilization
    is computed from max(analytic, xla)."""
    compiled = fn.lower(*args).compile()
    flops = _flops(compiled)
    if analytic_flops is not None:
        flops = max(flops, float(analytic_flops))
    out = fn(*args)
    _fetch(out)
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        walls.append(time.perf_counter() - t0)
    # Pipelined: device executes queued programs back-to-back; fetching
    # from the LAST output bounds the whole queue, so total/N isolates
    # per-program device time from the ~35 ms tunnel round trip.
    n_pipe = N_PIPE if np.median(walls) < 1.0 else 4
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n_pipe)]
    _fetch(outs[-1])
    pipe = (time.perf_counter() - t0) / n_pipe
    dev_s = min(min(walls), pipe)
    achieved = flops / dev_s
    return {
        'program': name, 'flops': flops, 'wall_ms': np.median(walls) * 1e3,
        'device_ms': pipe * 1e3, 'achieved_gflops': achieved / 1e9,
        'mfu_vs_bf16_peak': achieved / PEAK_BF16,
        'mfu_vs_f32_6pass_peak': achieved / PEAK_F32_6PASS,
        'f32_guard': f32_guard,
    }


def measure_ppo_update(n_envs=512, t_steps=64):
    from safe_control_gym_tpu.controllers.ppo.ppo_utils import PPOAgent
    import gymnasium as gym
    obs_space = gym.spaces.Box(-np.inf, np.inf, (4,), np.float32)
    act_space = gym.spaces.Box(-1.0, 1.0, (1,), np.float32)
    agent = PPOAgent(obs_space, act_space, mini_batch_size=4096, seed=0)
    M = n_envs * t_steps
    k = jax.random.PRNGKey(0)
    batch = {
        'obs': jax.random.normal(k, (M, 4)),
        'act': jax.random.normal(k, (M, 1)),
        'logp': jax.random.normal(k, (M,)),
        'adv': jax.random.normal(k, (M,)),
        'ret': jax.random.normal(k, (M,)),
        'v': jax.random.normal(k, (M,)),
    }
    args = (agent.params, agent.actor_opt_state, agent.critic_opt_state,
            batch, jax.random.PRNGKey(1))
    # Analytic: epochs x minibatches grad steps, fwd 2PB + bwd 4PB per
    # net (actor + critic, ~4.4k weights each at hidden 64).
    n_params = sum(int(np.prod(np.shape(w))) for w in
                   jax.tree.leaves(agent.params))
    grad_steps = agent.opt_epochs * (M // 4096)
    analytic = 6.0 * n_params * 4096 * grad_steps
    return _measure(f'ppo_update (M={M}, mb=4096, '
                    f'epochs={agent.opt_epochs}, hidden MLP)',
                    agent._update_jit, args, f32_guard=False,
                    analytic_flops=analytic)


def _fused_rl_iter(algo):
    import shutil
    import tempfile
    from functools import partial

    from safe_control_gym_tpu.utils.registration import get_config, make
    env_func = partial(make, 'cartpole', seed=0,
                       normalized_rl_action_space=True)
    cfg = get_config(algo)
    if algo == 'ppo':
        cfg.update(rollout_batch_size=512, rollout_steps=64,
                   mini_batch_size=4096)
    else:
        cfg.update(rollout_batch_size=32, train_interval=320,
                   train_batch_size=512, max_buffer_size=50000,
                   warm_up_steps=0)
    cfg.update(fused_iterations=1, max_env_steps=1, eval_interval=0,
               log_interval=0, save_interval=0, num_checkpoints=0)
    out_dir = tempfile.mkdtemp(prefix='mfu_')
    ctrl = make(algo, env_func, training=True, seed=0, output_dir=out_dir,
                **cfg)
    try:
        ctrl.reset()
        n_params = sum(int(np.prod(np.shape(w))) for w in
                       jax.tree.leaves(ctrl.agent.params))
        if algo == 'ppo':
            from safe_control_gym_tpu.math.normalization import (ret_init,
                                                                 rms_init)
            obs_norm = rms_init((ctrl.env.observation_space.shape[0],))
            ret_state = ret_init(ctrl.N)
            args = (ctrl.agent.params, ctrl.agent.actor_opt_state,
                    ctrl.agent.critic_opt_state, ctrl._env_states,
                    ctrl._obs, obs_norm, ret_state, jax.random.PRNGKey(2))
            label = 'ppo_fused_iter (512x64 collect + update)'
            grad_steps = ctrl.agent.opt_epochs * (ctrl.N * ctrl.T // 4096)
            analytic = 6.0 * n_params * 4096 * grad_steps
        else:
            args = (ctrl.agent.train_state(), ctrl._env_states, ctrl._obs,
                    ctrl.buffer, jax.random.PRNGKey(2))
            label = 'sac_fused_iter (32x320 collect + 320 grad steps)'
            # ~6PB through actor+q1+q2 per grad step + target fwds
            # (approximate; dominated by the 256-wide Q/actor matmuls).
            analytic = 8.0 * n_params * 512 * 320
        return _measure(label, ctrl._fused_jit, args, f32_guard=False,
                        analytic_flops=analytic)
    finally:
        ctrl.close()
        shutil.rmtree(out_dir, ignore_errors=True)


def measure_admm(batch=1024, n=104, m=124, iters=250):
    from safe_control_gym_tpu.math.linalg import full_matmul_precision
    rng = np.random.default_rng(0)
    G = rng.normal(size=(batch, n, n)).astype(np.float32)
    P = np.eye(n, dtype=np.float32) + (G @ np.swapaxes(G, 1, 2)) / n
    q = rng.normal(size=(batch, n)).astype(np.float32)
    A = rng.normal(size=(batch, m, n)).astype(np.float32) / np.sqrt(n)
    l = np.full((batch, m), -1.0, np.float32)
    u = np.full((batch, m), 1.0, np.float32)
    from safe_control_gym_tpu.ops.qp import admm_qp
    fn = jax.jit(full_matmul_precision(jax.vmap(
        lambda P, q, A, l, u: admm_qp(P, q, A, l, u, iters=iters,
                                      polish=True))))
    args = tuple(jnp.asarray(x) for x in (P, q, A, l, u))
    return _measure(f'admm_qp_batched (B={batch}, n={n}, m={m}, '
                    f'iters={iters}, polish)', fn, args, f32_guard=True)


def measure_gp_mpc():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gp_mpc_latency import build
    ctrl, env_func = build(sparse=False)
    env = env_func()
    obs, info = env.reset()
    ctrl.setup_results_dict()
    ctrl.reset_before_run()
    for _ in range(3):
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
    args = (obs_j, goal_j, X0, U0, z0, y0, x_prev_T, u_prev_T,
            np.float32(1.0), ctrl.dynamics_params, ctrl._tighten_params)
    try:
        return _measure('gp_mpc_fused (cartpole h=15, 60 pts, 2 SQP + '
                        'polish)', ctrl._fused_jit, args, f32_guard=True)
    finally:
        env.close()
        ctrl.close()


if __name__ == '__main__':
    rows = []
    rows.append(measure_ppo_update())
    rows.append(_fused_rl_iter('ppo'))
    rows.append(_fused_rl_iter('sac'))
    rows.append(measure_admm())
    # Batch is the MXU lever: 4x the problems, same latency-bound
    # per-iteration chain.
    rows.append(measure_admm(batch=4096))
    rows.append(measure_gp_mpc())
    for r in rows:
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items()}), flush=True)
