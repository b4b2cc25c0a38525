"""Whole-rollout Pallas kernels: the FULL open-loop env loop in ONE launch.

The production batched step (``FuncEnv.step_autoreset`` under ``lax.scan``)
is launch-latency bound, not compute bound: even the physics-only Pallas
kernel spends most of its 11 us/step on per-step dispatch + pack/unpack at
4096 envs, against ~3 us of actual VPU work (PERFORMANCE.md roofline).
This module removes the per-step launches entirely for OPEN-LOOP rollouts
(random or pre-recorded action sequences — the reference's headline
benchmark protocol, README.md:169-193, and dataset-generation workloads):
the whole T-step control loop runs inside one ``pallas_call`` with
``grid=(T,)``, the state resident in VMEM across grid steps, actions drawn
by the on-core PRNG (``pltpu.prng_random_bits``), and per-env episode
statistics accumulated in the output block.

Everything the production step computes LIVE under the benchmark protocol
is computed here per step, bit-matching the step semantics of
``BenchmarkEnv._build_functional`` / ``CartPole`` (this repo; reference
cartpole.py:479-696):

  action pipeline (denormalize -> white-noise action disturbance ->
  clip) -> ``PYB_STEPS_PER_CTRL`` semi-implicit-Euler substeps -> RL
  exp reward with wrapped angle -> goal-reached / out-of-bounds /
  time-limit done -> box-constraint violation count -> batched
  auto-reset with additive-uniform init randomization.

Task/cost coverage: STABILIZATION and TRAJ_TRACKING (each env gathers
its OWN time-indexed waypoint — a chunked one-hot MXU matmul,
``_gather_goal`` — so the gather stays correct after auto-resets
desynchronize the batch), with RL_REWARD or QUADRATIC cost (diagonal
Q/R; clipped-action error vs U_GOAL, never exponential). The cfg
builders gate everything else (``_check_task_cost``,
``_check_default_constraints``) so callers fall back to the per-step
scan; ``rollout_task_kwargs`` supplies the tracking table / cost flag.

RNG note: draws are distribution-identical to the production path (iid
uniform actions / init offsets, iid Gaussian action noise via Box-Muller)
but come from the TPU core PRNG, not the JAX threefry/rbg stream — the
same equivalence the hoisted-RNG bench protocol already establishes
(benchmark_suite.measure_batched).

CLOSED-LOOP rollouts run in the same launch by putting the policy
network inside the kernel: a 2-hidden-layer MLP actor (the PPO/SAC/DDPG
architecture, ppo_utils.init_actor_critic) evaluates as three MXU dots
per grid step on the (rows, B) lane layout — obs-normalization folded
into per-row scale/shift vectors, biases as (H, 1) lane-broadcasts,
Gaussian exploration noise from the on-core PRNG. Pass ``policy_params``
(via ``pack_policy_params``) to any rollout wrapper; the action source
switches from PRNG/replay to the in-kernel policy while the rest of the
step (action pipeline, physics, reward/done/constraints, auto-reset)
is unchanged. This serves policy evaluation and RL rollout collection —
the workloads the per-step scan ran at ~3x lower throughput
(reference rollout machinery: subproc_vec_env.py:20-64, ppo.py:259-303).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safe_control_gym_tpu.ops.pallas_kernels import (cartpole_substeps,
                                                     quad2d_substeps,
                                                     quad3d_substeps)

__all__ = ['cartpole_rollout_pallas', 'cartpole_rollout_cfg',
           'quad2d_rollout_pallas', 'quad2d_rollout_cfg',
           'quad3d_rollout_pallas', 'quad3d_rollout_cfg',
           'pack_policy_params', 'check_policy_obs', 'rollout_task_kwargs',
           'CARTPOLE_CFG_LEN']

_TWO_PI = 6.283185307179586
_INV_2PI = 1.0 / _TWO_PI


def _uniform01(shape):
    """iid uniform [0, 1) f32 from the on-core PRNG (24 mantissa bits).

    The high 24 bits fit in a non-negative int32, which Mosaic CAN cast
    to f32 (it has no uint32 -> f32 lowering)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) \
        * (1.0 / (1 << 24))


def _standard_normal(u1, u2):
    """Box-Muller: two uniforms -> one standard normal (per lane)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    return r * jnp.cos(_TWO_PI * u2)


def _wrap_angle(th):
    """((th + pi) mod 2pi) - pi, floor-division semantics (rotations.py:25)."""
    return th - _TWO_PI * jnp.floor((th + jnp.pi) * _INV_2PI)


def _gather_goal(xg_ref, idx):
    """Per-lane time-indexed goal rows: ``out[:, b] = xg[:, idx[b]]``.

    TRAJ_TRACKING needs each env's OWN waypoint (auto-resets desynchronize
    the batch, so the grid index cannot serve as the time index). Mosaic
    has no per-lane gather along the lane axis; instead the selection is
    a one-hot MXU matmul — (rows, T) @ (T, B) with onehot[t, b] =
    (t == idx[b]) — in 128-step chunks so the one-hot intermediate stays
    at 128 x B f32 (2 MiB at B=4096) regardless of trajectory length.
    Exact for integer-valued f32 indices < 2^24: the one-hot has a single
    unit entry per column and the dot runs at HIGHEST precision.
    """
    rows, t_pad = xg_ref.shape
    B = idx.shape[0]
    hi = jax.lax.Precision.HIGHEST
    idx_i = idx.astype(jnp.int32)  # integer-valued f32 step counts
    acc = jnp.zeros((rows, B), jnp.float32)
    for c0 in range(0, t_pad, 128):
        # Mosaic iota is integer-only (tpu.iota rejects f32 results).
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (128, B), 0) + c0
        onehot = (t_ids == idx_i[None, :]).astype(jnp.float32)
        acc = acc + jnp.dot(xg_ref[:, c0:c0 + 128], onehot,
                            preferred_element_type=jnp.float32, precision=hi)
    return acc


def _goal_table(x_goal, rows, nx):
    """Pack a (T_ep, nx) tracking reference into a (rows, T_pad) VMEM
    table (T on lanes, padded to the 128 lane tile). Returns
    ``(args, specs, n_goal)`` to splice into the pallas_call."""
    if x_goal is None:
        return (), (), 1
    n_goal = x_goal.shape[0]
    if n_goal > 4096:
        raise ValueError('fused rollout: tracking reference longer than '
                         '4096 steps (unrolled gather chunks)')
    t_pad = ((n_goal + 127) // 128) * 128
    table = jnp.zeros((rows, t_pad), jnp.float32)
    table = table.at[:nx, :n_goal].set(x_goal.astype(jnp.float32).T)
    spec = pl.BlockSpec((rows, t_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return (table,), (spec,), n_goal


def rollout_task_kwargs(env):
    """Extra rollout-wrapper kwargs for the env's task/cost mode:
    ``x_goal`` for TRAJ_TRACKING, ``quadratic_cost`` for Cost.QUADRATIC.
    Empty dict for stabilization + rl_reward (the default mode)."""
    import numpy as np

    from safe_control_gym_tpu.envs.benchmark_env import Cost, Task
    kw = {}
    if env.COST == Cost.QUADRATIC:
        kw['quadratic_cost'] = True
    if env.TASK == Task.TRAJ_TRACKING:
        kw['x_goal'] = jnp.asarray(np.atleast_2d(env.X_GOAL), jnp.float32)
    return kw


# ---------------------------------------------------------------------------
# In-kernel policy MLP (closed-loop rollouts)
# ---------------------------------------------------------------------------
# The actor is the PPO/SAC/DDPG architecture: obs -> 2 hidden layers ->
# action mean (ppo_utils.init_actor_critic; reference MLPActorCritic,
# ppo_utils.py:150-236). Eight VMEM refs, in order:
#   nmean (ROWS, 1), ninv (ROWS, 1): obs normalization folded per block
#     row — padded/accumulator rows carry ninv=0 so they contribute 0;
#   w1 (H1, ROWS), b1 (H1, 1), w2 (H2, H1), b2 (H2, 1),
#   w3 (8, H2), b3 (8, 1): weights transposed to (out, in), final layer
#     padded to 8 output rows (sublane tile).
_N_POLICY_REFS = 8


def _mlp_fwd(blk, prefs, *, activation, clip_obs):
    """(8, B) MLP outputs from a (ROWS, B) state block value.

    Returns ``(out, obs_n)`` — the normalized input is reused by the
    collect path (it is what the tape stores and what the critic sees).
    Mosaic note: dots run at HIGHEST precision — the default truncates
    f32 operands to bf16 (measured 2.4e-2 abs error on unit-scale data
    vs 1.6e-4 at HIGHEST), which would make trajectories diverge from
    the XLA policy path."""
    nmean, ninv, w1, b1, w2, b2, w3, b3 = prefs
    act = jnp.tanh if activation == 'tanh' else jax.nn.relu
    obs = jnp.clip((blk - nmean[:]) * ninv[:], -clip_obs, clip_obs)
    hi = jax.lax.Precision.HIGHEST
    h = act(jnp.dot(w1[:], obs, preferred_element_type=jnp.float32,
                    precision=hi) + b1[:])
    h = act(jnp.dot(w2[:], h, preferred_element_type=jnp.float32,
                    precision=hi) + b2[:])
    return jnp.dot(w3[:], h, preferred_element_type=jnp.float32,
                   precision=hi) + b3[:], obs


def _policy_mean(out_ref, prefs, *, activation, clip_obs):
    mu, _ = _mlp_fwd(out_ref[:], prefs, activation=activation,
                     clip_obs=clip_obs)
    return mu


def pack_policy_params(actor_params, nx: int, rows: int, obs_mean=None,
                       obs_var=None):
    """Pack an actor MLP pytree (mlp_init layout: [{'w' (in, out), 'b'}]
    x3) + optional frozen obs-normalizer stats into the kernel's ref
    tuple. ``rows`` is the kernel block height (8 cartpole / 16 quad)."""
    import numpy as np
    if len(actor_params) != 3:
        raise ValueError('policy-in-kernel supports exactly 2 hidden layers')
    w1 = np.asarray(actor_params[0]['w'], np.float32).T     # (H1, nx)
    if w1.shape[1] != nx:
        raise ValueError(f'actor input dim {w1.shape[1]} != state dim {nx}')
    h1, h2 = w1.shape[0], np.asarray(actor_params[1]['w']).shape[1]
    nu = np.asarray(actor_params[2]['w']).shape[1]
    w1p = np.zeros((h1, rows), np.float32)
    w1p[:, :nx] = w1
    w3p = np.zeros((8, h2), np.float32)
    w3p[:nu] = np.asarray(actor_params[2]['w'], np.float32).T
    b3p = np.zeros((8, 1), np.float32)
    b3p[:nu, 0] = np.asarray(actor_params[2]['b'], np.float32)
    nmean = np.zeros((rows, 1), np.float32)
    ninv = np.zeros((rows, 1), np.float32)
    if obs_mean is not None:
        nmean[:nx, 0] = np.asarray(obs_mean, np.float32)
        ninv[:nx, 0] = 1.0 / np.sqrt(np.asarray(obs_var, np.float32) + 1e-8)
    else:
        ninv[:nx, 0] = 1.0
    return tuple(jnp.asarray(a) for a in (
        nmean, ninv, w1p,
        np.asarray(actor_params[0]['b'], np.float32).reshape(h1, 1),
        np.asarray(actor_params[1]['w'], np.float32).T,
        np.asarray(actor_params[1]['b'], np.float32).reshape(h2, 1),
        w3p, b3p))


def check_policy_obs(env):
    """Closed-loop kernels feed the raw state to the policy; raise
    ValueError for configs where obs != state so callers fall back."""
    if env.disturbances.get('observation') is not None:
        raise ValueError('policy-in-kernel rollout: no observation noise')
    if getattr(env, 'obs_goal_horizon', 0):
        raise ValueError('policy-in-kernel rollout: obs == state required '
                         '(obs_goal_horizon unsupported)')
    if getattr(env, 'obs_wrap_angle', False):
        raise ValueError('policy-in-kernel rollout assumes raw-angle obs')


def _policy_specs(prefs):
    return [pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for p in prefs]


# ---------------------------------------------------------------------------
# CartPole
# ---------------------------------------------------------------------------
# cfg vector layout (SMEM, f32). Grouped: dynamics, action pipeline, task,
# episode, init randomization, reward weights, constraint box.
_C = dict(
    POLE_MASS=0, CART_MASS=1, POLE_LEN=2, GRAVITY=3,
    ACT_LO=4, ACT_HI=5, ACT_SCALE=6, PHYS_LO=7, PHYS_HI=8,
    GOAL=9,            # 9..12: goal state
    TOL_SQ=13, X_THRESH=14, TH_THRESH=15, MAX_STEPS=16,
    W_ACT=17, NOISE_STD=18,
    INIT_LO=19,        # 19..22: fresh-state low (nominal + rand low)
    INIT_HI=23,        # 23..26: fresh-state high
    W_STATE=27,        # 27..30: reward state weights
    CON_HI=31,         # 31..34: symmetric state-box constraint bound
    P_STD=35,          # 35..38: policy exploration std per action dim
    U_GOAL=39,         # quadratic-cost action reference (cartpole.py U_GOAL)
)
CARTPOLE_CFG_LEN = 40

# Output block rows (f32, lane = env): 0..3 state, 4 ctrl_step,
# 5 reward accumulator, 6 done count, 7 constraint-violation count.
_ROWS = 8


def _cartpole_rollout_kernel(cfg_ref, seed_ref, state0_ref, act_ref, *refs,
                             n_substeps, dt, draw_actions, constrained,
                             action_noise, randomized_reset, rew_exponential,
                             done_on_oob, policy=False,
                             policy_stochastic=False, policy_squash=False,
                             policy_activation='tanh', clip_obs=1e30,
                             tracking=False, quadratic_cost=False, n_goal=1):
    out_ref = refs[-1]
    ref_i = 0
    if tracking:
        xg_ref = refs[0]  # (8, T_pad) goal table, rows 0..3 = X_GOAL.T
        ref_i = 1
    i = pl.program_id(0)
    B = out_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        out_ref[:] = state0_ref[:]

    if draw_actions or action_noise or randomized_reset \
            or (policy and policy_stochastic):
        # Per-step reseed: deterministic in (seed, step), independent across
        # steps — PRNG state need not survive grid iterations. (Gated so the
        # deterministic replay path contains no PRNG ops and runs under the
        # CPU interpreter, which has no prng_seed lowering.)
        pltpu.prng_seed(seed_ref[0] + i)
        rnd = _uniform01((8, B))

    c = lambda k, off=0: cfg_ref[0, _C[k] + off]

    x = out_ref[0, :]
    xd = out_ref[1, :]
    th = out_ref[2, :]
    thd = out_ref[3, :]
    step = out_ref[4, :]

    # -- action pipeline (cartpole.py:479-530; step_impl in benchmark_env) --
    if policy:
        # Closed-loop: actor MLP on the current state (rows 0..3; the
        # accumulator rows are killed by ninv=0 + zero w1 columns).
        mu = _policy_mean(out_ref, refs[ref_i:ref_i + _N_POLICY_REFS],
                          activation=policy_activation, clip_obs=clip_obs)
        raw = mu[0, :]
        if policy_stochastic:
            # Gaussian exploration (rnd rows 0/3 are free: draw_actions is
            # off in policy mode and action-noise uses rows 1/2).
            raw = raw + c('P_STD', 0) * _standard_normal(rnd[0, :],
                                                         rnd[3, :])
        if policy_squash:
            raw = jnp.tanh(raw)
    elif draw_actions:
        raw = c('ACT_LO') + rnd[0, :] * (c('ACT_HI') - c('ACT_LO'))
    else:
        # Actions stream in 8-row blocks (TPU sublane tiling); row i % 8
        # of block i // 8 is this step's action row.
        raw = act_ref[pl.ds(i % 8, 1), :][0, :]
    phys = raw * c('ACT_SCALE')
    noisy = phys
    if action_noise:  # white-noise action disturbance, N(0, std)
        noisy = phys + c('NOISE_STD') * _standard_normal(rnd[1, :], rnd[2, :])
    force = jnp.clip(noisy, c('PHYS_LO'), c('PHYS_HI'))

    # -- physics: the shared fused-substep loop (no tab-force channel in
    # the open-loop benchmark protocol — scalar zeros fold away) --
    x, xd, th, thd = cartpole_substeps(
        x, xd, th, thd, force, 0.0, 0.0,
        c('POLE_MASS'), c('CART_MASS'), c('POLE_LEN'), c('GRAVITY'),
        n_substeps, dt)

    # -- goal reference: constant (stabilization) or each env's OWN
    # time-indexed waypoint (tracking; cartpole.py:611-652 reads
    # X_GOAL[step + 1] for rl_reward and X_GOAL[step] for quadratic) --
    if tracking:
        inc = 0.0 if quadratic_cost else 1.0
        idx = jnp.minimum(step + inc, float(n_goal - 1))
        g = _gather_goal(xg_ref, idx)
        g0, g1, g2, g3 = g[0, :], g[1, :], g[2, :], g[3, :]
    else:
        g0, g1, g2, g3 = (c('GOAL', 0), c('GOAL', 1), c('GOAL', 2),
                          c('GOAL', 3))

    e0 = x - g0
    e1 = xd - g1
    e3 = thd - g3
    if quadratic_cost:
        # -symbolic loss: UNWRAPPED state error, CLIPPED-action error vs
        # U_GOAL, never exponential (cartpole.py:636-652). W_STATE/W_ACT
        # carry 0.5*diag(Q) / 0.5*diag(R) (cfg builder).
        e2q = th - g2
        du = force - c('U_GOAL')
        rew = -(c('W_STATE', 0) * e0 * e0 + c('W_STATE', 1) * e1 * e1
                + c('W_STATE', 2) * e2q * e2q + c('W_STATE', 3) * e3 * e3
                + c('W_ACT') * du * du)
    else:
        # RL reward: wrapped-angle quadratic on the NOISY action,
        # optionally exponential (cartpole.py:611-635).
        ew = _wrap_angle(th) - g2
        dist = (c('W_STATE', 0) * e0 * e0 + c('W_STATE', 1) * e1 * e1
                + c('W_STATE', 2) * ew * ew + c('W_STATE', 3) * e3 * e3
                + c('W_ACT') * noisy * noisy)
        rew = jnp.exp(-dist) if rew_exponential else -dist

    # -- done: goal (unwrapped norm, stabilization only) / out-of-bounds /
    # time limit --
    if tracking:
        done = jnp.zeros((B,), bool)
    else:
        e2 = th - c('GOAL', 2)
        goal_sq = e0 * e0 + e1 * e1 + e2 * e2 + e3 * e3
        done = goal_sq < c('TOL_SQ')
    if done_on_oob:
        oob = jnp.logical_or(jnp.abs(x) > c('X_THRESH'),
                             jnp.abs(th) > c('TH_THRESH'))
        done = jnp.logical_or(done, oob)
    new_step = step + 1.0
    done = jnp.logical_or(done, new_step >= c('MAX_STEPS'))

    if constrained:
        # Default state box (A=[-I;I] against state_space bounds,
        # constraints.py:184-197) + default INPUT box on the NOISY
        # pre-clip action — the production step evaluates
        # constraints.values_from(x_new, noisy) (benchmark_env step_impl),
        # so the white-noise disturbance CAN push the input outside its
        # physical bounds even though the applied force is clipped.
        viol = (jnp.abs(x) > c('CON_HI', 0))
        viol = jnp.logical_or(viol, jnp.abs(xd) > c('CON_HI', 1))
        viol = jnp.logical_or(viol, jnp.abs(th) > c('CON_HI', 2))
        viol = jnp.logical_or(viol, jnp.abs(thd) > c('CON_HI', 3))
        viol = jnp.logical_or(viol, noisy > c('PHYS_HI'))
        viol = jnp.logical_or(viol, noisy < c('PHYS_LO'))
        out_ref[7, :] += viol.astype(jnp.float32)

    # -- batched auto-reset: additive-uniform fresh states --
    if randomized_reset:
        fresh = [c('INIT_LO', k) + rnd[4 + k, :]
                 * (c('INIT_HI', k) - c('INIT_LO', k)) for k in range(4)]
    else:
        fresh = [jnp.full((B,), c('INIT_LO', k)) for k in range(4)]
    out_ref[0, :] = jnp.where(done, fresh[0], x)
    out_ref[1, :] = jnp.where(done, fresh[1], xd)
    out_ref[2, :] = jnp.where(done, fresh[2], th)
    out_ref[3, :] = jnp.where(done, fresh[3], thd)
    out_ref[4, :] = jnp.where(done, 0.0, new_step)
    out_ref[5, :] += rew
    out_ref[6, :] += done.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    'n_steps', 'n_substeps', 'dt', 'draw_actions', 'constrained',
    'action_noise', 'randomized_reset', 'rew_exponential', 'done_on_oob',
    'policy_stochastic', 'policy_squash', 'policy_activation', 'clip_obs',
    'quadratic_cost'))
def cartpole_rollout_pallas(state0, cfg, seed, n_steps: int, n_substeps: int,
                            dt: float, actions=None, draw_actions: bool = True,
                            constrained: bool = False,
                            action_noise: bool = None,
                            randomized_reset: bool = True,
                            rew_exponential: bool = True,
                            done_on_oob: bool = True,
                            policy_params=None,
                            policy_stochastic: bool = False,
                            policy_squash: bool = False,
                            policy_activation: str = 'tanh',
                            clip_obs: float = 1e30,
                            x_goal=None,
                            quadratic_cost: bool = False):
    """Run ``n_steps`` full cartpole control steps in one kernel launch.

    Args:
        state0: (B, 4) f32 initial states.
        cfg: (CARTPOLE_CFG_LEN,) f32 config vector (see ``_C``).
        seed: int32 scalar PRNG seed.
        actions: optional (n_steps, B) f32 raw actions; required when
            ``draw_actions`` is False (validation/replay mode). With
            ``draw_actions`` True, actions are drawn iid uniform
            [ACT_LO, ACT_HI] on-core.
        constrained: count state/input box-constraint violations per env
            (the reference's "with constraints & disturbances" rows).
        action_noise: draw the NOISE_STD white-noise action disturbance
            on-core. Defaults to ``constrained``; pass False with
            ``constrained`` True for a PRNG-free replay run that still
            counts violations (CPU-interpreter equivalence tests).
        policy_params: optional ``pack_policy_params`` tuple — CLOSED
            LOOP: actions come from the in-kernel actor MLP on the raw
            state (requires obs == state, ``check_policy_obs``) instead
            of PRNG draws / the replay stream. ``policy_stochastic`` adds
            on-core N(0, P_STD) Gaussian exploration per dim;
            ``policy_squash`` applies tanh to the (noisy) output (the SAC
            convention); ``clip_obs`` bounds the normalized policy input.
        x_goal: optional (T_ep, 4) f32 TRAJ_TRACKING reference — each env
            reads its OWN time-indexed waypoint (one-hot MXU gather;
            resets desynchronize the batch). None = stabilization.
        quadratic_cost: Cost.QUADRATIC reward (-symbolic loss) instead of
            the RL reward; W_STATE/W_ACT must carry 0.5*diag(Q)/(R) and
            U_GOAL the action reference (``cartpole_rollout_cfg`` does).

    Returns:
        dict with ``state`` (B, 4) final states, ``ctrl_step`` (B,),
        ``reward_sum`` / ``done_count`` / ``violation_count`` (B,) per-env
        accumulators over the whole rollout.
    """
    if action_noise is None:
        action_noise = constrained
    policy = policy_params is not None
    if policy:
        assert not draw_actions and actions is None, \
            'policy mode replaces the PRNG/replay action source'
    B = state0.shape[0]
    blk = jnp.zeros((_ROWS, B), jnp.float32).at[0:4, :].set(state0.T)
    cfg2d = cfg.reshape(1, -1).astype(jnp.float32)
    seed1d = jnp.asarray(seed, jnp.int32).reshape(1)
    if draw_actions or policy:
        acts = jnp.zeros((8, B), jnp.float32)
        act_index = lambda i: (0, 0)
        act_block = (8, B)
    else:
        pad = (-n_steps) % 8  # blocks are (8, B): sublane-tile aligned
        acts = jnp.pad(actions.astype(jnp.float32), ((0, pad), (0, 0)))
        act_index = lambda i: (i // 8, 0)
        act_block = (8, B)
    prefs = tuple(policy_params) if policy else ()
    tracking = x_goal is not None
    goal_args, goal_specs, n_goal = _goal_table(x_goal, _ROWS, 4)

    out = pl.pallas_call(
        functools.partial(
            _cartpole_rollout_kernel, n_substeps=n_substeps, dt=dt,
            draw_actions=draw_actions, constrained=constrained,
            action_noise=action_noise, randomized_reset=randomized_reset,
            rew_exponential=rew_exponential, done_on_oob=done_on_oob,
            policy=policy, policy_stochastic=policy_stochastic,
            policy_squash=policy_squash,
            policy_activation=policy_activation, clip_obs=clip_obs,
            tracking=tracking, quadratic_cost=quadratic_cost, n_goal=n_goal),
        out_shape=jax.ShapeDtypeStruct((_ROWS, B), jnp.float32),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, cfg2d.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(act_block, act_index, memory_space=pltpu.VMEM),
            *goal_specs,
            *_policy_specs(prefs),
        ],
        out_specs=pl.BlockSpec((_ROWS, B), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(cfg2d, seed1d, blk, acts, *goal_args, *prefs)
    return {'state': out[0:4, :].T, 'ctrl_step': out[4, :],
            'reward_sum': out[5, :], 'done_count': out[6, :],
            'violation_count': out[7, :]}


def _check_default_constraints(env):
    """Validate that the env's constraint setup matches what the
    ``constrained=True`` kernels hard-code: exactly the default state box
    + default input box, counting only (no done-on-violation, no reward
    penalty). Raises ValueError otherwise so callers fall back to the
    per-step scan, completing the documented coverage gate."""
    import numpy as np

    from safe_control_gym_tpu.envs.constraints import DefaultConstraint
    cl = env.constraints
    if cl is None or not cl.constraints:
        return
    if env.DONE_ON_VIOLATION or env.use_constraint_penalty:
        raise ValueError('fused rollout counts violations only; '
                         'done_on_violation / constraint_penalty unsupported')
    by_var = {c.constrained_variable.value: c for c in cl.constraints}
    if len(cl.constraints) != 2 or set(by_var) != {'state', 'input'}:
        raise ValueError('fused rollout supports exactly the default '
                         'state-box + input-box constraints')
    expected = {'state': (env.state_space.low, env.state_space.high),
                'input': env.physical_action_bounds}
    for var, con in by_var.items():
        lo, hi = expected[var]
        if (type(con) is not DefaultConstraint or con.strict
                or not np.allclose(con.lower_bounds, lo)
                or not np.allclose(con.upper_bounds, hi)):
            raise ValueError('fused rollout supports only the unmodified '
                             f'default {var} box constraint')


def _check_task_cost(env):
    """Task/cost coverage gate shared by the cfg builders: stabilization
    or traj-tracking, rl_reward or quadratic (diagonal Q/R) cost."""
    import numpy as np

    from safe_control_gym_tpu.envs.benchmark_env import Cost, Task
    if env.TASK not in (Task.STABILIZATION, Task.TRAJ_TRACKING):
        raise ValueError('fused rollout supports stabilization/tracking')
    if env.COST not in (Cost.RL_REWARD, Cost.QUADRATIC):
        raise ValueError('fused rollout supports rl_reward/quadratic cost')
    if env.COST == Cost.QUADRATIC:
        Q, R = np.asarray(env.Q), np.asarray(env.R)
        if not (np.allclose(Q, np.diag(np.diag(Q)))
                and np.allclose(R, np.diag(np.diag(R)))):
            raise ValueError('fused rollout: diagonal Q/R only')


def cartpole_rollout_cfg(env):
    """Build the kernel cfg vector from a constructed CartPole env.

    Gated on the configurations the kernel reproduces exactly; raises
    ValueError otherwise so callers fall back to the per-step scan.
    """
    import numpy as np

    from safe_control_gym_tpu.envs.benchmark_env import Cost, Task
    _check_task_cost(env)
    if env.RANDOMIZED_INERTIAL_PROP or env.adversary_disturbance:
        raise ValueError('fused rollout needs fixed params, no adversary')
    _check_default_constraints(env)
    if env.obs_wrap_angle:
        raise ValueError('fused rollout assumes raw-angle state obs')
    cfg = np.zeros(CARTPOLE_CFG_LEN, np.float32)
    cfg[_C['POLE_MASS']] = env.POLE_MASS
    cfg[_C['CART_MASS']] = env.CART_MASS
    cfg[_C['POLE_LEN']] = env.EFFECTIVE_POLE_LENGTH
    cfg[_C['GRAVITY']] = env.GRAVITY_ACC
    cfg[_C['ACT_LO']] = env.action_space.low[0]
    cfg[_C['ACT_HI']] = env.action_space.high[0]
    cfg[_C['ACT_SCALE']] = (env.action_scale
                            if env.NORMALIZED_RL_ACTION_SPACE else 1.0)
    cfg[_C['PHYS_LO']] = env.physical_action_bounds[0][0]
    cfg[_C['PHYS_HI']] = env.physical_action_bounds[1][0]
    if env.TASK == Task.STABILIZATION:
        cfg[_C['GOAL']:_C['GOAL'] + 4] = np.atleast_2d(env.X_GOAL)[0]
        tol = float(env.TASK_INFO.get('stabilization_goal_tolerance', 0.0))
        cfg[_C['TOL_SQ']] = tol * tol
    # Tracking: GOAL/TOL_SQ unused — the time-indexed reference streams
    # in via the wrapper's ``x_goal`` (rollout_task_kwargs).
    cfg[_C['X_THRESH']] = env.x_threshold
    cfg[_C['TH_THRESH']] = env.theta_threshold_radians
    cfg[_C['MAX_STEPS']] = env.CTRL_STEPS
    if env.COST == Cost.QUADRATIC:
        # -symbolic loss: W_STATE/W_ACT carry 0.5*diag(Q)/(R)
        # (cartpole.py:636-652; Q/R diagonal by construction,
        # get_cost_weight_matrix).
        cfg[_C['W_STATE']:_C['W_STATE'] + 4] = 0.5 * np.diag(env.Q)
        cfg[_C['W_ACT']] = 0.5 * env.R[0, 0]
        cfg[_C['U_GOAL']] = np.atleast_1d(env.U_GOAL)[0]
    else:
        w_a = np.atleast_1d(env.rew_act_weight)
        cfg[_C['W_ACT']] = w_a[0]
        w_s = np.atleast_1d(env.rew_state_weight)
        cfg[_C['W_STATE']:_C['W_STATE'] + 4] = (
            w_s if w_s.size == 4 else np.full(4, w_s[0]))
    nominal = np.array([env.INIT_X, env.INIT_X_DOT, env.INIT_THETA,
                        env.INIT_THETA_DOT], np.float32)
    lo, hi = nominal.copy(), nominal.copy()
    if env.RANDOMIZED_INIT:
        spec = env.INIT_STATE_RAND_INFO
        for k, name in enumerate(('init_x', 'init_x_dot', 'init_theta',
                                  'init_theta_dot')):
            info = spec[name]
            if info.get('distrib') != 'uniform':
                raise ValueError('fused rollout: uniform init rand only')
            lo[k] += info['low']
            hi[k] += info['high']
    cfg[_C['INIT_LO']:_C['INIT_LO'] + 4] = lo
    cfg[_C['INIT_HI']:_C['INIT_HI'] + 4] = hi
    cfg[_C['CON_HI']:_C['CON_HI'] + 4] = env.state_space.high
    return jnp.asarray(cfg)


# ---------------------------------------------------------------------------
# Quadrotor 2D / 3D
# ---------------------------------------------------------------------------
# One shared cfg layout for both quad types, sized for the 3D case
# (nx=12, nu=4); the 2D kernel reads the first nx/nu entries of each group.
def _quad_layout():
    names = [('MASS', 1), ('IXX', 1), ('IYY', 1), ('IZZ', 1), ('ARM_L', 1),
             ('GRAVITY', 1), ('KF', 1), ('KM', 1), ('PWM_SCALE', 1),
             ('PWM_CONST', 1), ('PWM_MIN', 1), ('PWM_MAX', 1),
             ('ACT_LO', 1), ('ACT_HI', 1), ('DEN_A', 1), ('DEN_B', 1),
             ('PHYS_LO', 1), ('PHYS_HI', 1),
             ('GOAL', 12), ('TOL_SQ', 1), ('MAX_STEPS', 1),
             ('U_GOAL', 4), ('W_ACT', 4), ('NOISE_STD', 1),
             ('W_STATE', 12), ('INIT_LO', 12), ('INIT_HI', 12),
             ('CON_LO', 12), ('CON_HI', 12), ('P_STD', 4)]
    layout, off = {}, 0
    for name, size in names:
        layout[name] = off
        off += size
    return layout, off


_Q, QUAD_CFG_LEN = _quad_layout()

# (state rows, action dims, motors summed per command, oob-masked state
# dims — position/angle coordinates, quadrotor.py:698-708.)
_QUAD_SHAPE = {
    2: dict(nx=6, nu=2, n_motor=2, oob_dims=(0, 2, 4)),
    3: dict(nx=12, nu=4, n_motor=1, oob_dims=(0, 2, 4, 6, 7, 8)),
}


def _quad_rollout_kernel(cfg_ref, seed_ref, state0_ref, act_ref, *refs,
                         quad_type, n_substeps, dt, draw_actions, constrained,
                         action_noise, randomized_reset, rew_exponential,
                         done_on_oob, policy=False, policy_stochastic=False,
                         policy_squash=False, policy_activation='tanh',
                         clip_obs=1e30, tracking=False, quadratic_cost=False,
                         n_goal=1):
    """Shared 2D/3D quad rollout step. Out rows: 0..nx-1 state, 12 ctrl
    step, 13 reward acc, 14 done count, 15 violation count."""
    shape = _QUAD_SHAPE[quad_type]
    nx, nu, n_motor = shape['nx'], shape['nu'], shape['n_motor']
    out_ref = refs[-1]
    ref_i = 0
    if tracking:
        xg_ref = refs[0]  # (16, T_pad) goal table, rows 0..nx-1 = X_GOAL.T
        ref_i = 1
    i = pl.program_id(0)
    B = out_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        out_ref[:] = state0_ref[:]

    n_rnd = (nu if draw_actions else 0) \
        + (nu if policy and policy_stochastic else 0) \
        + (nu if action_noise else 0) \
        + (nx if randomized_reset else 0)
    if n_rnd:
        pltpu.prng_seed(seed_ref[0] + i)
        rnd = _uniform01((n_rnd, B))
    row = 0

    c = lambda k, off=0: cfg_ref[0, _Q[k] + off]

    state = [out_ref[k, :] for k in range(nx)]
    step = out_ref[12, :]

    # -- action pipeline (quadrotor.py:766-775 + white noise + clip) --
    if policy:
        mu = _policy_mean(out_ref, refs[ref_i:ref_i + _N_POLICY_REFS],
                          activation=policy_activation, clip_obs=clip_obs)
        raw = [mu[d, :] for d in range(nu)]
        if policy_stochastic:
            normals = []
            for k in range(0, nu, 2):
                u1, u2 = rnd[row + k, :], rnd[row + k + 1, :]
                r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                normals += [r * jnp.cos(_TWO_PI * u2),
                            r * jnp.sin(_TWO_PI * u2)]
            row += nu
            raw = [a + c('P_STD', d) * n
                   for d, (a, n) in enumerate(zip(raw, normals))]
        if policy_squash:
            raw = [jnp.tanh(a) for a in raw]
    elif draw_actions:
        raw = [c('ACT_LO') + rnd[row + d, :] * (c('ACT_HI') - c('ACT_LO'))
               for d in range(nu)]
        row += nu
    else:
        block = act_ref[pl.ds(i % 8, 1), :]
        raw = [block[0, d * B:(d + 1) * B] for d in range(nu)]
    phys = [c('DEN_A') * a + c('DEN_B') for a in raw]
    noisy = phys
    if action_noise:
        normals = []
        for k in range(0, nu, 2):
            u1, u2 = rnd[row + k, :], rnd[row + k + 1, :]
            r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            normals += [r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)]
        row += nu
        noisy = [a + c('NOISE_STD') * n for a, n in zip(phys, normals)]
    clipped = [jnp.clip(a, c('PHYS_LO'), c('PHYS_HI')) for a in noisy]

    # -- motor model: cmd -> pwm -> rpm -> forces (dynamics.py:266-293) --
    inv_nkf = 1.0 / (n_motor * c('KF'))
    inv_scale = 1.0 / c('PWM_SCALE')
    rpm = []
    for a in clipped:
        pwm = (jnp.sqrt(jnp.maximum(a, 0.0) * inv_nkf) - c('PWM_CONST')) \
            * inv_scale
        pwm = jnp.clip(pwm, c('PWM_MIN'), c('PWM_MAX'))
        rpm.append(c('PWM_SCALE') * pwm + c('PWM_CONST'))

    if quad_type == 2:
        # Pair thrusts: pwm pairing [m0, m1, m1, m0] (dynamics.py:279)
        # makes T1 = 2 f(m0), T2 = 2 f(m1); torque-free z axis.
        T1 = 2.0 * c('KF') * rpm[0] * rpm[0]
        T2 = 2.0 * c('KF') * rpm[1] * rpm[1]
        x, xd, z, zd, th, thd = quad2d_substeps(
            state[0], state[1], state[2], state[3], state[4], state[5],
            T1, T2, 0.0, 0.0, c('MASS'), c('IYY'), c('ARM_L'), c('GRAVITY'),
            n_substeps, dt)
        new_state = [x, xd, z, zd, th, thd]
    else:
        forces = tuple(c('KF') * r * r for r in rpm)
        torques = [c('KM') * r * r for r in rpm]
        zt = -torques[0] + torques[1] - torques[2] + torques[3]
        zero = jnp.zeros((B,), jnp.float32)
        new_state = list(quad3d_substeps(
            tuple(state), forces, zt, (zero, zero, zero),
            c('MASS'), c('IXX'), c('IYY'), c('IZZ'), c('ARM_L'),
            c('GRAVITY'), n_substeps, dt))

    # -- goal reference: constant (stabilization) or each env's OWN
    # time-indexed waypoint (tracking reads X_GOAL[step + 1] for BOTH
    # rl_reward and quadratic cost, quadrotor.py:819-862) --
    if tracking:
        idx = jnp.minimum(step + 1.0, float(n_goal - 1))
        g = _gather_goal(xg_ref, idx)
        goal = [g[k, :] for k in range(nx)]
    else:
        goal = [c('GOAL', k) for k in range(nx)]

    # -- reward: quadratic on state error AND action error vs U_GOAL, no
    # angle wrap (quadrotor.py:819-845); quadratic cost uses the CLIPPED
    # action and is never exponential (:848-862, W_* = 0.5*diag(Q/R)) --
    act_src = clipped if quadratic_cost else noisy
    dist = 0.0
    goal_sq = 0.0
    for k in range(nx):
        e = new_state[k] - goal[k]
        dist = dist + c('W_STATE', k) * e * e
        goal_sq = goal_sq + e * e
    for d in range(nu):
        ae = act_src[d] - c('U_GOAL', d)
        dist = dist + c('W_ACT', d) * ae * ae
    if quadratic_cost:
        rew = -dist
    else:
        rew = jnp.exp(-dist) if rew_exponential else -dist

    # -- done: goal (stabilization only) / masked position-angle oob /
    # time limit --
    if tracking:
        done = jnp.zeros((B,), bool)
    else:
        done = goal_sq < c('TOL_SQ')
    if done_on_oob:
        for k in shape['oob_dims']:
            done = jnp.logical_or(done, new_state[k] < c('CON_LO', k))
            done = jnp.logical_or(done, new_state[k] > c('CON_HI', k))
    new_step = step + 1.0
    done = jnp.logical_or(done, new_step >= c('MAX_STEPS'))

    if constrained:
        # Default state box + default INPUT box on the NOISY pre-clip
        # commands (production evaluates values_from(x_new, noisy) —
        # benchmark_env step_impl — with input bounds from
        # physical_action_bounds, constraints.py:196-197).
        viol = jnp.zeros((B,), bool)
        for k in range(nx):
            viol = jnp.logical_or(viol, new_state[k] < c('CON_LO', k))
            viol = jnp.logical_or(viol, new_state[k] > c('CON_HI', k))
        for d in range(nu):
            viol = jnp.logical_or(viol, noisy[d] > c('PHYS_HI'))
            viol = jnp.logical_or(viol, noisy[d] < c('PHYS_LO'))
        out_ref[15, :] += viol.astype(jnp.float32)

    # -- batched auto-reset --
    for k in range(nx):
        if randomized_reset:
            fresh = c('INIT_LO', k) + rnd[row + k, :] \
                * (c('INIT_HI', k) - c('INIT_LO', k))
        else:
            fresh = jnp.full((B,), c('INIT_LO', k))
        out_ref[k, :] = jnp.where(done, fresh, new_state[k])
    out_ref[12, :] = jnp.where(done, 0.0, new_step)
    out_ref[13, :] += rew
    out_ref[14, :] += done.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    'quad_type', 'n_steps', 'n_substeps', 'dt', 'draw_actions',
    'constrained', 'action_noise', 'randomized_reset', 'rew_exponential',
    'done_on_oob', 'policy_stochastic', 'policy_squash',
    'policy_activation', 'clip_obs', 'quadratic_cost'))
def _quad_rollout_pallas(state0, cfg, seed, quad_type: int, n_steps: int,
                         n_substeps: int, dt: float, actions=None,
                         draw_actions: bool = True, constrained: bool = False,
                         action_noise: bool = None,
                         randomized_reset: bool = True,
                         rew_exponential: bool = True,
                         done_on_oob: bool = True,
                         policy_params=None,
                         policy_stochastic: bool = False,
                         policy_squash: bool = False,
                         policy_activation: str = 'tanh',
                         clip_obs: float = 1e30,
                         x_goal=None,
                         quadratic_cost: bool = False):
    if action_noise is None:
        action_noise = constrained
    policy = policy_params is not None
    if policy:
        assert not draw_actions and actions is None, \
            'policy mode replaces the PRNG/replay action source'
    B, nx = state0.shape
    nu = _QUAD_SHAPE[quad_type]['nu']
    blk = jnp.zeros((16, B), jnp.float32).at[0:nx, :].set(state0.T)
    cfg2d = cfg.reshape(1, -1).astype(jnp.float32)
    seed1d = jnp.asarray(seed, jnp.int32).reshape(1)
    if draw_actions or policy:
        acts = jnp.zeros((8, nu * B), jnp.float32)
        act_index = lambda i: (0, 0)
    else:
        pad = (-n_steps) % 8
        # (T, nu, B) -> (T, nu*B): dim d occupies lanes [d*B, (d+1)*B).
        acts = jnp.pad(actions.astype(jnp.float32).reshape(n_steps, nu * B),
                       ((0, pad), (0, 0)))
        act_index = lambda i: (i // 8, 0)
    prefs = tuple(policy_params) if policy else ()
    tracking = x_goal is not None
    goal_args, goal_specs, n_goal = _goal_table(x_goal, 16, nx)

    out = pl.pallas_call(
        functools.partial(
            _quad_rollout_kernel, quad_type=quad_type, n_substeps=n_substeps,
            dt=dt, draw_actions=draw_actions, constrained=constrained,
            action_noise=action_noise, randomized_reset=randomized_reset,
            rew_exponential=rew_exponential, done_on_oob=done_on_oob,
            policy=policy, policy_stochastic=policy_stochastic,
            policy_squash=policy_squash,
            policy_activation=policy_activation, clip_obs=clip_obs,
            tracking=tracking, quadratic_cost=quadratic_cost, n_goal=n_goal),
        out_shape=jax.ShapeDtypeStruct((16, B), jnp.float32),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, cfg2d.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nu * B), act_index, memory_space=pltpu.VMEM),
            *goal_specs,
            *_policy_specs(prefs),
        ],
        out_specs=pl.BlockSpec((16, B), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(cfg2d, seed1d, blk, acts, *goal_args, *prefs)
    return {'state': out[0:nx, :].T, 'ctrl_step': out[12, :],
            'reward_sum': out[13, :], 'done_count': out[14, :],
            'violation_count': out[15, :]}


def quad2d_rollout_pallas(state0, cfg, seed, n_steps, n_substeps, dt,
                          **kw):
    return _quad_rollout_pallas(state0, cfg, seed, 2, n_steps, n_substeps,
                                dt, **kw)


def quad3d_rollout_pallas(state0, cfg, seed, n_steps, n_substeps, dt,
                          **kw):
    return _quad_rollout_pallas(state0, cfg, seed, 3, n_steps, n_substeps,
                                dt, **kw)


def _quad_rollout_cfg(env):
    import numpy as np

    from safe_control_gym_tpu.envs.benchmark_env import Cost, Task
    from safe_control_gym_tpu.envs.quadrotor import QuadType
    _check_task_cost(env)
    if env.RANDOMIZED_INERTIAL_PROP or env.adversary_disturbance:
        raise ValueError('fused rollout needs fixed params, no adversary')
    if env.PHYSICS != 'pyb':
        raise ValueError('fused rollout covers plain pyb physics only')
    if env.QUAD_TYPE not in (QuadType.TWO_D, QuadType.THREE_D):
        raise ValueError('fused rollout covers 2D/3D quads')
    _check_default_constraints(env)
    nx, nu = env.state_dim, env.action_dim
    cfg = np.zeros(QUAD_CFG_LEN, np.float32)
    for name, val in (('MASS', env.MASS), ('IXX', env.J[0, 0]),
                      ('IYY', env.J[1, 1]), ('IZZ', env.J[2, 2]),
                      ('ARM_L', env.L), ('GRAVITY', env.GRAVITY_ACC),
                      ('KF', env.KF), ('KM', env.KM),
                      ('PWM_SCALE', env.PWM2RPM_SCALE),
                      ('PWM_CONST', env.PWM2RPM_CONST),
                      ('PWM_MIN', env.MIN_PWM), ('PWM_MAX', env.MAX_PWM),
                      ('ACT_LO', env.action_space.low[0]),
                      ('ACT_HI', env.action_space.high[0]),
                      ('PHYS_LO', env.physical_action_bounds[0][0]),
                      ('PHYS_HI', env.physical_action_bounds[1][0]),
                      ('TOL_SQ', float(env.TASK_INFO.get(
                          'stabilization_goal_tolerance', 0.0)) ** 2
                       if env.TASK == Task.STABILIZATION else 0.0),
                      ('MAX_STEPS', env.CTRL_STEPS),
                      ('NOISE_STD', 0.0)):
        cfg[_Q[name]] = val
    if env.NORMALIZED_RL_ACTION_SPACE:
        cfg[_Q['DEN_A']] = env.norm_act_scale * env.hover_thrust
        cfg[_Q['DEN_B']] = env.hover_thrust
    else:
        cfg[_Q['DEN_A']] = 1.0
    if env.TASK == Task.STABILIZATION:
        cfg[_Q['GOAL']:_Q['GOAL'] + nx] = np.atleast_2d(env.X_GOAL)[0]
    # Tracking: GOAL/TOL_SQ unused — the time-indexed reference streams
    # in via the wrapper's ``x_goal`` (rollout_task_kwargs).
    cfg[_Q['U_GOAL']:_Q['U_GOAL'] + nu] = env.U_GOAL
    if env.COST == Cost.QUADRATIC:
        # -symbolic loss weights: 0.5*diag(Q)/(R) (quadrotor.py:848-862).
        cfg[_Q['W_STATE']:_Q['W_STATE'] + nx] = 0.5 * np.diag(env.Q)
        cfg[_Q['W_ACT']:_Q['W_ACT'] + nu] = 0.5 * np.diag(env.R)
    else:
        w_a = np.atleast_1d(env.rew_act_weight)
        cfg[_Q['W_ACT']:_Q['W_ACT'] + nu] = (w_a if w_a.size == nu
                                             else np.full(nu, w_a[0]))
        w_s = np.atleast_1d(env.rew_state_weight)
        cfg[_Q['W_STATE']:_Q['W_STATE'] + nx] = (w_s if w_s.size == nx
                                                 else np.full(nx, w_s[0]))
    nominal = env._nominal_init_state()
    lo, hi = nominal.copy(), nominal.copy()
    if env.RANDOMIZED_INIT:
        labels = env.INIT_STATE_LABELS[env.QUAD_TYPE]
        for k, name in enumerate(labels):
            info = env.INIT_STATE_RAND_INFO[name]
            if info.get('distrib') != 'uniform':
                raise ValueError('fused rollout: uniform init rand only')
            lo[k] += info['low']
            hi[k] += info['high']
    cfg[_Q['INIT_LO']:_Q['INIT_LO'] + nx] = lo
    cfg[_Q['INIT_HI']:_Q['INIT_HI'] + nx] = hi
    cfg[_Q['CON_LO']:_Q['CON_LO'] + nx] = env.state_space.low
    cfg[_Q['CON_HI']:_Q['CON_HI'] + nx] = env.state_space.high
    return jnp.asarray(cfg)


quad2d_rollout_cfg = _quad_rollout_cfg
quad3d_rollout_cfg = _quad_rollout_cfg
