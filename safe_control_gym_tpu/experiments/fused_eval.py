"""Fused closed-loop policy evaluation — a trained RL policy over a large
env fleet in (ideally) ONE device program.

The reference evaluates policies with a host loop: one ``select_action``
plus one env step per Python iteration, optionally across subprocess
vec-env workers (reference: experiments/base_experiment.py:54-115 and
envs/env_wrappers/vectorized_env/subproc_vec_env.py:20-64) — ~1e3 steps/s.
Here the same closed-loop workload (actor forward -> full env step ->
batched auto-reset -> episode statistics) compiles into one of two
TPU-native programs:

* ``policy-in-kernel`` — the whole T-step rollout as a single Pallas
  kernel launch (``ops/rollout_kernels.py`` policy mode): the actor MLP
  is an in-kernel MXU dot per grid step, the state never leaves VMEM,
  and exploration noise comes from the on-core PRNG. This is the
  bench-measured 243-439M steps/s path (``bench.py`` CLOSED-LOOP rows).
* ``per-step-scan`` — a ``lax.scan`` over the batched functional env
  (``FuncEnv.step_autoreset``) with the action computed by the
  controller's own XLA forward functions. Works on every backend and
  serves the configs the kernel gates out; still one device program.

Both paths return fleet-level episode statistics (the per-env tape stays
on device and is reduced there; outputs are O(1) in rollout length).

Supported controllers: PPO (continuous), SAC, DDPG — the three MLP-actor
algorithms whose action conventions the kernel reproduces exactly
(PPO: mean action on rms-normalized obs; SAC/DDPG: tanh squash + the
env's affine de-normalization). SafeExplorerPPO is excluded: its safety
projection runs between the actor and the env and is not an in-kernel
op.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['evaluate_policy_fused', 'policy_eval_spec']


def policy_eval_spec(ctrl, env, stochastic=False):
    """Extract the kernel-facing policy description from a controller.

    Returns a dict with: ``actor`` (mlp_init pytree), ``activation``,
    ``squash`` (SAC/DDPG tanh convention), ``std`` ((nu,) exploration
    std, stochastic PPO only), ``obs_mean``/``obs_var`` (frozen
    normalizer stats or None), ``clip_obs``, and ``action_fn`` —
    ``(obs, key) -> action`` reproducing the controller's own
    ``select_action`` semantics in XLA (the per-step-scan path and the
    ground truth the kernel path is statistically pinned against).

    Raises ValueError for policies the fused paths cannot reproduce
    (discrete PPO, stochastic SAC's state-dependent std, squashed
    policies on non-normalized action spaces).
    """
    name = type(ctrl).__name__
    if name == 'PPO':
        params = ctrl.agent.params
        if 'logstd' not in params:
            raise ValueError('fused eval: discrete PPO actor unsupported')
        activation = ctrl.agent.activation
        norm = bool(ctrl.norm_obs) and ctrl.obs_norm_state is not None
        obs_mean = np.asarray(ctrl.obs_norm_state.mean) if norm else None
        obs_var = np.asarray(ctrl.obs_norm_state.var) if norm else None
        clip_obs = float(ctrl.clip_obs) if norm else 1e30
        std = jnp.exp(params['logstd'])

        from safe_control_gym_tpu.controllers.ppo.ppo_utils import actor_dist

        def action_fn(obs, key):
            if norm:
                obs = jnp.clip((obs - obs_mean) /
                               jnp.sqrt(obs_var + 1e-8), -clip_obs, clip_obs)
            dist = actor_dist(params, obs, activation)
            return dist.sample(key) if stochastic else dist.mode()

        return dict(actor=params['actor'], activation=activation,
                    squash=False, std=std, obs_mean=obs_mean,
                    obs_var=obs_var, clip_obs=clip_obs, action_fn=action_fn)

    if name in ('SAC', 'DDPG'):
        if stochastic:
            raise ValueError(
                'fused eval: stochastic mode is PPO-only (SAC exploration '
                'std is state-dependent, DDPG uses OU training noise); '
                f'{name} evaluates deterministically')
        if not env.NORMALIZED_RL_ACTION_SPACE:
            raise ValueError(
                'fused eval: SAC/DDPG tanh policies need the normalized '
                'action space (the kernel squash maps to [-1, 1]; the '
                'controller unscale to a physical box is not in-kernel)')
        params = ctrl.agent.params
        activation = ctrl.agent.activation
        lo = jnp.asarray(env.action_space.low, jnp.float32)
        hi = jnp.asarray(env.action_space.high, jnp.float32)
        if name == 'SAC':
            from safe_control_gym_tpu.controllers.sac.sac_utils import \
                sac_actor_forward

            def action_fn(obs, key):
                act, _ = sac_actor_forward(
                    params['actor'], obs, key, lo, hi, activation,
                    deterministic=True, with_logprob=False)
                return act
        else:
            from safe_control_gym_tpu.controllers.ddpg.ddpg_utils import \
                ddpg_actor_forward

            def action_fn(obs, key):
                return ddpg_actor_forward(params['actor'], obs, lo, hi,
                                          activation)

        return dict(actor=params['actor'], activation=activation,
                    squash=True, std=None, obs_mean=None, obs_var=None,
                    clip_obs=1e30, action_fn=action_fn)

    raise ValueError(f'fused eval supports PPO/SAC/DDPG, got {name}')


def _kernel_tables(env):
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    if env.NAME == 'cartpole':
        return rk.cartpole_rollout_cfg, rk.cartpole_rollout_pallas, 8, rk._C
    if env.NAME == 'quadrotor':
        qt = int(env.QUAD_TYPE)
        if qt == 2:
            return rk.quad2d_rollout_cfg, rk.quad2d_rollout_pallas, 16, rk._Q
        if qt == 3:
            return rk.quad3d_rollout_cfg, rk.quad3d_rollout_pallas, 16, rk._Q
    raise ValueError(f'fused eval kernel: no kernel for env {env.NAME}')


def _kernel_gates(spec, env, stochastic):
    """ALL the coverage gates, and nothing that can fail for other
    reasons: a ValueError from here means 'config outside kernel
    coverage' (the documented fallback signal — errors raised by the
    actual kernel run must PROPAGATE, never read as coverage; same
    protocol as bench.py's ``kernel_covers``). Returns (cfg,
    action_noise)."""
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    cfg_fn, _, _, cidx = _kernel_tables(env)
    cfg = cfg_fn(env)                       # coverage gate (raises)
    rk.check_policy_obs(env)                # obs == state gate (raises)
    if stochastic:
        cfg = jax.lax.dynamic_update_slice(
            cfg, jnp.asarray(spec['std'], jnp.float32), (cidx['P_STD'],))
    # The kernel reproduces exactly one disturbance channel: iid white
    # action noise (the cfg builder leaves NOISE_STD at 0; callers fold
    # the env's std — same protocol as measure_rollout_kernel). Any
    # other disturbance falls back to the scan, which runs the
    # production step's full disturbance pipeline.
    action_noise = False
    for chan, dlist in (env.disturbances or {}).items():
        specs = dlist.disturbances
        if chan == 'action' and len(specs) == 1 \
                and type(specs[0]).__name__ == 'WhiteNoise':
            std = np.atleast_1d(np.asarray(specs[0].std, np.float32))
            if not np.all(std == std[0]):   # one NOISE_STD cfg slot
                raise ValueError('fused eval kernel: per-dim action-noise '
                                 'std outside kernel coverage')
            cfg = cfg.at[cidx['NOISE_STD']].set(std[0])
            action_noise = True
        else:
            raise ValueError(f'fused eval kernel: {chan} disturbance '
                             'outside kernel coverage')
    return cfg, action_noise


def _kernel_eval(spec, env, batch, n_steps, seed, stochastic, n_reps,
                 gates=None):
    """Policy-in-kernel path: one Pallas launch for the whole rollout."""
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    _, roll_fn, rows, _ = _kernel_tables(env)
    cfg, action_noise = gates if gates is not None else \
        _kernel_gates(spec, env, stochastic)
    prefs = rk.pack_policy_params(spec['actor'], nx=env.state_dim,
                                  rows=rows, obs_mean=spec['obs_mean'],
                                  obs_var=spec['obs_var'])
    constrained = env.constraints is not None \
        and bool(env.constraints.constraints)
    states, _ = jax.jit(lambda k: env.func.reset_batch(k, batch))(
        jax.random.PRNGKey(seed))
    kw = dict(n_substeps=env.PYB_STEPS_PER_CTRL, dt=env.PYB_TIMESTEP,
              draw_actions=False, constrained=constrained,
              action_noise=action_noise,
              randomized_reset=bool(env.RANDOMIZED_INIT),
              policy_params=prefs, policy_stochastic=stochastic,
              policy_squash=spec['squash'],
              policy_activation=spec['activation'],
              clip_obs=spec['clip_obs'], **rk.rollout_task_kwargs(env))

    # jit the wrapper call: roll_fn builds a fresh pallas_call per Python
    # invocation, so an unjitted repeat pays host trace/lowering every
    # call (~0.3 s — measured 75M vs 290M steps/s on the demo workload);
    # under jit the repeat calls hit the C++ fast path.
    roll_jit = jax.jit(lambda st, c, s: roll_fn(st, c, s,
                                                n_steps=n_steps, **kw))

    def run(s):
        out = roll_jit(states.state, cfg, jnp.asarray(s, jnp.int32))
        # Warm the timed region's scalar-fetch program too: its first use
        # would otherwise compile inside the timing (~0.3 s through the
        # remote-compile tunnel — measured as a 4x throughput hit at
        # T=8192 with n_reps=1).
        float(jnp.sum(out['reward_sum']))
        return (np.asarray(out['reward_sum']),
                np.asarray(out['done_count']),
                np.asarray(out['violation_count']) if constrained else None)

    rew, dn, vi = run(seed)                  # warm-up (compile) + values
    best = float('inf')
    for r in range(n_reps):
        t0 = time.perf_counter()
        out = roll_jit(states.state, cfg, jnp.asarray(seed + 1 + r,
                                                      jnp.int32))
        float(jnp.sum(out['reward_sum']))
        best = min(best, time.perf_counter() - t0)
    per_env = dict(reward_sum=rew, done_count=dn)
    if vi is not None:
        per_env['violation_count'] = vi
    totals = (float(rew.sum()), float(dn.sum()),
              float(vi.sum()) if vi is not None else 0.0, None)
    return totals, per_env, best


def _scan_eval(spec, env, batch, n_steps, seed, n_reps, mesh=None,
               axis_name='env'):
    """Per-step-scan path: ``lax.scan`` over ``FuncEnv.step_autoreset``
    with the controller's own XLA action function. Any backend. With a
    ``mesh``, the env batch is sharded over ``axis_name`` (policy params
    replicate; the rollout is embarrassingly parallel — zero cross-chip
    traffic until the final per-env reduction on host)."""
    func = env.func
    if func.step_autoreset is None or func.reset_batch is None:
        raise ValueError('fused eval scan path needs the batched '
                         'functional env (step_autoreset/reset_batch)')
    action_fn = spec['action_fn']
    counts = env.constraints is not None and bool(env.constraints.constraints)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        batch_sh = NamedSharding(mesh, PartitionSpec(axis_name))

    @jax.jit
    def run(key):
        k0, key = jax.random.split(key)
        states, obs = func.reset_batch(k0, batch)
        if mesh is not None:
            states = jax.lax.with_sharding_constraint(
                states, jax.tree.map(lambda _: batch_sh, states))
            obs = jax.lax.with_sharding_constraint(obs, batch_sh)
        z = jnp.zeros((batch,), jnp.float32)

        def body(carry, _):
            states, obs, key, rew, dn, vi, mse = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            act = action_fn(obs, k_act)
            states, out, next_obs = func.step_autoreset(states, act, k_reset)
            rew = rew + out.reward
            dn = dn + out.done.astype(jnp.float32)
            if counts:
                vi = vi + out.constraint_violation.astype(jnp.float32)
            mse = mse + out.mse
            return (states, next_obs, key, rew, dn, vi, mse), None

        (_, _, _, rew, dn, vi, mse), _ = jax.lax.scan(
            body, (states, obs, key, z, z, z, z), None, length=n_steps)
        return rew, dn, vi, mse

    key = jax.random.PRNGKey(seed)
    out0 = run(key)                          # warm-up (compile) + values
    float(out0[0].sum())                     # warm the timed scalar fetch
    rew, dn, vi, mse = map(np.asarray, out0)
    totals = (float(rew.sum()), float(dn.sum()), float(vi.sum()),
              float(mse.sum()))
    per_env = dict(reward_sum=rew, done_count=dn)
    if counts:
        per_env['violation_count'] = vi
    best = float('inf')
    for r in range(n_reps):
        kr = jax.random.PRNGKey(seed + 1 + r)
        t0 = time.perf_counter()
        float(run(kr)[0].sum())
        best = min(best, time.perf_counter() - t0)
    return totals, per_env, best


def evaluate_policy_fused(ctrl, env=None, batch=1024, n_steps=4096, seed=0,
                          stochastic=False, use_kernel=None, n_reps=1,
                          return_per_env=False, mesh=None, axis_name='env'):
    """Evaluate ``ctrl``'s policy closed-loop over ``batch`` parallel envs
    for ``n_steps`` control steps; return fleet-level episode statistics.

    Args:
        ctrl: a trained PPO / SAC / DDPG controller.
        env: env to evaluate on (defaults to ``ctrl.env``). Episodes
            auto-reset; statistics aggregate over all completed episodes
            (the trailing partial episode per env contributes reward but
            no episode count — negligible for ``n_steps >> episode_len``).
        stochastic: PPO only — sample the Gaussian policy instead of its
            mean (the collect-time distribution).
        use_kernel: force the path. None = auto (policy-in-kernel on TPU
            when the config passes the kernel's coverage gates, else the
            per-step scan).
        n_reps: timing repetitions for ``steps_per_sec`` (best-of).
        return_per_env: include ``per_env`` — (batch,) ``reward_sum`` /
            ``done_count`` (+ ``violation_count``) arrays, the iid
            samples behind the fleet means.
        mesh: optional ``jax.sharding.Mesh`` — shard the env fleet over
            ``axis_name`` (scan path; each chip rolls out its own env
            shard with replicated policy params). Identical statistics
            to the single-device run — the reduction is per-env.

    Returns a dict: ``episodes``, ``ep_return_mean``, ``ep_length_mean``,
    ``total_steps``, ``total_violations`` (constrained envs),
    ``rmse`` (scan path only — the kernel does not tape MSE),
    ``steps_per_sec`` (post-compile), ``path``.
    """
    env = env if env is not None else ctrl.env
    spec = policy_eval_spec(ctrl, env, stochastic=stochastic)
    path = None
    if mesh is not None:
        if use_kernel:
            raise ValueError('fused eval: mesh sharding runs the scan '
                             'path (the Pallas kernel is per-chip)')
        totals, per_env, best = _scan_eval(spec, env, batch, n_steps, seed,
                                           n_reps, mesh=mesh,
                                           axis_name=axis_name)
        path = 'per-step-scan-sharded'
    elif use_kernel is None:
        if jax.default_backend() != 'cpu':
            try:
                gates = _kernel_gates(spec, env, stochastic)
            except ValueError:
                gates = None                 # gated out -> scan below
            if gates is not None:            # kernel errors PROPAGATE
                totals, per_env, best = _kernel_eval(
                    spec, env, batch, n_steps, seed, stochastic, n_reps,
                    gates=gates)
                path = 'policy-in-kernel'
    elif use_kernel:
        totals, per_env, best = _kernel_eval(spec, env, batch, n_steps,
                                             seed, stochastic, n_reps)
        path = 'policy-in-kernel'
    if path is None:
        totals, per_env, best = _scan_eval(spec, env, batch, n_steps, seed,
                                           n_reps)
        path = 'per-step-scan'
    rew, episodes, violations, mse = totals
    total_steps = batch * n_steps
    out = dict(
        path=path,
        total_steps=total_steps,
        episodes=int(episodes),
        ep_return_mean=rew / max(episodes, 1.0),
        ep_length_mean=total_steps / max(episodes, 1.0),
        steps_per_sec=total_steps / best,
    )
    if env.constraints is not None and bool(env.constraints.constraints):
        out['total_violations'] = int(violations)
    if mse is not None:
        out['rmse'] = float(np.sqrt(mse / total_steps))
    if return_per_env:
        out['per_env'] = per_env
    return out
