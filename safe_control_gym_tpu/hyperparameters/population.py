"""Population-batched hyperparameter evaluation — the TPU-native HPO path.

The reference evaluates one hyperparameter draw at a time: each Optuna
trial trains a controller from scratch and evaluates it, so a 40-trial
study pays 40 sequential training runs coordinated through a MySQL server
(reference hyperparameters/hpo.py:117-158). On TPU the economics invert:
a cartpole PPO training run is a few fused scan programs whose batch
dimension is nowhere near saturating the chip (PERFORMANCE.md batch
scaling), so the right axis to widen is the *population*: B independent
hyperparameter draws train SIMULTANEOUSLY as one ``jax.vmap`` over the
entire training+evaluation program, with each draw's (lr, entropy coef,
clip, gamma, ...) riding in as traced scalars instead of baked-in Python
constants.

``make_population_ppo_evaluator`` builds that program for PPO (the
algorithm the reference's own HPO strategy module targets,
hpo_sampler.py:64-135): every vmapped lane runs

    init params -> scan[iterations]( rollout N envs x T steps -> GAE ->
    opt_epochs x minibatch Adam updates, KL-gated ) -> deterministic
    eval over n_eval episodes

exactly mirroring the PPO controller's fused ``learn()`` semantics
(controllers/ppo/ppo.py:_make_rollout/_make_fused + _make_eval_rollout)
— same loss functions, same KL gate, same Adam update rule — but with
the tunable hyperparameters promoted from closure constants to traced
per-lane values.

Vectorizable (traced, may differ per lane): ``actor_lr``, ``critic_lr``,
``entropy_coef``, ``target_kl``, ``clip_param``, ``gamma``,
``gae_lambda``, ``max_grad_norm``. Structural (static, shared by the
program): ``hidden_dim``, ``activation``, ``opt_epochs``,
``mini_batch_size``, ``rollout_steps``, ``rollout_batch_size``,
``iterations`` — a population sweep over those changes array shapes /
program structure and therefore compiles a separate executable per
combination (``HPO.vectorized`` groups trials accordingly).

Used by ``HPO(..., hpo_config={'vectorized_trials': B})`` — the study
still runs the reference's TPE ask/tell loop, but B trials per round are
scored by ONE device program. Wall-clock numbers: PERFORMANCE.md
"Population-batched HPO".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.ppo.ppo_utils import (
    actor_dist, compute_returns_and_advantages, critic_value,
    init_actor_critic, mlp_apply)

__all__ = ['VECTOR_HPS', 'STRUCTURAL_HPS', 'make_population_ppo_evaluator',
           'split_suggestion']

# Hyperparameters that become traced per-lane scalars.
VECTOR_HPS = ('actor_lr', 'critic_lr', 'entropy_coef', 'target_kl',
              'clip_param', 'gamma', 'gae_lambda', 'max_grad_norm')
# Hyperparameters that shape the program (static per executable).
STRUCTURAL_HPS = ('hidden_dim', 'activation', 'opt_epochs',
                  'mini_batch_size', 'rollout_steps', 'rollout_batch_size',
                  'max_env_steps')


def split_suggestion(suggestion: dict):
    """Partition a sampler suggestion into (vector, structural) dicts."""
    vec = {k: float(v) for k, v in suggestion.items() if k in VECTOR_HPS}
    struct = {k: v for k, v in suggestion.items() if k not in VECTOR_HPS}
    return vec, struct


# -- Adam with traced hyperparameters ----------------------------------
# optax.adam's learning rate is a closure constant, which cannot vary
# across vmap lanes; this is the identical update rule (b1/b2/eps match
# optax defaults, global-norm clip matches optax.clip_by_global_norm)
# with (lr, max_grad_norm) as data.

def _adam_init(params):
    return {'m': jax.tree.map(jnp.zeros_like, params),
            'v': jax.tree.map(jnp.zeros_like, params),
            't': jnp.zeros((), jnp.float32)}


def _adam_step(grads, state, params, lr, max_grad_norm,
               b1=0.9, b2=0.999, eps=1e-8):
    gnorm = jnp.sqrt(sum(jnp.sum(g * g)
                         for g in jax.tree.leaves(grads)) + 1e-24)
    scale = jnp.minimum(1.0, max_grad_norm / gnorm)
    grads = jax.tree.map(lambda g: g * scale, grads)
    t = state['t'] + 1.0
    m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state['m'], grads)
    v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                     state['v'], grads)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    new_params = jax.tree.map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params, m, v)
    return new_params, {'m': m, 'v': v, 't': t}


def make_population_ppo_evaluator(env_func, rollout_batch_size=32,
                                  rollout_steps=64, iterations=20,
                                  opt_epochs=10, mini_batch_size=64,
                                  hidden_dim=64, activation='tanh',
                                  use_gae=True, n_eval=5,
                                  mesh=None, axis_name='pop'):
    """Build ``evaluate(hp_arrays, keys) -> (B, n_eval) episode returns``.

    ``hp_arrays`` maps each name in ``VECTOR_HPS`` to a (B,) float array
    (missing names fall back to the PPO registry defaults); ``keys`` is a
    (B, 2) PRNG key batch — one independent training seed per lane, so
    repetitions are expressed as extra lanes with the same hp row. The
    returned callable is jitted once; every call trains and evaluates all
    B hyperparameter draws in a single device program.

    With ``mesh`` set, the POPULATION axis shards over
    ``mesh.shape[axis_name]`` chips (trials are independent, so the SPMD
    partition needs no collectives — each chip trains B/n_chips draws;
    the study scales out linearly as long as B divides the mesh axis).
    Witnessed by ``__graft_entry__.dryrun_multichip``.
    """
    env = env_func()
    func = env.func
    obs_dim = env.observation_space.shape[0]
    act_dim = env.action_space.shape[0]
    env.close()
    N, T = int(rollout_batch_size), int(rollout_steps)
    eval_steps = int(func.max_steps) + 1
    defaults = {'actor_lr': 3e-4, 'critic_lr': 1e-3, 'entropy_coef': 0.01,
                'target_kl': 0.01, 'clip_param': 0.2, 'gamma': 0.99,
                'gae_lambda': 0.95, 'max_grad_norm': 0.5}

    step_autoreset = func.step_autoreset
    step_v = jax.vmap(func.step)
    reset_v = jax.vmap(func.reset)

    def rollout(params, hp, env_states, obs, key):
        """T steps x N envs + GAE, per-lane hp (ppo.py:_make_rollout)."""
        def body(carry, _):
            env_states, obs, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            dist = actor_dist(params, obs, activation)
            act = dist.sample(k_act)
            logp = dist.log_prob(act)
            v = critic_value(params, obs, activation)
            env_states, out, next_obs = step_autoreset(env_states, act,
                                                       k_reset)
            mask = 1.0 - out.done.astype(jnp.float32)
            term_v = critic_value(params, out.obs, activation)
            terminal_v = jnp.where(out.truncated[:, None], term_v, 0.0)
            ys = (obs, act, out.reward[:, None], mask[:, None], v, logp,
                  terminal_v, out.reward)
            return (env_states, next_obs, key), ys

        (env_states, obs, key), ys = jax.lax.scan(
            body, (env_states, obs, key), None, length=T)
        (obs_b, act_b, rew_b, mask_b, v_b, logp_b, term_v_b, raw_rew) = ys
        last_val = critic_value(params, obs, activation)
        rets, advs = compute_returns_and_advantages(
            rew_b, v_b, mask_b, term_v_b, last_val, hp['gamma'], use_gae,
            hp['gae_lambda'])
        advs = (advs - advs.mean()) / (advs.std() + 1e-6)
        batch = {
            'obs': obs_b.reshape(T * N, -1),
            'act': act_b.reshape(T * N, -1),
            'logp': logp_b.reshape(T * N, -1),
            'adv': advs.reshape(T * N, -1),
            'ret': rets.reshape(T * N, -1),
            'v': v_b.reshape(T * N, -1),
        }
        return env_states, obs, key, batch, raw_rew.mean()

    def policy_loss(actor_params, hp, obs, act, logp_old, adv):
        """Clipped surrogate + entropy, hp-traced (ppo_utils.py:policy_loss_fn)."""
        dist = actor_dist(actor_params, obs, activation)
        logp = dist.log_prob(act)
        ratio = jnp.exp(jnp.clip(logp - logp_old, -20.0, 20.0))
        clip_adv = jnp.clip(ratio, 1 - hp['clip_param'],
                            1 + hp['clip_param']) * adv
        pl = -jnp.minimum(ratio * adv, clip_adv).mean()
        el = -dist.entropy().mean()
        kl = (logp_old - logp).mean()
        return pl + hp['entropy_coef'] * el, kl

    def value_loss(critic_params, obs, ret):
        v_cur = mlp_apply(critic_params, obs, activation)
        return 0.5 * ((v_cur - ret) ** 2).mean()

    def update(params, a_opt, c_opt, hp, batch, key):
        """opt_epochs x minibatches, KL-gated (ppo_utils.py:_make_update)."""
        M = T * N
        mb = min(int(mini_batch_size), M)
        num_mb = max(M // mb, 1)
        used = num_mb * mb

        def epoch_body(carry, ep_key):
            params, a_opt, c_opt = carry
            mb_idx = jax.random.permutation(ep_key, M)[:used].reshape(
                num_mb, mb)

            def mb_body(carry, idx):
                params, a_opt, c_opt = carry
                mbatch = {k: v[idx] for k, v in batch.items()}
                actor_sub = {k: params[k] for k in ('actor', 'logstd')
                             if k in params}
                (_, kl), grads = jax.value_and_grad(
                    policy_loss, has_aux=True)(
                        actor_sub, hp, mbatch['obs'], mbatch['act'],
                        mbatch['logp'], mbatch['adv'])
                actor_new, a_opt_new = _adam_step(
                    grads, a_opt, actor_sub, hp['actor_lr'],
                    hp['max_grad_norm'])
                gate = jnp.logical_or(hp['target_kl'] <= 0,
                                      kl <= 1.5 * hp['target_kl'])
                actor_applied = jax.tree.map(
                    lambda new, old: jnp.where(gate, new, old),
                    actor_new, actor_sub)
                a_opt = jax.tree.map(
                    lambda new, old: jnp.where(gate, new, old),
                    a_opt_new, a_opt)
                v_grads = jax.grad(value_loss)(params['critic'],
                                               mbatch['obs'], mbatch['ret'])
                critic_new, c_opt = _adam_step(
                    v_grads, c_opt, params['critic'], hp['critic_lr'],
                    hp['max_grad_norm'])
                params = dict(actor_applied, critic=critic_new)
                return (params, a_opt, c_opt), None

            (params, a_opt, c_opt), _ = jax.lax.scan(
                mb_body, (params, a_opt, c_opt), mb_idx)
            return (params, a_opt, c_opt), None

        (params, a_opt, c_opt), _ = jax.lax.scan(
            epoch_body, (params, a_opt, c_opt),
            jax.random.split(key, int(opt_epochs)))
        return params, a_opt, c_opt

    def train_and_eval(hp, key):
        """One lane: full training run + deterministic eval."""
        k_init, k_env, k_train, k_eval = jax.random.split(key, 4)
        params = init_actor_critic(k_init, obs_dim, act_dim,
                                   [int(hidden_dim)] * 2)
        actor_sub = {k: params[k] for k in ('actor', 'logstd')
                     if k in params}
        a_opt = _adam_init(actor_sub)
        c_opt = _adam_init(params['critic'])
        env_states, obs = reset_v(jax.random.split(k_env, N))

        def iteration(carry, k):
            params, a_opt, c_opt, env_states, obs = carry
            kr, ku = jax.random.split(k)
            env_states, obs, _, batch, mean_rew = rollout(
                params, hp, env_states, obs, kr)
            params, a_opt, c_opt = update(params, a_opt, c_opt, hp, batch,
                                          ku)
            return (params, a_opt, c_opt, env_states, obs), mean_rew

        (params, a_opt, c_opt, env_states, obs), _ = jax.lax.scan(
            iteration, (params, a_opt, c_opt, env_states, obs),
            jax.random.split(k_train, int(iterations)))

        # Deterministic eval: n_eval parallel episodes to completion
        # (ppo.py:_make_eval_rollout semantics).
        states, eobs = reset_v(jax.random.split(k_eval, n_eval))
        alive0 = jnp.ones((n_eval,), bool)

        def eval_body(carry, _):
            states, eobs, alive = carry
            act = actor_dist(params, eobs, activation).mode()
            states, out = step_v(states, act)
            rew = jnp.where(alive, out.reward, 0.0)
            alive = jnp.logical_and(alive, jnp.logical_not(out.done))
            return (states, out.obs, alive), rew

        _, rews = jax.lax.scan(eval_body, (states, eobs, alive0), None,
                               length=eval_steps)
        return rews.sum(0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        pop_sh = NamedSharding(mesh, P(axis_name))
        batched = jax.jit(
            jax.vmap(train_and_eval),
            in_shardings=({k: pop_sh for k in VECTOR_HPS}, pop_sh),
            out_shardings=pop_sh)
    else:
        batched = jax.jit(jax.vmap(train_and_eval))

    def evaluate(hp_arrays, keys):
        B = keys.shape[0]
        if mesh is not None:
            assert B % mesh.shape[axis_name] == 0, \
                f'population {B} must divide the {axis_name} mesh axis'
        hp_full = {k: jnp.asarray(hp_arrays.get(k, np.full(B, defaults[k])),
                                  jnp.float32)
                   for k in VECTOR_HPS}
        return batched(hp_full, keys)

    evaluate.env_steps_per_lane = N * T * int(iterations)
    return evaluate
