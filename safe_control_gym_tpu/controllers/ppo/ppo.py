"""Proximal Policy Optimization — TPU-native rebuild of
controllers/ppo/ppo.py (359 LoC reference).

Where the reference steps ``rollout_batch_size`` subprocess envs from Python
(SubprocVecEnv pipes, ppo.py:272-284), here the rollout is a single jitted
``lax.scan`` over a vmapped functional env batch: acting, stepping, obs/rew
normalization, truncation bootstrapping (terminal_v, ppo.py:274-283), and
auto-reset all happen on device; one host dispatch per training iteration.
GAE and the KL-gated minibatch updates are also fully fused (ppo_utils.py).

Parity map: config surface = ppo.yaml; obs/reward normalizers saved in
checkpoints incl. PRNG state for exact resume (ppo.py:112-148); periodic /
interval / best-eval checkpointing (:150-191); deterministic eval via dist
mode (ppo_utils.py:233-238).
"""

from __future__ import annotations

import os
import pickle
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base_controller import BaseController
from safe_control_gym_tpu.controllers.ppo.ppo_utils import (
    PPOAgent, actor_dist, compute_returns_and_advantages, critic_value)
from safe_control_gym_tpu.math.normalization import (
    NormalizerState, RetState, ret_init, ret_normalize, ret_update, rms_init,
    rms_normalize, rms_update)
from safe_control_gym_tpu.utils.logging import ExperimentLogger

__all__ = ['PPO']


class PPO(BaseController):
    """Proximal policy optimization."""

    def __init__(self, env_func, training=True, checkpoint_path='model_latest.pt',
                 output_dir='temp', use_gpu=False, seed: int = 0, **kwargs):
        super().__init__(env_func, training=training,
                         checkpoint_path=checkpoint_path,
                         output_dir=output_dir, use_gpu=use_gpu, seed=seed,
                         **kwargs)
        # Task envs.
        self.env = env_func(seed=seed)
        self.eval_env = env_func(seed=seed * 111 + 1)
        self.func_env = self.env.func
        self.N = int(self.rollout_batch_size)
        self.T = int(self.rollout_steps)
        self.gamma = float(self.gamma)

        # Agent.
        self.agent = PPOAgent(self.env.observation_space,
                              self.env.action_space,
                              hidden_dim=self.hidden_dim,
                              use_clipped_value=self.use_clipped_value,
                              clip_param=self.clip_param,
                              target_kl=self.target_kl,
                              entropy_coef=self.entropy_coef,
                              actor_lr=self.actor_lr,
                              critic_lr=self.critic_lr,
                              opt_epochs=self.opt_epochs,
                              mini_batch_size=self.mini_batch_size,
                              activation=self.activation,
                              max_grad_norm=self.max_grad_norm,
                              seed=seed)

        # Normalizer functional states.
        obs_dim = self.env.observation_space.shape[0]
        self.obs_norm_state = rms_init((obs_dim,)) if self.norm_obs else None
        self.ret_norm_state = ret_init(self.N) if self.norm_reward else None

        self.total_steps = 0
        self._key = jax.random.PRNGKey(seed)
        self.logger = ExperimentLogger(output_dir,
                                       use_tensorboard=getattr(self, 'tensorboard', False))
        self._rollout_jit = jax.jit(self._make_rollout())
        self._fused_jit = jax.jit(self._make_fused())
        self._env_states = None
        self._obs = None

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _make_rollout(self):
        """Fused on-device rollout: T steps x N envs + GAE."""
        norm_obs = bool(self.norm_obs)
        norm_reward = bool(self.norm_reward)
        clip_obs = float(self.clip_obs)
        clip_reward = float(self.clip_reward)
        gamma = self.gamma
        use_gae = bool(self.use_gae)
        gae_lambda = float(self.gae_lambda)
        activation = self.agent.activation
        N, T = self.N, self.T

        step_autoreset = self.func_env.step_autoreset

        def rollout(params, env_states, obs, obs_norm, ret_state, key):
            def body(carry, _):
                env_states, obs, obs_norm, ret_state, key = carry
                key, k_act, k_reset = jax.random.split(key, 3)
                if norm_obs:
                    obs_norm = rms_update(obs_norm, obs)
                    obs_n = rms_normalize(obs_norm, obs, clip_obs)
                else:
                    obs_n = obs
                dist = actor_dist(params, obs_n, activation)
                act = dist.sample(k_act)
                logp = dist.log_prob(act)
                v = critic_value(params, obs_n, activation)
                # Step + batched auto-reset in one fused path (the cheap
                # reset only re-randomizes init state; see FuncEnv).
                env_states, out, next_obs = step_autoreset(env_states, act,
                                                           k_reset)
                rew = out.reward
                if norm_reward:
                    ret_state = ret_update(ret_state, rew, out.done, gamma)
                    rew_n = ret_normalize(ret_state, rew, clip_reward)
                else:
                    rew_n = rew
                mask = 1.0 - out.done.astype(jnp.float32)
                # Terminal value bootstrap on time truncation (ppo.py:274-283).
                term_obs_n = (rms_normalize(obs_norm, out.obs, clip_obs)
                              if norm_obs else out.obs)
                term_v = critic_value(params, term_obs_n, activation)
                terminal_v = jnp.where(out.truncated[:, None], term_v, 0.0)
                ys = (obs_n, act, rew_n[:, None], mask[:, None], v, logp,
                      terminal_v, rew, out.done, out.mse,
                      out.constraint_violation)
                return (env_states, next_obs, obs_norm, ret_state, key), ys

            (env_states, obs, obs_norm, ret_state, key), ys = jax.lax.scan(
                body, (env_states, obs, obs_norm, ret_state, key), None,
                length=T)
            (obs_b, act_b, rew_b, mask_b, v_b, logp_b, term_v_b,
             raw_rew_b, done_b, mse_b, cviol_b) = ys
            obs_last_n = (rms_normalize(obs_norm, obs, clip_obs)
                          if norm_obs else obs)
            last_val = critic_value(params, obs_last_n, activation)
            rets, advs = compute_returns_and_advantages(
                rew_b, v_b, mask_b, term_v_b, last_val, gamma, use_gae,
                gae_lambda)
            # Advantage normalization (ppo.py:300).
            advs = (advs - advs.mean()) / (advs.std() + 1e-6)
            batch = {
                'obs': obs_b.reshape(T * N, -1),
                'act': act_b.reshape(T * N, -1),
                'logp': logp_b.reshape(T * N, -1),
                'adv': advs.reshape(T * N, -1),
                'ret': rets.reshape(T * N, -1),
                'v': v_b.reshape(T * N, -1),
            }
            stats = {
                'mean_reward': raw_rew_b.mean(),
                'dones': done_b.sum(),
                'mean_mse': mse_b.mean(),
                'constraint_violations': cviol_b.sum(),
            }
            return env_states, obs, obs_norm, ret_state, key, batch, stats

        return rollout

    def _make_fused(self):
        """K complete (rollout -> epochs x minibatch update) iterations as
        ONE device program.

        A `lax.scan` over the full PPO iteration removes the per-iteration
        host round-trips (the dev tunnel charges tens of ms per dispatch);
        normalizer states, env states, and optimizer states all live in
        the scan carry. Per-iteration scalars come back stacked for
        logging.
        """
        rollout = self._make_rollout()
        update = self.agent._make_update()

        def fused(params, a_state, c_state, env_states, obs, obs_norm,
                  ret_state, key):
            def body(carry, k):
                (params, a_state, c_state, env_states, obs, obs_norm,
                 ret_state) = carry
                kr, ku = jax.random.split(k)
                (env_states, obs, obs_norm, ret_state, _, batch,
                 stats) = rollout(params, env_states, obs, obs_norm,
                                  ret_state, kr)
                params, a_state, c_state, results = update(
                    params, a_state, c_state, batch, ku)
                return (params, a_state, c_state, env_states, obs, obs_norm,
                        ret_state), {**stats, **results}
            K = max(1, int(getattr(self, 'fused_iterations', 1)))
            keys = jax.random.split(key, K)
            carry, outs = jax.lax.scan(
                body, (params, a_state, c_state, env_states, obs, obs_norm,
                       ret_state), keys)
            return carry, jax.tree.map(lambda x: x.mean(), outs)

        return fused

    # ------------------------------------------------------------------
    def reset(self):
        """Prepare for training or evaluation (ppo.py:83-110 analog)."""
        if self.training:
            keys = jax.random.split(self._next_key(), self.N)
            self._env_states, self._obs = jax.vmap(self.func_env.reset)(keys)
        self.setup_results_dict()

    def shard_over(self, mesh, axis_name: str = 'env',
                   model_axis: str = None):
        """Distribute training over a ``jax.sharding.Mesh``: env states and
        rollout batch sharded along ``axis_name`` (data parallel), agent and
        optimizer state replicated. Every subsequent ``learn()`` program —
        including the ``fused_iterations`` multi-iteration scan — runs SPMD
        over the mesh; the batch-mean gradients inside the update become
        cross-chip psum collectives inserted by XLA from the shardings.
        The TPU replacement for the reference's SubprocVecEnv workers.

        With ``model_axis`` set (2-D dp x tp mesh from
        ``parallel.sharding.make_dp_tp_mesh``), actor/critic parameters and
        their Adam moments are additionally megatron-partitioned over the
        model axis (``mlp_tp_shardings``): hidden weight matrices split
        column-/row-wise across chips, activations psum-reduced between
        them by XLA. Gradients then reduce over BOTH axes — batch means
        across 'env', feature partials across 'model'."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert self.N % mesh.shape[axis_name] == 0, \
            'rollout_batch_size must divide evenly over the mesh'
        if self._env_states is None:
            self.reset()
        batch_sh = NamedSharding(mesh, P(axis_name))
        repl = NamedSharding(mesh, P())
        self._env_states = jax.device_put(
            self._env_states,
            jax.tree.map(lambda _: batch_sh, self._env_states))
        self._obs = jax.device_put(self._obs, batch_sh)
        if model_axis is not None and mesh.shape[model_axis] > 1:
            from safe_control_gym_tpu.parallel.sharding import (
                actor_critic_tp_shardings)
            import optax
            param_sh = actor_critic_tp_shardings(mesh, self.agent.params,
                                                 model_axis)
            self.agent.params = jax.device_put(self.agent.params, param_sh)
            actor_sh = {k: param_sh[k] for k in ('actor', 'logstd')
                        if k in param_sh}
            place = lambda s, sh: jax.device_put(s, sh)
            place_repl = lambda s: jax.device_put(s, repl)
            self.agent.actor_opt_state = optax.tree_map_params(
                self.agent.actor_opt, place, self.agent.actor_opt_state,
                actor_sh, transform_non_params=place_repl)
            self.agent.critic_opt_state = optax.tree_map_params(
                self.agent.critic_opt, place, self.agent.critic_opt_state,
                param_sh['critic'], transform_non_params=place_repl)
        else:
            self.agent.params = jax.device_put(
                self.agent.params,
                jax.tree.map(lambda _: repl, self.agent.params))
            self.agent.actor_opt_state = jax.device_put(
                self.agent.actor_opt_state,
                jax.tree.map(lambda _: repl, self.agent.actor_opt_state))
            self.agent.critic_opt_state = jax.device_put(
                self.agent.critic_opt_state,
                jax.tree.map(lambda _: repl, self.agent.critic_opt_state))
        self._mesh = mesh

    def close(self):
        self.env.close()
        self.eval_env.close()
        self.logger.close()

    def setup_results_dict(self):
        self.results_dict = {'obs': [], 'reward': [], 'done': [], 'info': [],
                             'action': []}

    # ------------------------------------------------------------------
    def select_action(self, obs, info=None):
        """Deterministic (mode) action on (normalized) obs."""
        obs = jnp.asarray(obs, dtype=jnp.float32)
        if self.norm_obs and self.obs_norm_state is not None:
            obs = rms_normalize(self.obs_norm_state, obs, float(self.clip_obs))
        return self.agent.act(obs)

    def evaluate_fused(self, env=None, batch=1024, n_steps=4096, seed=0,
                       stochastic=False, **kwargs):
        """Closed-loop policy evaluation over a ``batch``-env fleet in one
        device program (policy-in-kernel on TPU, per-step scan elsewhere);
        returns fleet episode statistics. The fused analog of the
        reference's host eval loop (ppo.py:193-215 run / base_experiment
        evaluation). See ``experiments/fused_eval.py``."""
        from safe_control_gym_tpu.experiments.fused_eval import \
            evaluate_policy_fused
        return evaluate_policy_fused(self, env=env, batch=batch,
                                     n_steps=n_steps, seed=seed,
                                     stochastic=stochastic, **kwargs)

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Training loop (ppo.py:150-191)."""
        if self._env_states is None:
            self.reset()
        max_env_steps = int(self.max_env_steps)
        steps_per_iter = self.N * self.T
        best_eval_return = -np.inf
        ep_returns = deque(maxlen=int(self.deque_size))
        fused_k = max(1, int(getattr(self, 'fused_iterations', 1)))
        while self.total_steps < max_env_steps:
            start = time.time()
            obs_norm = self.obs_norm_state if self.norm_obs else rms_init(
                (self.env.observation_space.shape[0],))
            ret_state = self.ret_norm_state if self.norm_reward else ret_init(self.N)
            if fused_k > 1:
                ((params, a_state, c_state, self._env_states, self._obs,
                  obs_norm, ret_state), outs) = self._fused_jit(
                    self.agent.params, self.agent.actor_opt_state,
                    self.agent.critic_opt_state, self._env_states, self._obs,
                    obs_norm, ret_state, self._next_key())
                self.agent.params = params
                self.agent.actor_opt_state = a_state
                self.agent.critic_opt_state = c_state
                # ONE device_get for all logged scalars: per-scalar
                # float(v) paid a ~35 ms tunnel round trip EACH here.
                results = {k: float(v)
                           for k, v in jax.device_get(outs).items()}
                stats = {}
                self.total_steps += steps_per_iter * (fused_k - 1)
            else:
                (self._env_states, self._obs, obs_norm, ret_state, _, batch,
                 stats) = self._rollout_jit(self.agent.params,
                                            self._env_states,
                                            self._obs, obs_norm, ret_state,
                                            self._next_key())
                results = self.agent.update(batch, self._next_key())
            if self.norm_obs:
                self.obs_norm_state = obs_norm
            if self.norm_reward:
                self.ret_norm_state = ret_state
            self.total_steps += steps_per_iter
            results.update({k: float(v)
                            for k, v in jax.device_get(stats).items()})
            results['elapsed_time'] = time.time() - start
            results['step'] = self.total_steps
            # Interval bookkeeping (ppo.py:156-188).
            if self.log_interval and self.total_steps % self.log_interval < steps_per_iter:
                self.log_step(results)
            if self.save_interval and self.total_steps % self.save_interval < steps_per_iter:
                self.save(os.path.join(self.output_dir, 'checkpoints',
                                       f'model_{self.total_steps}.pt'))
            # num_checkpoints evenly spaced saves (ppo.py:156-160 parity).
            nckpt = int(getattr(self, 'num_checkpoints', 0) or 0)
            if nckpt > 0:
                interval = max(max_env_steps // nckpt, steps_per_iter)
                if self.total_steps % interval < steps_per_iter:
                    self.save(os.path.join(
                        self.output_dir, 'checkpoints',
                        f'model_{self.total_steps}.pt'))
            if self.eval_interval and self.total_steps % self.eval_interval < steps_per_iter:
                eval_results = self.run(env=self.eval_env,
                                        n_episodes=int(self.eval_batch_size))
                results['eval_return'] = eval_results['ep_returns'].mean()
                ep_returns.append(results['eval_return'])
                if self.eval_save_best and results['eval_return'] > best_eval_return:
                    best_eval_return = results['eval_return']
                    self.save(os.path.join(self.output_dir, 'model_best.pt'))
        self.save(self.checkpoint_path)
        return

    def _make_eval_rollout(self, env, n_episodes):
        """Build (and cache) the jitted batched deterministic eval."""
        cache_key = (id(env), n_episodes, bool(self.norm_obs))
        cached = getattr(self, '_eval_cache', None)
        if cached is not None and cached[0] == cache_key:
            return cached[1]
        func = env.func
        max_steps = func.max_steps + 1
        norm_obs = self.norm_obs
        clip_obs = float(self.clip_obs)
        activation = self.agent.activation
        step_v = jax.vmap(func.step)
        reset_v = jax.vmap(func.reset)

        @jax.jit
        def eval_rollout(params, obs_norm, keys):
            states, obs = reset_v(keys)
            alive0 = jnp.ones((n_episodes,), bool)

            def body(carry, _):
                states, obs, alive = carry
                obs_n = (rms_normalize(obs_norm, obs, clip_obs)
                         if norm_obs else obs)
                act = actor_dist(params, obs_n, activation).mode()
                states, out = step_v(states, act)
                rew = jnp.where(alive, out.reward, 0.0)
                length = alive.astype(jnp.float32)
                mse = jnp.where(alive, out.mse, 0.0)
                alive = jnp.logical_and(alive, jnp.logical_not(out.done))
                return (states, out.obs, alive), (rew, length, mse)

            (_, _, _), (rews, lengths, mses) = jax.lax.scan(
                body, (states, obs, alive0), None, length=max_steps)
            return rews.sum(0), lengths.sum(0), mses.sum(0) / jnp.maximum(
                lengths.sum(0), 1.0)

        self._eval_cache = (cache_key, eval_rollout)
        return eval_rollout

    def run(self, env=None, render=False, n_episodes=10, verbose=False,
            **kwargs):
        """Deterministic evaluation (ppo.py:193-257 analog): n_episodes
        batched functional envs scanned to completion on device."""
        if env is None:
            env = self.eval_env
        eval_rollout = self._make_eval_rollout(env, n_episodes)
        obs_norm = (self.obs_norm_state if self.obs_norm_state is not None
                    else rms_init((self.env.observation_space.shape[0],)))
        keys = jax.random.split(self._next_key(), n_episodes)
        ep_returns, ep_lengths, ep_mse = eval_rollout(self.agent.params,
                                                      obs_norm, keys)
        return {'ep_returns': np.asarray(ep_returns),
                'ep_lengths': np.asarray(ep_lengths),
                'ep_mse': np.asarray(ep_mse)}

    # ------------------------------------------------------------------
    def log_step(self, results):
        """Log training stats (ppo.py:305-359)."""
        step = results.get('step', self.total_steps)
        for k in ('policy_loss', 'value_loss', 'entropy_loss', 'approx_kl',
                  'mean_reward', 'eval_return', 'elapsed_time'):
            if k in results:
                self.logger.add_scalar(f'ppo/{k}', results[k], step)
        self.logger.dump_scalars()

    # ------------------------------------------------------------------
    def save(self, path):
        """Checkpoint params, optimizers, normalizers, counters, PRNG, and
        vec-env state for exact resume (ppo.py:112-131)."""
        if not path:
            return
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        state = {
            'agent': self.agent.state_dict(),
            'obs_norm_state': (jax.tree.map(np.asarray, self.obs_norm_state)
                               if self.obs_norm_state is not None else None),
            'ret_norm_state': (jax.tree.map(np.asarray, self.ret_norm_state)
                               if self.ret_norm_state is not None else None),
            'total_steps': self.total_steps,
            'key': np.asarray(self._key),
        }
        if self.training and self._env_states is not None:
            state['env_states'] = jax.tree.map(np.asarray, self._env_states)
            state['obs'] = np.asarray(self._obs)
        with open(path, 'wb') as f:
            pickle.dump(state, f)

    def load(self, path):
        """Restore from checkpoint (ppo.py:133-148)."""
        with open(path, 'rb') as f:
            state = pickle.load(f)
        self.agent.load_state_dict(state['agent'])
        if state.get('obs_norm_state') is not None:
            self.obs_norm_state = jax.tree.map(jnp.asarray,
                                               state['obs_norm_state'])
        if state.get('ret_norm_state') is not None:
            self.ret_norm_state = jax.tree.map(jnp.asarray,
                                               state['ret_norm_state'])
        self.total_steps = int(state.get('total_steps', 0))
        if 'key' in state:
            from safe_control_gym_tpu.utils.utils import restore_prng_key
            self._key = restore_prng_key(state['key'])
        if 'env_states' in state:
            self._env_states = jax.tree.map(jnp.asarray, state['env_states'])
            self._obs = jnp.asarray(state['obs'])
