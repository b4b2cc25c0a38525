"""Soft Actor-Critic — TPU-native rebuild of controllers/sac/sac.py (395 LoC).

Training structure parity (sac.py:269-335): warm-up with uniform random
actions, ``train_interval`` env steps per iteration followed by an equal
number of gradient steps (1:1 env:grad ratio), replay buffer with
true-next-obs correction for time truncation (terminal obs stored with
mask=1, sac.py:287-305).

TPU-native: the env-interaction chunk (vmapped envs under lax.scan with
on-device replay insertion) and the gradient chunk (train_interval updates
under lax.scan) are each ONE jitted call per iteration; the replay buffer
lives on device (controllers/off_policy_utils.py).
"""

from __future__ import annotations

import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base_controller import BaseController
from safe_control_gym_tpu.controllers.off_policy_utils import (
    ReplayState, replay_init, replay_push, replay_sample)
from safe_control_gym_tpu.controllers.sac.sac_utils import (SACAgent,
                                                            sac_actor_forward)
from safe_control_gym_tpu.utils.logging import ExperimentLogger

__all__ = ['SAC']


class SAC(BaseController):
    """Soft actor-critic."""

    def __init__(self, env_func, training=True,
                 checkpoint_path='model_latest.pt', output_dir='temp',
                 use_gpu=False, seed: int = 0, **kwargs):
        super().__init__(env_func, training=training,
                         checkpoint_path=checkpoint_path,
                         output_dir=output_dir, use_gpu=use_gpu, seed=seed,
                         **kwargs)
        self.env = env_func(seed=seed)
        self.eval_env = env_func(seed=seed * 111 + 1)
        self.func_env = self.env.func
        self.N = int(self.rollout_batch_size)
        self.agent = SACAgent(self.env.observation_space,
                              self.env.action_space,
                              hidden_dim=self.hidden_dim,
                              gamma=self.gamma, tau=self.tau,
                              init_temperature=self.init_temperature,
                              use_entropy_tuning=self.use_entropy_tuning,
                              target_entropy=self.target_entropy,
                              actor_lr=self.actor_lr,
                              critic_lr=self.critic_lr,
                              entropy_lr=self.entropy_lr,
                              activation=getattr(self, 'activation', 'relu'),
                              seed=seed)
        obs_dim = self.env.observation_space.shape[0]
        act_dim = self.env.action_space.shape[0]
        self.buffer = replay_init(
            {'obs': obs_dim, 'act': act_dim, 'rew': 1, 'next_obs': obs_dim,
             'mask': 1}, int(self.max_buffer_size))
        self.total_steps = 0
        self._key = jax.random.PRNGKey(seed)
        self.logger = ExperimentLogger(output_dir,
                                       use_tensorboard=getattr(self, 'tensorboard', False))
        self._env_states = None
        self._obs = None
        self._build_jits()

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _build_jits(self):
        step_autoreset = self.func_env.step_autoreset
        N = self.N
        act_dim = self.env.action_space.shape[0]
        act_low = jnp.asarray(self.env.action_space.low, jnp.float32)
        act_high = jnp.asarray(self.env.action_space.high, jnp.float32)
        activation = self.agent.activation
        steps_per_iter = max(1, int(self.train_interval) // N)
        self._steps_per_iter = steps_per_iter

        def collect(actor_params, env_states, obs, buffer, key, random_phase):
            """steps_per_iter environment steps + replay insertion."""
            def body(carry, _):
                env_states, obs, buffer, key = carry
                key, k_act, k_reset = jax.random.split(key, 3)
                rand_act = jax.random.uniform(
                    k_act, (N, act_dim), minval=act_low, maxval=act_high)
                pol_act, _ = sac_actor_forward(
                    actor_params, obs, k_act, act_low, act_high, activation,
                    with_logprob=False)
                act = jnp.where(random_phase, rand_act, pol_act)
                # Step + batched auto-reset in one fused path (FuncEnv).
                env_states, out, next_obs = step_autoreset(env_states, act,
                                                           k_reset)
                # True terminal next-obs with mask=1 on truncation
                # (sac.py:287-305): mask=0 only on true termination.
                true_done = jnp.logical_and(out.done,
                                            jnp.logical_not(out.truncated))
                mask = 1.0 - true_done.astype(jnp.float32)
                buffer = replay_push(buffer, {
                    'obs': obs, 'act': act, 'rew': out.reward[:, None],
                    'next_obs': out.obs, 'mask': mask[:, None]})
                obs = next_obs
                return (env_states, obs, buffer, key), out.reward

            (env_states, obs, buffer, key), rews = jax.lax.scan(
                body, (env_states, obs, buffer, key), None,
                length=steps_per_iter)
            return env_states, obs, buffer, rews.mean()

        self._collect_jit = jax.jit(collect)

        update_step = self.agent.make_update_step()
        n_updates = int(self.train_interval)
        batch_size = int(self.train_batch_size)

        def train_phase(train_state, buffer, key):
            def body(carry, k):
                ts = carry
                batch = replay_sample(buffer, k, batch_size)
                ts, losses = update_step(ts, batch, k)
                return ts, losses
            keys = jax.random.split(key, n_updates)
            train_state, losses = jax.lax.scan(body, train_state, keys)
            return train_state, losses.mean(axis=0)

        self._train_jit = jax.jit(train_phase)

        def fused_phase(train_state, env_states, obs, buffer, key):
            """K full (collect + train) iterations as ONE device program.

            The dev tunnel charges tens of ms per dispatch; per-iteration
            host round-trips dominated SAC wall-clock. Scanning the whole
            iteration keeps the training loop on device end-to-end —
            something the reference's torch loop cannot express at all.
            """
            def body(carry, k):
                ts, env_states, obs, buffer = carry
                kc, kt = jax.random.split(k)
                env_states, obs, buffer, mrew = collect(
                    ts[0]['actor'], env_states, obs, buffer, kc,
                    jnp.asarray(False))
                ts, losses = train_phase(ts, buffer, kt)
                return (ts, env_states, obs, buffer), jnp.concatenate(
                    [mrew[None], losses])
            K = int(getattr(self, 'fused_iterations', 1))
            keys = jax.random.split(key, K)
            (train_state, env_states, obs, buffer), outs = jax.lax.scan(
                body, (train_state, env_states, obs, buffer), keys)
            return train_state, env_states, obs, buffer, outs.mean(axis=0)

        self._fused_jit = jax.jit(fused_phase)

    # ------------------------------------------------------------------
    def reset(self):
        keys = jax.random.split(self._next_key(), self.N)
        self._env_states, self._obs = jax.vmap(self.func_env.reset)(keys)
        self.setup_results_dict()

    def shard_over(self, mesh, axis_name: str = 'env',
                   model_axis: str = None):
        """Distribute training over a ``jax.sharding.Mesh``: env states/obs
        sharded on the env axis, actor/critic/optimizer state replicated.
        The replay buffer keeps its (capacity, N, dim) layout with the env
        axis sharded, so pushes stay chip-local; batch sampling gathers
        across the mesh via XLA collectives. Composes with
        ``fused_iterations`` (the whole collect+train scan runs SPMD).

        With ``model_axis`` set (dp x tp mesh from ``make_dp_tp_mesh``),
        actor/twin-Q/target weights and their Adam moments are
        megatron-partitioned over the model axis, same scheme as PPO's
        (``parallel.sharding.mlp_tp_shardings``)."""
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
            import optax
            from safe_control_gym_tpu.parallel.sharding import (
                actor_critic_tp_shardings)
            ag = self.agent
            param_sh = actor_critic_tp_shardings(mesh, ag.params, model_axis)
            ag.params = jax.device_put(ag.params, param_sh)
            ag.target = jax.device_put(
                ag.target, {k: param_sh[k] for k in ag.target})
            ag.log_alpha = jax.device_put(ag.log_alpha, repl)
            place = lambda s, sh: jax.device_put(s, sh)
            place_repl = lambda s: jax.device_put(s, repl)
            ag.actor_opt_state = optax.tree_map_params(
                ag.actor_opt, place, ag.actor_opt_state, param_sh['actor'],
                transform_non_params=place_repl)
            ag.critic_opt_state = optax.tree_map_params(
                ag.critic_opt, place, ag.critic_opt_state,
                {'q1': param_sh['q1'], 'q2': param_sh['q2']},
                transform_non_params=place_repl)
            ag.alpha_opt_state = jax.device_put(
                ag.alpha_opt_state,
                jax.tree.map(lambda _: repl, ag.alpha_opt_state))
        else:
            ts = self.agent.train_state()
            ts = jax.device_put(ts, jax.tree.map(lambda _: repl, ts))
            self.agent.set_train_state(ts)
        self._mesh = mesh

    def close(self):
        self.env.close()
        self.eval_env.close()
        self.logger.close()

    def setup_results_dict(self):
        self.results_dict = {'obs': [], 'reward': [], 'done': [], 'info': [],
                             'action': []}

    def select_action(self, obs, info=None):
        return self.agent.act(jnp.asarray(obs, jnp.float32),
                              deterministic=True)

    def evaluate_fused(self, env=None, batch=1024, n_steps=4096, seed=0,
                       **kwargs):
        """Deterministic closed-loop evaluation over a ``batch``-env fleet
        in one device program (policy-in-kernel on TPU, per-step scan
        elsewhere); the fused analog of the reference's eval episodes
        (sac.py:337-370). See ``experiments/fused_eval.py``."""
        from safe_control_gym_tpu.experiments.fused_eval import \
            evaluate_policy_fused
        return evaluate_policy_fused(self, env=env, batch=batch,
                                     n_steps=n_steps, seed=seed, **kwargs)

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Training loop (sac.py:252-335)."""
        if self._env_states is None:
            self.reset()
        max_env_steps = int(self.max_env_steps)
        warm_up = int(self.warm_up_steps)
        steps_per_iter = self._steps_per_iter * self.N
        fused_k = max(1, int(getattr(self, 'fused_iterations', 1)))
        best_eval = -np.inf
        while self.total_steps < max_env_steps:
            start = time.time()
            if self.total_steps >= warm_up and fused_k > 1:
                # K iterations per dispatch (see fused_phase).
                (ts, self._env_states, self._obs, self.buffer,
                 outs) = self._fused_jit(self.agent.train_state(),
                                         self._env_states, self._obs,
                                         self.buffer, self._next_key())
                self.agent.set_train_state(ts)
                o = jax.device_get(outs)  # one transfer, not three
                results = {'mean_reward': float(o[0]),
                           'policy_loss': float(o[1]),
                           'critic_loss': float(o[2])}
                self.total_steps += steps_per_iter * (fused_k - 1)
            else:
                random_phase = jnp.asarray(self.total_steps < warm_up)
                (self._env_states, self._obs, self.buffer,
                 mean_rew) = self._collect_jit(self.agent.params['actor'],
                                               self._env_states, self._obs,
                                               self.buffer, self._next_key(),
                                               random_phase)
                results = {'mean_reward': float(mean_rew)}
                if self.total_steps >= warm_up:
                    ts, losses = self._train_jit(self.agent.train_state(),
                                                 self.buffer,
                                                 self._next_key())
                    self.agent.set_train_state(ts)
                    results['policy_loss'] = float(losses[0])
                    results['critic_loss'] = float(losses[1])
            self.total_steps += steps_per_iter
            results['elapsed_time'] = time.time() - start
            if self.log_interval and self.total_steps % self.log_interval < steps_per_iter:
                for k, v in results.items():
                    self.logger.add_scalar(f'sac/{k}', v, self.total_steps)
                self.logger.dump_scalars()
            if self.save_interval and self.total_steps % self.save_interval < steps_per_iter:
                self.save(os.path.join(self.output_dir, 'checkpoints',
                                       f'model_{self.total_steps}.pt'))
            if self.eval_interval and self.total_steps % self.eval_interval < steps_per_iter:
                eval_res = self.run(n_episodes=int(self.eval_batch_size))
                er = float(eval_res['ep_returns'].mean())
                if self.eval_save_best and er > best_eval:
                    best_eval = er
                    self.save(os.path.join(self.output_dir, 'model_best.pt'))
        # The final checkpoint carries the replay ring (reference sac.py:
        # 'latest checkpoint should enable save_buffer').
        self.save(self.checkpoint_path, save_buffer=True)

    def _make_eval_rollout(self, env, n_episodes):
        """Build (and cache) the jitted batched deterministic eval."""
        cache_key = (id(env), n_episodes)
        cached = getattr(self, '_eval_cache', None)
        if cached is not None and cached[0] == cache_key:
            return cached[1]
        func = env.func
        max_steps = func.max_steps + 1
        act_low, act_high = self.agent.act_low, self.agent.act_high
        activation = self.agent.activation
        step_v = jax.vmap(func.step)
        reset_v = jax.vmap(func.reset)

        @jax.jit
        def eval_rollout(actor_params, keys):
            states, obs = reset_v(keys)
            alive0 = jnp.ones((n_episodes,), bool)

            def body(carry, _):
                states, obs, alive = carry
                act, _ = sac_actor_forward(actor_params, obs,
                                           jax.random.PRNGKey(0), act_low,
                                           act_high, activation,
                                           deterministic=True,
                                           with_logprob=False)
                states, out = step_v(states, act)
                rew = jnp.where(alive, out.reward, 0.0)
                length = alive.astype(jnp.float32)
                alive = jnp.logical_and(alive, jnp.logical_not(out.done))
                return (states, out.obs, alive), (rew, length)

            _, (rews, lengths) = jax.lax.scan(body, (states, obs, alive0),
                                              None, length=max_steps)
            return rews.sum(0), lengths.sum(0)

        self._eval_cache = (cache_key, eval_rollout)
        return eval_rollout


    def run(self, env=None, n_episodes=10, **kwargs):
        """Deterministic batched eval."""
        if env is None:
            env = self.eval_env
        eval_rollout = self._make_eval_rollout(env, n_episodes)
        keys = jax.random.split(self._next_key(), n_episodes)
        ep_returns, ep_lengths = eval_rollout(self.agent.params['actor'],
                                              keys)
        return {'ep_returns': np.asarray(ep_returns),
                'ep_lengths': np.asarray(ep_lengths)}

    # ------------------------------------------------------------------
    def save(self, path, save_buffer=False):
        """Checkpoint; ``save_buffer=True`` (the final checkpoint) also
        snapshots the replay ring + env states for exact off-policy resume
        (reference sac.py save_buffer semantics — intermediate checkpoints
        skip the buffer to save storage)."""
        if not path:
            return
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        state = {
            'agent': self.agent.state_dict(),
            'total_steps': self.total_steps,
            'key': np.asarray(self._key),
        }
        if self.training and self._env_states is not None:
            state['env_states'] = jax.tree.map(np.asarray, self._env_states)
            state['obs'] = np.asarray(self._obs)
            if save_buffer:
                state['buffer'] = jax.tree.map(np.asarray, self.buffer)
        with open(path, 'wb') as f:
            pickle.dump(state, f)

    def load(self, path):
        with open(path, 'rb') as f:
            state = pickle.load(f)
        self.agent.load_state_dict(state['agent'])
        self.total_steps = int(state.get('total_steps', 0))
        if 'env_states' in state:
            self._env_states = jax.tree.map(jnp.asarray, state['env_states'])
            self._obs = jnp.asarray(state['obs'])
        if 'buffer' in state:
            self.buffer = jax.tree.map(jnp.asarray, state['buffer'])
        if 'key' in state:
            from safe_control_gym_tpu.utils.utils import restore_prng_key
            self._key = restore_prng_key(state['key'])
