"""Deep Deterministic Policy Gradient — rebuild of
controllers/ddpg/ddpg.py (401 LoC reference).

Same scaffolding as SAC (shared on-device replay + fused collect/train
phases) with a deterministic actor + OU/Gaussian action-noise exploration
(ddpg.py:87-341). The noise process runs inside the jitted collect scan as a
functional OU state; the std schedule advances host-side per iteration
(schedules are scalar host values, matching the reference's per-sample
LinearSchedule semantics at iteration granularity).
"""

from __future__ import annotations

import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base_controller import BaseController
from safe_control_gym_tpu.controllers.ddpg.ddpg_utils import (
    DDPGAgent, ddpg_actor_forward, make_action_noise_process)
from safe_control_gym_tpu.controllers.off_policy_utils import (
    replay_init, replay_push, replay_sample)
from safe_control_gym_tpu.math.schedules import ConstantSchedule, LinearSchedule
from safe_control_gym_tpu.utils.logging import ExperimentLogger

__all__ = ['DDPG']


class DDPG(BaseController):
    """Deep deterministic policy gradient."""

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
        self.agent = DDPGAgent(self.env.observation_space,
                               self.env.action_space,
                               hidden_dim=self.hidden_dim, gamma=self.gamma,
                               tau=self.tau, actor_lr=self.actor_lr,
                               critic_lr=self.critic_lr,
                               activation=getattr(self, 'activation', 'relu'),
                               seed=seed)
        # Noise schedule from the YAML random_process spec (ddpg.yaml).
        rp_cfg = dict(getattr(self, 'random_process', {}) or {})
        std_cfg = dict(rp_cfg.get('std', {'func': 'LinearSchedule',
                                          'args': 0.2}))
        std_name = std_cfg.pop('func', 'LinearSchedule')
        std_args = std_cfg.pop('args', 0.2)
        if not isinstance(std_args, (list, tuple)):
            std_args = [std_args]
        self._std_schedule = {'LinearSchedule': LinearSchedule,
                              'ConstantSchedule': ConstantSchedule}[
            std_name](*std_args)
        self._ou_theta = float(rp_cfg.get('theta', 0.15))
        self._ou_dt = float(rp_cfg.get('dt', 1e-2))
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
        self._ou_state = jnp.zeros((self.N, act_dim))
        self._build_jits()

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
        theta, ou_dt = self._ou_theta, self._ou_dt
        steps_per_iter = max(1, int(self.train_interval) // N)
        self._steps_per_iter = steps_per_iter

        def collect(actor_params, env_states, obs, buffer, ou_state, key,
                    random_phase, noise_std):
            def body(carry, _):
                env_states, obs, buffer, ou_state, key = carry
                key, k_act, k_ou, k_reset = jax.random.split(key, 4)
                rand_act = jax.random.uniform(
                    k_act, (N, act_dim), minval=act_low, maxval=act_high)
                pol_act = ddpg_actor_forward(actor_params, obs, act_low,
                                             act_high, activation)
                # OU noise step (random_processes.py:37-54), scaled to the
                # action range.
                ou_state_new = (ou_state + theta * (-ou_state) * ou_dt
                                + noise_std * jnp.sqrt(ou_dt)
                                * jax.random.normal(k_ou, ou_state.shape))
                noisy_act = jnp.clip(
                    pol_act + ou_state_new * 0.5 * (act_high - act_low),
                    act_low, act_high)
                act = jnp.where(random_phase, rand_act, noisy_act)
                # Step + batched auto-reset in one fused path (FuncEnv).
                env_states, out, next_obs = step_autoreset(env_states, act,
                                                           k_reset)
                true_done = jnp.logical_and(out.done,
                                            jnp.logical_not(out.truncated))
                mask = 1.0 - true_done.astype(jnp.float32)
                buffer = replay_push(buffer, {
                    'obs': obs, 'act': act, 'rew': out.reward[:, None],
                    'next_obs': out.obs, 'mask': mask[:, None]})
                obs = next_obs
                # Reset OU state for finished envs.
                ou_reset = jnp.where(out.done[:, None], 0.0, ou_state_new)
                return (env_states, obs, buffer, ou_reset, key), out.reward

            (env_states, obs, buffer, ou_state, key), rews = jax.lax.scan(
                body, (env_states, obs, buffer, ou_state, key), None,
                length=steps_per_iter)
            return env_states, obs, buffer, ou_state, rews.mean()

        self._collect_jit = jax.jit(collect)

        update_step = self.agent.make_update_step()
        n_updates = int(self.train_interval)
        batch_size = int(self.train_batch_size)

        def train_phase(train_state, buffer, key):
            def body(ts, k):
                batch = replay_sample(buffer, k, batch_size)
                ts, losses = update_step(ts, batch, k)
                return ts, losses
            keys = jax.random.split(key, n_updates)
            train_state, losses = jax.lax.scan(body, train_state, keys)
            return train_state, losses.mean(axis=0)

        self._train_jit = jax.jit(train_phase)

        def fused_phase(train_state, env_states, obs, buffer, ou_state, key,
                        noise_std):
            """K full (collect + train) iterations as ONE device program
            (same rationale as SAC.fused_phase: per-iteration dispatch
            round-trips dominate wall-clock through the remote tunnel)."""
            def body(carry, k):
                ts, env_states, obs, buffer, ou_state = carry
                kc, kt = jax.random.split(k)
                env_states, obs, buffer, ou_state, mrew = collect(
                    ts[0]['actor'], env_states, obs, buffer, ou_state, kc,
                    jnp.asarray(False), noise_std)
                ts, losses = train_phase(ts, buffer, kt)
                return (ts, env_states, obs, buffer, ou_state), \
                    jnp.concatenate([mrew[None], losses])
            K = int(getattr(self, 'fused_iterations', 1))
            keys = jax.random.split(key, K)
            (train_state, env_states, obs, buffer, ou_state), outs = \
                jax.lax.scan(body,
                             (train_state, env_states, obs, buffer, ou_state),
                             keys)
            return (train_state, env_states, obs, buffer, ou_state,
                    outs.mean(axis=0))

        self._fused_jit = jax.jit(fused_phase)

    # ------------------------------------------------------------------
    def reset(self):
        keys = jax.random.split(self._next_key(), self.N)
        self._env_states, self._obs = jax.vmap(self.func_env.reset)(keys)
        self._ou_state = jnp.zeros_like(self._ou_state)
        self.setup_results_dict()

    def close(self):
        self.env.close()
        self.eval_env.close()
        self.logger.close()

    def setup_results_dict(self):
        self.results_dict = {'obs': [], 'reward': [], 'done': [], 'info': [],
                             'action': []}

    def select_action(self, obs, info=None):
        return self.agent.act(jnp.asarray(obs, jnp.float32))

    def evaluate_fused(self, env=None, batch=1024, n_steps=4096, seed=0,
                       **kwargs):
        """Deterministic closed-loop evaluation over a ``batch``-env fleet
        in one device program (policy-in-kernel on TPU, per-step scan
        elsewhere); the fused analog of the reference's eval episodes
        (ddpg.py:262-300). See ``experiments/fused_eval.py``."""
        from safe_control_gym_tpu.experiments.fused_eval import \
            evaluate_policy_fused
        return evaluate_policy_fused(self, env=env, batch=batch,
                                     n_steps=n_steps, seed=seed, **kwargs)

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Training loop (ddpg.py:230-341)."""
        if self._env_states is None:
            self.reset()
        max_env_steps = int(self.max_env_steps)
        warm_up = int(self.warm_up_steps)
        steps_per_iter = self._steps_per_iter * self.N
        fused_k = max(1, int(getattr(self, 'fused_iterations', 1)))
        while self.total_steps < max_env_steps:
            start = time.time()
            noise_std = float(self._std_schedule(steps_per_iter))
            if self.total_steps >= warm_up and fused_k > 1:
                (ts, self._env_states, self._obs, self.buffer,
                 self._ou_state, outs) = self._fused_jit(
                    self.agent.train_state(), self._env_states, self._obs,
                    self.buffer, self._ou_state, self._next_key(),
                    jnp.float32(noise_std))
                self.agent.set_train_state(ts)
                o = jax.device_get(outs)  # one transfer, not three
                results = {'mean_reward': float(o[0]),
                           'policy_loss': float(o[1]),
                           'critic_loss': float(o[2])}
                self.total_steps += steps_per_iter * (fused_k - 1)
            else:
                (self._env_states, self._obs, self.buffer, self._ou_state,
                 mean_rew) = self._collect_jit(
                    self.agent.params['actor'], self._env_states, self._obs,
                    self.buffer, self._ou_state, self._next_key(),
                    jnp.asarray(self.total_steps < warm_up),
                    jnp.float32(noise_std))
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
                    self.logger.add_scalar(f'ddpg/{k}', v, self.total_steps)
                self.logger.dump_scalars()
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
                act = ddpg_actor_forward(actor_params, obs, act_low,
                                         act_high, activation)
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
        if env is None:
            env = self.eval_env
        eval_rollout = self._make_eval_rollout(env, n_episodes)
        keys = jax.random.split(self._next_key(), n_episodes)
        ep_returns, ep_lengths = eval_rollout(self.agent.params['actor'],
                                              keys)
        return {'ep_returns': np.asarray(ep_returns),
                'ep_lengths': np.asarray(ep_lengths)}

    def save(self, path, save_buffer=False):
        """Checkpoint; ``save_buffer=True`` also snapshots the replay ring,
        env states, and OU-noise state for exact off-policy resume
        (reference ddpg.py save_buffer semantics)."""
        if not path:
            return
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        state = {'agent': self.agent.state_dict(),
                 'total_steps': self.total_steps,
                 'key': np.asarray(self._key)}
        if self.training and self._env_states is not None:
            state['env_states'] = jax.tree.map(np.asarray, self._env_states)
            state['obs'] = np.asarray(self._obs)
            state['ou_state'] = np.asarray(self._ou_state)
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
            self._ou_state = jnp.asarray(state['ou_state'])
        if 'buffer' in state:
            self.buffer = jax.tree.map(jnp.asarray, state['buffer'])
        if 'key' in state:
            from safe_control_gym_tpu.utils.utils import restore_prng_key
            self._key = restore_prng_key(state['key'])
