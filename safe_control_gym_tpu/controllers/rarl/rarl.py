"""Robust Adversarial RL (RARL) — rebuild of controllers/rarl/rarl.py
(463 LoC reference).

Protagonist + adversary PPO agents (rarl.py:54-76); the adversary observes
the same state, acts on the env's ``adversary_action_space``, and receives
the NEGATED reward (rarl.py:436-441). Training alternates
``agent_iterations`` of protagonist updates with ``adversary_iterations``
of adversary updates (rarl.py:460-489).

TPU-native: where the reference calls
``env.env_method('set_adversary_control', ...)`` through subprocess pipes
each step (rarl.py:366-368), here the adversary action is written directly
into the functional EnvState (``adv_action``/``adv_valid`` fields) inside
the jitted rollout scan — both agents act, the env consumes the adversary
force, and both transition streams are collected in one fused scan.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base_controller import BaseController
from safe_control_gym_tpu.controllers.ppo.ppo_utils import (
    PPOAgent, actor_dist, compute_returns_and_advantages, critic_value)
from safe_control_gym_tpu.utils.logging import ExperimentLogger

__all__ = ['RARL']


class RARL(BaseController):
    """Robust adversarial reinforcement learning with PPO agents."""

    def __init__(self, env_func, training=True,
                 checkpoint_path='model_latest.pt', output_dir='temp',
                 use_gpu=False, seed: int = 0, **kwargs):
        super().__init__(env_func, training=training,
                         checkpoint_path=checkpoint_path,
                         output_dir=output_dir, use_gpu=use_gpu, seed=seed,
                         **kwargs)
        self.env = env_func(seed=seed)
        self.eval_env = env_func(seed=seed * 111 + 1)
        assert self.env.adversary_disturbance is not None, \
            '[ERROR] RARL requires an env with adversary_disturbance set.'
        self.func_env = self.env.func
        self.N = int(self.rollout_batch_size)
        self.T = int(self.rollout_steps)
        self.gamma = float(self.gamma)
        agent_kw = dict(hidden_dim=self.hidden_dim,
                        use_clipped_value=self.use_clipped_value,
                        clip_param=self.clip_param, target_kl=self.target_kl,
                        entropy_coef=self.entropy_coef,
                        actor_lr=self.actor_lr, critic_lr=self.critic_lr,
                        opt_epochs=self.opt_epochs,
                        mini_batch_size=self.mini_batch_size,
                        activation=getattr(self, 'activation', 'tanh'),
                        max_grad_norm=self.max_grad_norm)
        self.agent = PPOAgent(self.env.observation_space,
                              self.env.action_space, seed=seed, **agent_kw)
        self.adversary = PPOAgent(self.env.observation_space,
                                  self.env.adversary_action_space,
                                  seed=seed + 1, **agent_kw)
        self.adv_scale = float(self.env.adversary_disturbance_scale)
        self.adv_offset = float(self.env.adversary_disturbance_offset)
        self.total_steps = 0
        self._key = jax.random.PRNGKey(seed)
        self.logger = ExperimentLogger(output_dir,
                                       use_tensorboard=getattr(self, 'tensorboard', False))
        self._env_states = None
        self._obs = None
        self._build_rollout()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def _build_rollout(self):
        self._rollout_raw = self._make_rollout()
        self._rollout_jit = jax.jit(self._rollout_raw)
        # K whole (protagonist-phase + adversary-phase) cycles as ONE
        # device program; phase lengths and train flags are static so a
        # flag flip (e.g. freezing the adversary) retraces correctly.
        self._fused_jit = jax.jit(self._make_fused(),
                                  static_argnums=(9, 10, 11, 12, 13))

    def _make_rollout(self):
        step_autoreset = self.func_env.step_autoreset
        N, T = self.N, self.T
        activation = self.agent.activation
        gamma = self.gamma
        use_gae = bool(self.use_gae)
        gae_lambda = float(self.gae_lambda)
        adv_scale, adv_offset = self.adv_scale, self.adv_offset
        adv_dim = self.env.adv_action_dim

        def rollout(prot_params, adv_params, env_states, obs, key,
                    use_adversary):
            def body(carry, _):
                env_states, obs, key = carry
                key, k_p, k_a, k_reset = jax.random.split(key, 4)
                p_dist = actor_dist(prot_params, obs, activation)
                p_act = p_dist.sample(k_p)
                p_logp = p_dist.log_prob(p_act)
                p_v = critic_value(prot_params, obs, activation)
                a_dist = actor_dist(adv_params, obs, activation)
                a_act = a_dist.sample(k_a)
                a_logp = a_dist.log_prob(a_act)
                a_v = critic_value(adv_params, obs, activation)
                # Write the adversary action into the env state
                # (set_adversary_control semantics, benchmark_env.py:216-228).
                adv_force = (jnp.clip(a_act, -1.0, 1.0) * adv_scale
                             + adv_offset)
                padded = jnp.zeros((N, adv_dim)).at[:, :adv_force.shape[1]].set(adv_force)
                env_states = env_states.replace(
                    adv_action=padded,
                    adv_valid=jnp.full((N,), use_adversary))
                env_states, out, next_obs = step_autoreset(env_states,
                                                           p_act, k_reset)
                mask = 1.0 - out.done.astype(jnp.float32)
                term_pv = critic_value(prot_params, out.obs, activation)
                term_av = critic_value(adv_params, out.obs, activation)
                terminal_pv = jnp.where(out.truncated[:, None], term_pv, 0.0)
                terminal_av = jnp.where(out.truncated[:, None], term_av, 0.0)
                ys = (obs, p_act, a_act, out.reward[:, None], mask[:, None],
                      p_v, a_v, p_logp, a_logp, terminal_pv, terminal_av,
                      out.reward)
                return (env_states, next_obs, key), ys

            (env_states, obs, key), ys = jax.lax.scan(
                body, (env_states, obs, key), None, length=T)
            (obs_b, p_act_b, a_act_b, rew_b, mask_b, p_v_b, a_v_b, p_logp_b,
             a_logp_b, term_pv_b, term_av_b, raw_rew) = ys
            p_last = critic_value(prot_params, obs, activation)
            a_last = critic_value(adv_params, obs, activation)
            p_rets, p_advs = compute_returns_and_advantages(
                rew_b, p_v_b, mask_b, term_pv_b, p_last, gamma, use_gae,
                gae_lambda)
            # Adversary reward = -reward (rarl.py:436-441).
            a_rets, a_advs = compute_returns_and_advantages(
                -rew_b, a_v_b, mask_b, -term_av_b, a_last, gamma, use_gae,
                gae_lambda)
            p_advs = (p_advs - p_advs.mean()) / (p_advs.std() + 1e-6)
            a_advs = (a_advs - a_advs.mean()) / (a_advs.std() + 1e-6)
            M = T * N
            p_batch = {'obs': obs_b.reshape(M, -1),
                       'act': p_act_b.reshape(M, -1),
                       'logp': p_logp_b.reshape(M, -1),
                       'adv': p_advs.reshape(M, -1),
                       'ret': p_rets.reshape(M, -1),
                       'v': p_v_b.reshape(M, -1)}
            a_batch = {'obs': obs_b.reshape(M, -1),
                       'act': a_act_b.reshape(M, -1),
                       'logp': a_logp_b.reshape(M, -1),
                       'adv': a_advs.reshape(M, -1),
                       'ret': a_rets.reshape(M, -1),
                       'v': a_v_b.reshape(M, -1)}
            return env_states, obs, key, p_batch, a_batch, raw_rew.mean()

        return rollout

    def _make_fused(self):
        """K complete alternating (protagonist x n_p, adversary x n_a)
        RARL cycles (rarl.py:460-489 semantics) as ONE device program.

        Same rationale as PPO's ``fused_iterations``: each phase iteration
        is a fused rollout scan + a fully-jitted PPO update, so the only
        per-K-cycles host interaction is the single dispatch. Both agents'
        params and Adam states ride the scan carry."""
        rollout = self._make_rollout()
        p_update = self.agent._make_update()
        a_update = self.adversary._make_update()

        def fused(pp, pa, pc, ap, aa, ac, env_states, obs, key,
                  K, n_p, n_a, train_prot, train_adv):
            def p_iter(carry, k):
                pp, pa, pc, ap, aa, ac, env_states, obs = carry
                kr, ku = jax.random.split(k)
                env_states, obs, _, p_batch, _, mean_rew = rollout(
                    pp, ap, env_states, obs, kr, jnp.asarray(train_adv))
                if train_prot:
                    pp, pa, pc, _ = p_update(pp, pa, pc, p_batch, ku)
                return (pp, pa, pc, ap, aa, ac, env_states, obs), mean_rew

            def a_iter(carry, k):
                pp, pa, pc, ap, aa, ac, env_states, obs = carry
                kr, ku = jax.random.split(k)
                env_states, obs, _, _, a_batch, mean_rew = rollout(
                    pp, ap, env_states, obs, kr, jnp.asarray(True))
                if train_adv:
                    ap, aa, ac, _ = a_update(ap, aa, ac, a_batch, ku)
                return (pp, pa, pc, ap, aa, ac, env_states, obs), mean_rew

            def cycle(carry, k):
                kp, ka = jax.random.split(k)
                carry, p_rews = jax.lax.scan(
                    p_iter, carry, jax.random.split(kp, n_p))
                carry, a_rews = jax.lax.scan(
                    a_iter, carry, jax.random.split(ka, n_a))
                return carry, jnp.concatenate([p_rews, a_rews]).mean()

            carry, rews = jax.lax.scan(
                cycle, (pp, pa, pc, ap, aa, ac, env_states, obs),
                jax.random.split(key, K))
            return carry, rews.mean()

        return fused

    # ------------------------------------------------------------------
    def reset(self):
        keys = jax.random.split(self._next_key(), self.N)
        self._env_states, self._obs = jax.vmap(self.func_env.reset)(keys)
        self.setup_results_dict()

    def _all_agents(self):
        return [self.agent, self.adversary]

    def shard_over(self, mesh, axis_name: str = 'env'):
        """Distribute adversarial training over a ``jax.sharding.Mesh``:
        env states and both transition streams shard along ``axis_name``
        (data parallel); protagonist AND adversary params + Adam moments
        are replicated, so the minibatch-mean gradients in BOTH updates
        become cross-chip psum collectives inserted by XLA. Composes with
        ``fused_iterations`` (the whole multi-cycle scan runs SPMD).
        Same contract as PPO.shard_over."""
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
        for agent in self._all_agents():
            agent.params = jax.device_put(
                agent.params, jax.tree.map(lambda _: repl, agent.params))
            agent.actor_opt_state = jax.device_put(
                agent.actor_opt_state,
                jax.tree.map(lambda _: repl, agent.actor_opt_state))
            agent.critic_opt_state = jax.device_put(
                agent.critic_opt_state,
                jax.tree.map(lambda _: repl, agent.critic_opt_state))
        self._mesh = mesh

    def close(self):
        self.env.close()
        self.eval_env.close()
        self.logger.close()

    def setup_results_dict(self):
        self.results_dict = {'obs': [], 'reward': [], 'done': [], 'info': [],
                             'action': []}

    def select_action(self, obs, info=None):
        return self.agent.act(jnp.asarray(obs, jnp.float32))

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Alternating protagonist/adversary training (rarl.py:460-489)."""
        if self._env_states is None:
            self.reset()
        max_env_steps = int(self.max_env_steps)
        steps_per_iter = self.N * self.T
        train_prot = bool(getattr(self, 'train_protagonist', True))
        train_adv = bool(getattr(self, 'train_adversary', True))
        fused_k = max(1, int(getattr(self, 'fused_iterations', 1)))
        if fused_k > 1:
            n_p = int(self.agent_iterations)
            n_a = int(self.adversary_iterations)
            steps_per_cycle = (n_p + n_a) * steps_per_iter
            while self.total_steps < max_env_steps:
                # Tail handling: a smaller K is a different static shape
                # and recompiles (minutes through the remote-compile
                # tunnel), so only shrink the last dispatch when that
                # saves at least half a fused block of training;
                # otherwise accept an overshoot of < fused_k/2 cycles.
                # Residual: fused total_steps can exceed non-fused (which
                # stops at iteration granularity) by up to that overshoot,
                # so checkpoints across the two modes may disagree on
                # total_steps for the same max_env_steps.
                remaining = max_env_steps - self.total_steps
                k_needed = max(1, -(-remaining // steps_per_cycle))
                k_this = k_needed if k_needed <= fused_k // 2 else fused_k
                ((pp, pa, pc, ap, aa, ac, self._env_states, self._obs),
                 mean_rew) = self._fused_jit(
                    self.agent.params, self.agent.actor_opt_state,
                    self.agent.critic_opt_state, self.adversary.params,
                    self.adversary.actor_opt_state,
                    self.adversary.critic_opt_state, self._env_states,
                    self._obs, self._next_key(), k_this, n_p, n_a,
                    train_prot, train_adv)
                (self.agent.params, self.agent.actor_opt_state,
                 self.agent.critic_opt_state) = pp, pa, pc
                (self.adversary.params, self.adversary.actor_opt_state,
                 self.adversary.critic_opt_state) = ap, aa, ac
                self.total_steps += steps_per_cycle * k_this
                if self.log_interval:
                    self.logger.add_scalar('rarl/mean_reward',
                                           float(mean_rew), self.total_steps)
                    self.logger.dump_scalars()
            self.save(self.checkpoint_path)
            return
        while self.total_steps < max_env_steps:
            # Protagonist phase.
            for _ in range(int(self.agent_iterations)):
                if self.total_steps >= max_env_steps:
                    break
                (self._env_states, self._obs, _, p_batch, a_batch,
                 mean_rew) = self._rollout_jit(
                    self.agent.params, self.adversary.params,
                    self._env_states, self._obs, self._next_key(),
                    jnp.asarray(train_adv))
                if train_prot:
                    self.agent.update(p_batch, self._next_key())
                self.total_steps += steps_per_iter
            # Adversary phase.
            for _ in range(int(self.adversary_iterations)):
                if self.total_steps >= max_env_steps:
                    break
                (self._env_states, self._obs, _, p_batch, a_batch,
                 mean_rew) = self._rollout_jit(
                    self.agent.params, self.adversary.params,
                    self._env_states, self._obs, self._next_key(),
                    jnp.asarray(True))
                if train_adv:
                    self.adversary.update(a_batch, self._next_key())
                self.total_steps += steps_per_iter
            if self.log_interval:
                self.logger.add_scalar('rarl/mean_reward', float(mean_rew),
                                       self.total_steps)
                self.logger.dump_scalars()

        self.save(self.checkpoint_path)

    def run(self, env=None, n_episodes=10, **kwargs):
        if env is None:
            env = self.eval_env
        returns = []
        for _ in range(n_episodes):
            obs, info = env.reset()
            done, ep_ret = False, 0.0
            while not done:
                obs, rew, done, info = env.step(self.select_action(obs, info))
                ep_ret += rew
            returns.append(ep_ret)
        return {'ep_returns': np.asarray(returns)}

    # ------------------------------------------------------------------
    def _train_state_extras(self):
        """PRNG + env-state snapshot for exact training resume (reference
        rarl.py:122-141 saves random_state/env_random_state)."""
        state = {'total_steps': self.total_steps, 'key': np.asarray(self._key)}
        if self.training and self._env_states is not None:
            state['env_states'] = jax.tree.map(np.asarray, self._env_states)
            state['obs'] = np.asarray(self._obs)
        return state

    def _restore_extras(self, state):
        self.total_steps = int(state.get('total_steps', 0))
        if 'key' in state:
            from safe_control_gym_tpu.utils.utils import restore_prng_key
            self._key = restore_prng_key(state['key'])
        if 'env_states' in state:
            self._env_states = jax.tree.map(jnp.asarray,
                                            state['env_states'])
            self._obs = jnp.asarray(state['obs'])

    def save(self, path):
        if not path:
            return
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        with open(path, 'wb') as f:
            pickle.dump({'agent': self.agent.state_dict(),
                         'adversary': self.adversary.state_dict(),
                         **self._train_state_extras()}, f)

    def load(self, path):
        with open(path, 'rb') as f:
            state = pickle.load(f)
        self.agent.load_state_dict(state['agent'])
        if 'adversary' in state:
            self.adversary.load_state_dict(state['adversary'])
        self._restore_extras(state)
