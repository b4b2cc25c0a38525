"""RARL with Adversarial Populations (RAP) — rebuild of
controllers/rarl/rap.py (470 LoC reference).

A population of ``num_adversaries`` adversary PPO agents; each env instance
in the batch is assigned one adversary per iteration
(rarl_utils.split_obs_by_adversary semantics). The assignment is a balanced
random permutation of a round-robin pattern so every adversary trains on an
equal, statically-shaped slice of the env batch — keeping the whole
multi-adversary rollout inside one jitted scan (per-env adversary parameters
are gathered from the stacked population pytree with a vmapped tree-index).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.ppo.ppo_utils import (
    PPOAgent, actor_dist, compute_returns_and_advantages, critic_value)
from safe_control_gym_tpu.controllers.rarl.rarl import RARL

__all__ = ['RAP']


class RAP(RARL):
    """RARL with a population of adversaries."""

    def __init__(self, env_func, num_adversaries: int = 2, **kwargs):
        self.num_adversaries = int(num_adversaries)
        super().__init__(env_func, **kwargs)
        # Replace the single adversary with a population.
        agent_kw = dict(hidden_dim=self.hidden_dim,
                        use_clipped_value=self.use_clipped_value,
                        clip_param=self.clip_param, target_kl=self.target_kl,
                        entropy_coef=self.entropy_coef,
                        actor_lr=self.actor_lr, critic_lr=self.critic_lr,
                        opt_epochs=self.opt_epochs,
                        mini_batch_size=self.mini_batch_size,
                        activation=getattr(self, 'activation', 'tanh'),
                        max_grad_norm=self.max_grad_norm)
        self.adversaries = [
            PPOAgent(self.env.observation_space,
                     self.env.adversary_action_space, seed=self.seed + 1 + i,
                     **agent_kw)
            for i in range(self.num_adversaries)]
        assert self.N % self.num_adversaries == 0, \
            'rollout_batch_size must be divisible by num_adversaries'
        self._build_pop_rollout()

    def _stacked_adv_params(self):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[a.params for a in self.adversaries])

    def _build_pop_rollout(self):
        self._pop_rollout_raw = self._make_pop_rollout()
        self._pop_rollout_jit = jax.jit(self._pop_rollout_raw)
        self._pop_fused_jit = jax.jit(self._make_pop_fused(),
                                      static_argnums=(9, 10, 11, 12, 13))

    def _make_pop_rollout(self):
        step_autoreset = self.func_env.step_autoreset
        N, T = self.N, self.T
        activation = self.agent.activation
        gamma = self.gamma
        use_gae = bool(self.use_gae)
        gae_lambda = float(self.gae_lambda)
        adv_scale, adv_offset = self.adv_scale, self.adv_offset
        adv_dim = self.env.adv_action_dim

        def per_env_adv(adv_stack, assign, obs, keys):
            """Sample each env's adversary action from its assigned member."""
            def one(idx, o, k):
                p = jax.tree.map(lambda x: x[idx], adv_stack)
                dist = actor_dist(p, o, activation)
                a = dist.sample(k)
                return a, dist.log_prob(a), critic_value(p, o, activation)
            return jax.vmap(one)(assign, obs, keys)

        def rollout(prot_params, adv_stack, assign, env_states, obs, key):
            def body(carry, _):
                env_states, obs, key = carry
                key, k_p, k_a, k_reset = jax.random.split(key, 4)
                p_dist = actor_dist(prot_params, obs, activation)
                p_act = p_dist.sample(k_p)
                p_logp = p_dist.log_prob(p_act)
                p_v = critic_value(prot_params, obs, activation)
                a_keys = jax.random.split(k_a, N)
                a_act, a_logp, a_v = per_env_adv(adv_stack, assign, obs,
                                                 a_keys)
                adv_force = (jnp.clip(a_act, -1.0, 1.0) * adv_scale
                             + adv_offset)
                padded = jnp.zeros((N, adv_dim)).at[:, :adv_force.shape[1]].set(adv_force)
                env_states = env_states.replace(
                    adv_action=padded, adv_valid=jnp.ones((N,), bool))
                env_states, out, next_obs = step_autoreset(env_states,
                                                           p_act, k_reset)
                mask = 1.0 - out.done.astype(jnp.float32)
                term_pv = critic_value(prot_params, out.obs, activation)
                terminal_pv = jnp.where(out.truncated[:, None], term_pv, 0.0)
                ys = (obs, p_act, a_act, out.reward[:, None], mask[:, None],
                      p_v, a_v, p_logp, a_logp, terminal_pv, out.reward)
                return (env_states, next_obs, key), ys

            (env_states, obs, key), ys = jax.lax.scan(
                body, (env_states, obs, key), None, length=T)
            (obs_b, p_act_b, a_act_b, rew_b, mask_b, p_v_b, a_v_b, p_logp_b,
             a_logp_b, term_pv_b, raw_rew) = ys
            p_last = critic_value(prot_params, obs, activation)
            p_rets, p_advs = compute_returns_and_advantages(
                rew_b, p_v_b, mask_b, term_pv_b, p_last, gamma, use_gae,
                gae_lambda)
            a_rets, a_advs = compute_returns_and_advantages(
                -rew_b, a_v_b, mask_b, jnp.zeros_like(rew_b),
                jnp.zeros_like(p_last), gamma, use_gae, gae_lambda)
            p_advs = (p_advs - p_advs.mean()) / (p_advs.std() + 1e-6)
            a_advs = (a_advs - a_advs.mean()) / (a_advs.std() + 1e-6)
            M = T * N
            p_batch = {'obs': obs_b.reshape(M, -1),
                       'act': p_act_b.reshape(M, -1),
                       'logp': p_logp_b.reshape(M, -1),
                       'adv': p_advs.reshape(M, -1),
                       'ret': p_rets.reshape(M, -1),
                       'v': p_v_b.reshape(M, -1)}
            # Keep the (T, N) layout for per-adversary slicing.
            a_data = {'obs': obs_b, 'act': a_act_b, 'logp': a_logp_b,
                      'adv': a_advs, 'ret': a_rets, 'v': a_v_b}
            return env_states, obs, key, p_batch, a_data, raw_rew.mean()

        return rollout

    def _make_pop_fused(self):
        """K alternating (protagonist x n_p, population x n_a) RAP cycles
        as ONE device program (rap.py:30-470 semantics, fused).

        The per-iteration adversary assignment is sampled INSIDE the scan
        (balanced permutation of the round-robin base); per-member update
        batches come from a sort-by-assignment gather into statically
        shaped (A, T*N/A, ...) blocks, and the whole population updates in
        one ``vmap`` of the PPO update over the stacked member pytrees."""
        rollout = self._make_pop_rollout()
        p_update = self.agent._make_update()
        a_update = self.adversaries[0]._make_update()
        vm_update = jax.vmap(a_update)
        N, T, A = self.N, self.T, self.num_adversaries
        base = jnp.arange(N, dtype=jnp.int32) % A

        def member_batches(a_data, order):
            def g(x):
                x = x.reshape(T, N, -1)[:, order]
                return (x.reshape(T, A, N // A, -1)
                        .transpose(1, 0, 2, 3)
                        .reshape(A, T * (N // A), -1))
            return {k: g(v) for k, v in a_data.items()}

        def fused(pp, pa, pc, apS, aaS, acS, env_states, obs, key,
                  K, n_p, n_a, train_prot, train_adv):
            def p_iter(carry, k):
                pp, pa, pc, apS, aaS, acS, env_states, obs = carry
                ks, kr, ku = jax.random.split(k, 3)
                assign = base[jax.random.permutation(ks, N)]
                env_states, obs, _, p_batch, _, mean_rew = rollout(
                    pp, apS, assign, env_states, obs, kr)
                if train_prot:
                    pp, pa, pc, _ = p_update(pp, pa, pc, p_batch, ku)
                return (pp, pa, pc, apS, aaS, acS, env_states, obs), mean_rew

            def a_iter(carry, k):
                pp, pa, pc, apS, aaS, acS, env_states, obs = carry
                ks, kr, ku = jax.random.split(k, 3)
                assign = base[jax.random.permutation(ks, N)]
                env_states, obs, _, _, a_data, mean_rew = rollout(
                    pp, apS, assign, env_states, obs, kr)
                if train_adv:
                    order = jnp.argsort(assign)
                    batches = member_batches(a_data, order)
                    apS, aaS, acS, _ = vm_update(
                        apS, aaS, acS, batches, jax.random.split(ku, A))
                return (pp, pa, pc, apS, aaS, acS, env_states, obs), mean_rew

            def cycle(carry, k):
                kp, ka = jax.random.split(k)
                carry, p_rews = jax.lax.scan(
                    p_iter, carry, jax.random.split(kp, n_p))
                carry, a_rews = jax.lax.scan(
                    a_iter, carry, jax.random.split(ka, n_a))
                return carry, jnp.concatenate([p_rews, a_rews]).mean()

            carry, rews = jax.lax.scan(
                cycle, (pp, pa, pc, apS, aaS, acS, env_states, obs),
                jax.random.split(key, K))
            return carry, rews.mean()

        return fused

    def _all_agents(self):
        # shard_over replicates the whole population (RARL.shard_over).
        return [self.agent] + list(self.adversaries)

    # ------------------------------------------------------------------
    def _sample_assignment(self):
        """Balanced random adversary assignment over the env batch."""
        base = np.arange(self.N) % self.num_adversaries
        perm = np.asarray(jax.random.permutation(self._next_key(), self.N))
        return jnp.asarray(base[perm], jnp.int32)

    def learn(self, env=None, **kwargs):
        """Alternating protagonist/population training (rap.py:30-470)."""
        if self._env_states is None:
            self.reset()
        max_env_steps = int(self.max_env_steps)
        steps_per_iter = self.N * self.T
        fused_k = max(1, int(getattr(self, 'fused_iterations', 1)))
        if fused_k > 1:
            self._learn_fused(max_env_steps, steps_per_iter, fused_k)
            return
        mean_rew = 0.0
        # Same freeze semantics as the fused path, so a config trains
        # identically regardless of fused_iterations.
        train_prot = bool(getattr(self, 'train_protagonist', True))
        train_adv = bool(getattr(self, 'train_adversary', True))
        while self.total_steps < max_env_steps:
            for _ in range(int(self.agent_iterations)):
                if self.total_steps >= max_env_steps:
                    break
                assign = self._sample_assignment()
                (self._env_states, self._obs, _, p_batch, a_data,
                 mean_rew) = self._pop_rollout_jit(
                    self.agent.params, self._stacked_adv_params(), assign,
                    self._env_states, self._obs, self._next_key())
                if train_prot:
                    self.agent.update(p_batch, self._next_key())
                self.total_steps += steps_per_iter
            for _ in range(int(self.adversary_iterations)):
                if self.total_steps >= max_env_steps:
                    break
                assign = self._sample_assignment()
                (self._env_states, self._obs, _, p_batch, a_data,
                 mean_rew) = self._pop_rollout_jit(
                    self.agent.params, self._stacked_adv_params(), assign,
                    self._env_states, self._obs, self._next_key())
                if train_adv:
                    assign_np = np.asarray(assign)
                    for k, adversary in enumerate(self.adversaries):
                        idx = np.where(assign_np == k)[0]
                        batch_k = {name: np.asarray(v[:, idx]).reshape(
                            self.T * len(idx), -1)
                            for name, v in a_data.items()}
                        batch_k = {name: jnp.asarray(v)
                                   for name, v in batch_k.items()}
                        adversary.update(batch_k, self._next_key())
                self.total_steps += steps_per_iter
            if self.log_interval:
                self.logger.add_scalar('rap/mean_reward', float(mean_rew),
                                       self.total_steps)
                self.logger.dump_scalars()
        self.save(self.checkpoint_path)

    def _learn_fused(self, max_env_steps, steps_per_iter, fused_k):
        """Dispatch K whole RAP cycles per host round-trip."""
        stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        n_p = int(self.agent_iterations)
        n_a = int(self.adversary_iterations)
        train_prot = bool(getattr(self, 'train_protagonist', True))
        train_adv = bool(getattr(self, 'train_adversary', True))
        steps_per_cycle = (n_p + n_a) * steps_per_iter
        # Stack the population ONCE and keep the stacked pytrees as the
        # loop carry — restacking params + both Adam moments per dispatch
        # paid A x per-leaf stack/slice on the single-core host.
        apS = stack([a.params for a in self.adversaries])
        aaS = stack([a.actor_opt_state for a in self.adversaries])
        acS = stack([a.critic_opt_state for a in self.adversaries])
        pp = self.agent.params
        pa = self.agent.actor_opt_state
        pc = self.agent.critic_opt_state
        try:
            while self.total_steps < max_env_steps:
                # Tail handling: a smaller K is a different static shape and
                # recompiles (minutes through the remote-compile tunnel), so
                # only shrink the last dispatch when that saves at least half
                # a fused block of training; otherwise accept an overshoot of
                # < fused_k/2 cycles. Residual: fused total_steps can exceed
                # non-fused (which stops at iteration granularity) by up to
                # that overshoot.
                remaining = max_env_steps - self.total_steps
                k_needed = max(1, -(-remaining // steps_per_cycle))
                k_this = k_needed if k_needed <= fused_k // 2 else fused_k
                ((pp, pa, pc, apS, aaS, acS, self._env_states, self._obs),
                 mean_rew) = self._pop_fused_jit(
                    pp, pa, pc, apS, aaS, acS,
                    self._env_states, self._obs, self._next_key(),
                    k_this, n_p, n_a, train_prot, train_adv)
                self.total_steps += steps_per_cycle * k_this
                if self.log_interval:
                    self.logger.add_scalar('rap/mean_reward', float(mean_rew),
                                           self.total_steps)
                    self.logger.dump_scalars()
        finally:
            # Sync device-side carries back onto the agent/adversaries even
            # when the loop is interrupted (KeyboardInterrupt, device error):
            # total_steps/_env_states have already advanced, so an exception
            # path that skipped this would leave save()/eval checkpointing
            # stale initial params against an advanced counter.
            (self.agent.params, self.agent.actor_opt_state,
             self.agent.critic_opt_state) = pp, pa, pc
            for i, adv in enumerate(self.adversaries):
                adv.params = jax.tree.map(lambda x, i=i: x[i], apS)
                adv.actor_opt_state = jax.tree.map(lambda x, i=i: x[i], aaS)
                adv.critic_opt_state = jax.tree.map(lambda x, i=i: x[i], acS)
        self.save(self.checkpoint_path)

    def save(self, path):
        if not path:
            return
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        with open(path, 'wb') as f:
            pickle.dump({'agent': self.agent.state_dict(),
                         'adversaries': [a.state_dict()
                                         for a in self.adversaries],
                         **self._train_state_extras()}, f)

    def load(self, path):
        with open(path, 'rb') as f:
            state = pickle.load(f)
        self.agent.load_state_dict(state['agent'])
        for a, sd in zip(self.adversaries, state.get('adversaries', [])):
            a.load_state_dict(sd)
        self._restore_extras(state)
