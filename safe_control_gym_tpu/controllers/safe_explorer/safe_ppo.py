"""Safe-Exploration PPO (Dalal 2018 safety layer + PPO) — rebuild of
controllers/safe_explorer/safe_ppo.py (467 LoC reference).

Two-phase config (safe_ppo.py:93-101): ``pretraining`` collects
(obs, act, c, c_next) transitions with random actions into a ConstraintBuffer
and regresses the per-constraint sensitivity models; the main phase runs PPO
whose sampled actions are projected through the safety layer INSIDE the
jitted rollout scan (the reference wires action_modifier into the torch
actor, safe_ppo_utils.py:113-158). Constraint values are threaded from the
env step outputs (safe_ppo.py:110).
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
from safe_control_gym_tpu.controllers.safe_explorer.safe_explorer_utils import (
    ConstraintBuffer, SafetyLayer)
from safe_control_gym_tpu.utils.logging import ExperimentLogger

__all__ = ['SafeExplorerPPO']


class SafeExplorerPPO(BaseController):
    """PPO with a pre-trained safety layer projecting actions."""

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
        self.T = int(self.rollout_steps)
        self.gamma = float(self.gamma)
        assert self.env.constraints is not None and self.env.num_constraints > 0, \
            '[ERROR] SafeExplorerPPO requires env constraints.'
        self.num_constraints = self.env.num_constraints
        self.safety_layer = SafetyLayer(
            self.env.observation_space, self.env.action_space,
            hidden_dim=self.constraint_hidden_dim,
            num_constraints=self.num_constraints,
            lr=self.constraint_lr,
            slack=self.constraint_slack, seed=seed)
        self.constraint_buffer = ConstraintBuffer(
            self.env.observation_space.shape[0],
            self.env.action_space.shape[0], self.num_constraints,
            self.constraint_buffer_size, self.constraint_batch_size)
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
                              activation=getattr(self, 'activation', 'tanh'),
                              max_grad_norm=self.max_grad_norm, seed=seed)
        self.total_steps = 0
        self._key = jax.random.PRNGKey(seed)
        self.logger = ExperimentLogger(output_dir,
                                       use_tensorboard=getattr(self, 'tensorboard', False))
        self._env_states = None
        self._obs = None
        self._c = None
        self._build_jits()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def _build_jits(self):
        step_autoreset = self.func_env.step_autoreset
        N, T = self.N, self.T
        act_dim = self.env.action_space.shape[0]
        act_low = jnp.asarray(self.env.action_space.low, jnp.float32)
        act_high = jnp.asarray(self.env.action_space.high, jnp.float32)
        activation = self.agent.activation
        gamma = self.gamma
        use_gae = bool(self.use_gae)
        gae_lambda = float(self.gae_lambda)
        constraints = self.env.constraints
        nC = self.num_constraints
        get_safe = self.safety_layer._get_safe_action

        def c_of_state(state):
            return constraints.values_from(state, jnp.zeros((act_dim,)))

        c_of_state_v = jax.vmap(c_of_state)
        self._c_of_state_v = jax.jit(c_of_state_v)

        # -- pretraining collection: random actions ----------------------
        def pretrain_collect(env_states, obs, c, key, n_steps):
            def body(carry, _):
                env_states, obs_prev, c, key = carry
                key, k_act, k_reset = jax.random.split(key, 3)
                act = jax.random.uniform(k_act, (N, act_dim), minval=act_low,
                                         maxval=act_high)
                env_states, out, obs = step_autoreset(env_states, act,
                                                       k_reset)
                c_next = out.constraint_values
                ys = (obs_prev, act, c, c_next)
                c = jnp.where(out.done[:, None],
                              c_of_state_v(env_states.state), c_next)
                return (env_states, obs, c, key), ys

            (env_states, obs, c, key), ys = jax.lax.scan(
                body, (env_states, obs, c, key), None, length=n_steps)
            return env_states, obs, c, ys

        self._pretrain_collect_jit = jax.jit(pretrain_collect,
                                             static_argnames='n_steps')

        # -- PPO rollout with safety projection --------------------------
        def rollout(agent_params, safety_params, env_states, obs, c, key):
            def body(carry, _):
                env_states, obs, c, key = carry
                key, k_act, k_reset = jax.random.split(key, 3)
                dist = actor_dist(agent_params, obs, activation)
                raw_act = dist.sample(k_act)
                act = get_safe(safety_params, obs, raw_act, c)
                logp = dist.log_prob(act)
                v = critic_value(agent_params, obs, activation)
                env_states, out, next_obs = step_autoreset(env_states, act,
                                                           k_reset)
                mask = 1.0 - out.done.astype(jnp.float32)
                term_v = critic_value(agent_params, out.obs, activation)
                terminal_v = jnp.where(out.truncated[:, None], term_v, 0.0)
                c_next = jnp.where(out.done[:, None],
                                   c_of_state_v(env_states.state),
                                   out.constraint_values)
                ys = (obs, act, out.reward[:, None], mask[:, None], v, logp,
                      terminal_v, out.reward, out.constraint_violation)
                return (env_states, next_obs, c_next, key), ys

            (env_states, obs, c, key), ys = jax.lax.scan(
                body, (env_states, obs, c, key), None, length=T)
            (obs_b, act_b, rew_b, mask_b, v_b, logp_b, term_v_b, raw_rew_b,
             cviol_b) = ys
            last_val = critic_value(agent_params, obs, activation)
            rets, advs = compute_returns_and_advantages(
                rew_b, v_b, mask_b, term_v_b, last_val, gamma, use_gae,
                gae_lambda)
            advs = (advs - advs.mean()) / (advs.std() + 1e-6)
            batch = {'obs': obs_b.reshape(T * N, -1),
                     'act': act_b.reshape(T * N, -1),
                     'logp': logp_b.reshape(T * N, -1),
                     'adv': advs.reshape(T * N, -1),
                     'ret': rets.reshape(T * N, -1),
                     'v': v_b.reshape(T * N, -1)}
            stats = {'mean_reward': raw_rew_b.mean(),
                     'constraint_violations': cviol_b.sum()}
            return env_states, obs, c, key, batch, stats

        self._rollout_jit = jax.jit(rollout)

        # -- fused multi-iteration training (fused_iterations=K) ---------
        # Same pattern as PPO._make_fused: K complete (projected rollout ->
        # KL-gated minibatch update) iterations as ONE device program; the
        # frozen safety-layer params are a closed-over constant per trace.
        update = self.agent._make_update()

        def fused(params, a_state, c_state, safety_params, env_states, obs,
                  c, key, K):
            def body(carry, k):
                params, a_state, c_state, env_states, obs, c = carry
                kr, ku = jax.random.split(k)
                env_states, obs, c, _, batch, stats = rollout(
                    params, safety_params, env_states, obs, c, kr)
                params, a_state, c_state, results = update(
                    params, a_state, c_state, batch, ku)
                return (params, a_state, c_state, env_states, obs, c), {
                    **stats, **results}
            carry, outs = jax.lax.scan(
                body, (params, a_state, c_state, env_states, obs, c),
                jax.random.split(key, K))
            return carry, jax.tree.map(lambda x: x.mean(), outs)

        self._fused_jit = jax.jit(fused, static_argnames='K')

    # ------------------------------------------------------------------
    def reset(self):
        keys = jax.random.split(self._next_key(), self.N)
        self._env_states, self._obs = jax.vmap(self.func_env.reset)(keys)
        self._c = self._c_of_state_v(self._env_states.state)
        self.setup_results_dict()

    def close(self):
        self.env.close()
        self.eval_env.close()
        self.logger.close()

    def setup_results_dict(self):
        self.results_dict = {'obs': [], 'reward': [], 'done': [], 'info': [],
                             'action': []}

    def select_action(self, obs, info=None):
        """Deterministic safe action (safe_ppo.py:215-231)."""
        obs_j = jnp.asarray(obs, jnp.float32)
        act = self.agent.act(obs_j)
        if info is not None and 'constraint_values' in info:
            c = np.asarray(info['constraint_values'])
        else:
            c = np.zeros(self.num_constraints, np.float32)
        safe = self.safety_layer.get_safe_action(obs_j[None],
                                                 jnp.asarray(act)[None],
                                                 jnp.asarray(c)[None])
        return np.asarray(safe)[0]

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Two-phase training (safe_ppo.py:171-213, 280-360)."""
        if self._env_states is None:
            self.reset()
        if getattr(self, 'pretraining', True):
            self.pretrain_safety_layer()
        if getattr(self, 'pretrained', None):
            self.load_safety_layer(self.pretrained)
        max_env_steps = int(self.max_env_steps)
        steps_per_iter = self.N * self.T
        fused_k = max(1, int(getattr(self, 'fused_iterations', 1)))
        while self.total_steps < max_env_steps:
            if fused_k > 1:
                ((params, a_state, c_state, self._env_states, self._obs,
                  self._c), outs) = self._fused_jit(
                    self.agent.params, self.agent.actor_opt_state,
                    self.agent.critic_opt_state, self.safety_layer.params,
                    self._env_states, self._obs, self._c, self._next_key(),
                    K=fused_k)
                self.agent.params = params
                self.agent.actor_opt_state = a_state
                self.agent.critic_opt_state = c_state
                results = {k: float(v)
                           for k, v in jax.device_get(outs).items()}
                stats = {}
                self.total_steps += steps_per_iter * fused_k
            else:
                (self._env_states, self._obs, self._c, _, batch,
                 stats) = self._rollout_jit(self.agent.params,
                                            self.safety_layer.params,
                                            self._env_states, self._obs,
                                            self._c, self._next_key())
                results = self.agent.update(batch, self._next_key())
                self.total_steps += steps_per_iter
            results.update({k: float(v)
                            for k, v in jax.device_get(stats).items()})
            if self.log_interval and self.total_steps % self.log_interval < steps_per_iter:
                for k, v in results.items():
                    self.logger.add_scalar(f'safe_ppo/{k}', v, self.total_steps)
                self.logger.dump_scalars()
        self.save(self.checkpoint_path)

    def pretrain_safety_layer(self):
        """Collect random transitions + regress constraint models
        (safe_ppo.py:280-297, 428-452)."""
        steps_per_epoch = max(1, int(self.constraint_steps_per_epoch) // self.N)
        for epoch in range(int(self.constraint_epochs)):
            (self._env_states, self._obs, self._c, ys) = \
                self._pretrain_collect_jit(self._env_states, self._obs,
                                           self._c, self._next_key(),
                                           n_steps=steps_per_epoch)
            obs_b, act_b, c_b, c_next_b = ys
            M = steps_per_epoch * self.N
            self.constraint_buffer.push({
                'obs': np.asarray(obs_b).reshape(M, -1),
                'act': np.asarray(act_b).reshape(M, -1),
                'c': np.asarray(c_b).reshape(M, -1),
                'c_next': np.asarray(c_next_b).reshape(M, -1)})
            n_batches = max(1, M // int(self.constraint_batch_size))
            for _ in range(n_batches):
                batch = self.constraint_buffer.sample()
                self.safety_layer.update(batch)

    # ------------------------------------------------------------------

    def run(self, env=None, n_episodes=10, **kwargs):
        if env is None:
            env = self.eval_env
        returns = []
        for _ in range(n_episodes):
            obs, info = env.reset()
            done, ep_ret = False, 0.0
            while not done:
                action = self.select_action(obs, info)
                obs, rew, done, info = env.step(action)
                ep_ret += rew
            returns.append(ep_ret)
        return {'ep_returns': np.asarray(returns)}

    # ------------------------------------------------------------------
    def save(self, path):
        """Checkpoint incl. PRNG + env/constraint state for exact resume
        (reference safe_ppo.py:124-143 random_state parity)."""
        if not path:
            return
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        state = {'agent': self.agent.state_dict(),
                 'safety_layer': self.safety_layer.state_dict(),
                 'total_steps': self.total_steps,
                 'key': np.asarray(self._key)}
        if self.training and self._env_states is not None:
            state['env_states'] = jax.tree.map(np.asarray, self._env_states)
            state['obs'] = np.asarray(self._obs)
            state['c'] = np.asarray(self._c)
        with open(path, 'wb') as f:
            pickle.dump(state, f)

    def load(self, path):
        with open(path, 'rb') as f:
            state = pickle.load(f)
        self.agent.load_state_dict(state['agent'])
        self.safety_layer.load_state_dict(state['safety_layer'])
        self.total_steps = int(state.get('total_steps', 0))
        if 'key' in state:
            from safe_control_gym_tpu.utils.utils import restore_prng_key
            self._key = restore_prng_key(state['key'])
        if 'env_states' in state:
            self._env_states = jax.tree.map(jnp.asarray,
                                            state['env_states'])
            self._obs = jnp.asarray(state['obs'])
            self._c = jnp.asarray(state['c'])

    def load_safety_layer(self, path):
        with open(path, 'rb') as f:
            state = pickle.load(f)
        self.safety_layer.load_state_dict(
            state.get('safety_layer', state))
