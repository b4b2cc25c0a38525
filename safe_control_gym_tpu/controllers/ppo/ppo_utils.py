"""PPO agent machinery — JAX rebuild of controllers/ppo/ppo_utils.py.

The torch ``PPOAgent`` (+Adam opts) becomes a parameter pytree + optax
optimizers with a fully jitted update: ``opt_epochs`` x minibatch SGD with the
reference's KL-gated actor step (ppo_utils.py:113-146) runs as ONE XLA
program via nested ``lax.scan`` — no host round-trips between minibatches.

GAE / return computation (ppo_utils.py:374-400) is a ``lax.scan`` over
reversed time, vectorized over the env batch.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.math.distributions import Categorical, Normal
from safe_control_gym_tpu.math.networks import mlp_apply, mlp_init

__all__ = ['init_actor_critic', 'actor_dist', 'critic_value', 'PPOAgent',
           'compute_returns_and_advantages']


def init_actor_critic(key, obs_dim: int, act_dim: int, hidden_dims,
                      init_logstd: float = -0.5, discrete: bool = False):
    """Actor (MLP -> mean + learned logstd, or logits for discrete action
    spaces) + critic MLP params (MLPActorCritic, ppo_utils.py:150-236)."""
    k_a, k_c = jax.random.split(key)
    params = {
        'actor': mlp_init(k_a, obs_dim, act_dim, hidden_dims),
        'critic': mlp_init(k_c, obs_dim, 1, hidden_dims, out_gain=1.0),
    }
    if not discrete:
        params['logstd'] = jnp.full((act_dim,), init_logstd)
    return params


def actor_dist(params, obs, activation='tanh'):
    """Gaussian for continuous actors; Categorical over logits when the
    params carry no logstd (discrete branch, ppo_utils.py:162-166)."""
    out = mlp_apply(params['actor'], obs, activation)
    if 'logstd' in params:
        return Normal(out, jnp.exp(params['logstd']))
    return Categorical(out)


def critic_value(params, obs, activation='tanh'):
    return mlp_apply(params['critic'], obs, activation)


def compute_returns_and_advantages(rews, vals, masks, terminal_vals=None,
                                   last_val=None, gamma=0.99, use_gae=False,
                                   gae_lambda=0.95):
    """Discounted returns + (GAE) advantages (ppo_utils.py:374-400).

    Shapes: rews/masks/terminal_vals (T, N, 1); vals (T, N, 1);
    last_val (N, 1). Returns (rets, advs) of shape (T, N, 1).
    """
    T = rews.shape[0]
    if terminal_vals is None:
        terminal_vals = jnp.zeros_like(rews)
    if last_val is None:
        last_val = jnp.zeros_like(rews[0])
    # Compensate for time truncation (ppo_utils.py:391).
    rews = rews + gamma * terminal_vals
    vals_ext = jnp.concatenate([vals, last_val[None]], axis=0)

    def body(carry, xs):
        ret, adv = carry
        rew, mask, v, v_next = xs
        ret = rew + gamma * mask * ret
        if use_gae:
            td = rew + gamma * mask * v_next - v
            adv = adv * gae_lambda * gamma * mask + td
        else:
            adv = ret - v
        return (ret, adv), (ret, adv)

    init = (last_val, jnp.zeros_like(last_val))
    xs = (rews[::-1], masks[::-1], vals_ext[:-1][::-1], vals_ext[1:][::-1])
    _, (rets_rev, advs_rev) = jax.lax.scan(body, init, xs)
    return rets_rev[::-1], advs_rev[::-1]


class PPOAgent:
    """Models + optimizers + jitted update (ppo_utils.py:15-147)."""

    def __init__(self, obs_space, act_space, hidden_dim=64,
                 use_clipped_value=False, clip_param=0.2, target_kl=0.01,
                 entropy_coef=0.01, actor_lr=3e-4, critic_lr=1e-3,
                 opt_epochs=10, mini_batch_size=64, activation='tanh',
                 max_grad_norm=0.5, seed=0, **kwargs):
        self.obs_space = obs_space
        self.act_space = act_space
        self.obs_dim = obs_space.shape[0]
        # Discrete (gym.spaces.Discrete-like) vs continuous Box.
        self.discrete = hasattr(act_space, 'n')
        self.act_dim = (int(act_space.n) if self.discrete
                        else act_space.shape[0])
        self.use_clipped_value = use_clipped_value
        self.clip_param = clip_param
        self.target_kl = target_kl
        self.entropy_coef = entropy_coef
        self.opt_epochs = opt_epochs
        self.mini_batch_size = mini_batch_size
        self.activation = activation
        self.max_grad_norm = max_grad_norm

        self.params = init_actor_critic(jax.random.PRNGKey(seed),
                                        self.obs_dim, self.act_dim,
                                        [hidden_dim] * 2,
                                        discrete=self.discrete)
        self.actor_opt = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(actor_lr))
        self.critic_opt = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(critic_lr))
        actor_sub = {k: self.params[k] for k in ('actor', 'logstd')
                     if k in self.params}
        self.actor_opt_state = self.actor_opt.init(actor_sub)
        self.critic_opt_state = self.critic_opt.init(self.params['critic'])
        self._update_jit = jax.jit(self._make_update())

    # -- pure pieces -----------------------------------------------------
    def policy_loss_fn(self, actor_params, obs, act, logp_old, adv):
        """Clipped surrogate + entropy + approx KL (ppo_utils.py:82-97)."""
        dist = actor_dist(actor_params, obs, self.activation)
        logp = dist.log_prob(act)
        # Clamp the log-ratio before exp: off-policy actions (e.g. a safety
        # layer projecting far outside the current policy) can push
        # |logp - logp_old| past f32 exp overflow, turning one minibatch
        # into inf loss -> NaN params. exp(+-20) bounds the ratio at ~5e8
        # without affecting any normal-regime update (the KL gate rejects
        # such steps anyway; this keeps the REJECTED step's grads finite).
        ratio = jnp.exp(jnp.clip(logp - logp_old, -20.0, 20.0))
        clip_adv = jnp.clip(ratio, 1 - self.clip_param,
                            1 + self.clip_param) * adv
        policy_loss = -jnp.minimum(ratio * adv, clip_adv).mean()
        entropy_loss = -dist.entropy().mean()
        approx_kl = (logp_old - logp).mean()
        total = policy_loss + self.entropy_coef * entropy_loss
        return total, (policy_loss, entropy_loss, approx_kl)

    def value_loss_fn(self, critic_params, obs, ret, v_old):
        """(Optionally clipped) value MSE (ppo_utils.py:99-111)."""
        v_cur = mlp_apply(critic_params, obs, self.activation)
        if self.use_clipped_value:
            v_clipped = v_old + jnp.clip(v_cur - v_old, -self.clip_param,
                                         self.clip_param)
            v_loss = jnp.maximum((v_cur - ret) ** 2, (v_clipped - ret) ** 2)
            return 0.5 * v_loss.mean()
        return 0.5 * ((v_cur - ret) ** 2).mean()

    def _make_update(self):
        """Build the fully-jitted epochs x minibatches update."""
        opt_epochs = self.opt_epochs
        mb_size = self.mini_batch_size
        target_kl = self.target_kl

        def update(params, actor_opt_state, critic_opt_state, batch, key):
            """batch: dict of (M, ...) flattened rollout arrays."""
            M = batch['obs'].shape[0]
            mb = min(mb_size, M)  # clamp when the rollout is smaller
            num_mb = max(M // mb, 1)
            used = num_mb * mb

            def epoch_body(carry, ep_key):
                params, a_state, c_state = carry
                perm = jax.random.permutation(ep_key, M)[:used]
                mb_idx = perm.reshape(num_mb, mb)

                def mb_body(carry, idx):
                    params, a_state, c_state = carry
                    mbatch = {k: v[idx] for k, v in batch.items()}
                    actor_sub = {k: params[k] for k in ('actor', 'logstd')
                                 if k in params}
                    (pl_total, (p_loss, e_loss, kl)), grads = \
                        jax.value_and_grad(self.policy_loss_fn, has_aux=True)(
                            actor_sub, mbatch['obs'], mbatch['act'],
                            mbatch['logp'], mbatch['adv'])
                    updates, a_state_new = self.actor_opt.update(
                        grads, a_state, actor_sub)
                    actor_new = optax.apply_updates(actor_sub, updates)
                    # KL-gated actor step (ppo_utils.py:128-131).
                    gate = jnp.logical_or(target_kl <= 0,
                                          kl <= 1.5 * target_kl)
                    actor_applied = jax.tree.map(
                        lambda new, old: jnp.where(gate, new, old),
                        actor_new, actor_sub)
                    a_state = jax.tree.map(
                        lambda new, old: jnp.where(gate, new, old),
                        a_state_new, a_state)
                    v_loss, v_grads = jax.value_and_grad(self.value_loss_fn)(
                        params['critic'], mbatch['obs'], mbatch['ret'],
                        mbatch['v'])
                    v_updates, c_state = self.critic_opt.update(
                        v_grads, c_state, params['critic'])
                    critic_new = optax.apply_updates(params['critic'], v_updates)
                    params = dict(actor_applied, critic=critic_new)
                    return (params, a_state, c_state), jnp.stack(
                        [p_loss, v_loss, e_loss, kl])

                (params, a_state, c_state), losses = jax.lax.scan(
                    mb_body, (params, a_state, c_state), mb_idx)
                return (params, a_state, c_state), losses.mean(axis=0)

            ep_keys = jax.random.split(key, opt_epochs)
            (params, actor_opt_state, critic_opt_state), ep_losses = \
                jax.lax.scan(epoch_body,
                             (params, actor_opt_state, critic_opt_state),
                             ep_keys)
            mean_losses = ep_losses.mean(axis=0)
            return params, actor_opt_state, critic_opt_state, {
                'policy_loss': mean_losses[0], 'value_loss': mean_losses[1],
                'entropy_loss': mean_losses[2], 'approx_kl': mean_losses[3]}

        return update

    def update(self, batch: Dict[str, jax.Array], key) -> Dict[str, float]:
        """Run the jitted update; mutates host-side param/opt state."""
        (self.params, self.actor_opt_state, self.critic_opt_state,
         results) = self._update_jit(self.params, self.actor_opt_state,
                                     self.critic_opt_state, batch, key)
        # ONE transfer for all scalars (remote-dispatch tunnel).
        return {k: float(v) for k, v in jax.device_get(results).items()}

    # -- inference -------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _step_jit(self, params, obs, key):
        dist = actor_dist(params, obs, self.activation)
        action = dist.sample(key)
        logp = dist.log_prob(action)
        v = critic_value(params, obs, self.activation)
        return action, v, logp

    @functools.partial(jax.jit, static_argnums=0)
    def _act_jit(self, params, obs):
        return actor_dist(params, obs, self.activation).mode()

    def step(self, obs, key):
        """Sample action + value + logp (MLPActorCritic.step :224-231)."""
        a, v, lp = self._step_jit(self.params, jnp.asarray(obs), key)
        return np.asarray(a), np.asarray(v), np.asarray(lp)

    def act(self, obs):
        """Deterministic (mode) action (MLPActorCritic.act :233-238)."""
        return np.asarray(self._act_jit(self.params, jnp.asarray(obs))).astype(np.float32)

    # -- checkpoint ------------------------------------------------------
    def state_dict(self):
        return {
            'params': jax.tree.map(np.asarray, self.params),
            'actor_opt_state': jax.tree.map(np.asarray, self.actor_opt_state),
            'critic_opt_state': jax.tree.map(np.asarray, self.critic_opt_state),
        }

    def load_state_dict(self, sd):
        self.params = jax.tree.map(jnp.asarray, sd['params'])
        self.actor_opt_state = jax.tree.map(jnp.asarray, sd['actor_opt_state'])
        self.critic_opt_state = jax.tree.map(jnp.asarray, sd['critic_opt_state'])
