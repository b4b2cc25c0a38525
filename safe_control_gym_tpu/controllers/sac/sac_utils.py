"""SAC agent machinery — JAX rebuild of controllers/sac/sac_utils.py.

Twin soft Q-functions + tanh-squashed Gaussian actor with action-space
unscaling (sac_utils.py:178-298), entropy temperature with optional auto
tuning (:119-156), soft target updates (:421-424). The whole
(policy, alpha, critic, target) update is one jitted function.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.math.networks import mlp_apply, mlp_init

__all__ = ['init_sac_params', 'sac_actor_forward', 'q_value', 'SACAgent']

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


def init_sac_params(key, obs_dim, act_dim, hidden_dims,
                    init_temperature=0.2):
    ka, k1, k2 = jax.random.split(key, 3)
    params = {
        # Trunk -> [mu, log_std] in one output layer (equivalent to the
        # reference's two separate heads on a shared trunk).
        'actor': mlp_init(ka, obs_dim, 2 * act_dim, hidden_dims,
                          orthogonal=False),
        'q1': mlp_init(k1, obs_dim + act_dim, 1, hidden_dims,
                       orthogonal=False),
        'q2': mlp_init(k2, obs_dim + act_dim, 1, hidden_dims,
                       orthogonal=False),
    }
    target = {'q1': jax.tree.map(lambda x: x, params['q1']),
              'q2': jax.tree.map(lambda x: x, params['q2'])}
    log_alpha = jnp.asarray(np.log(init_temperature), jnp.float32)
    return params, target, log_alpha


def sac_actor_forward(actor_params, obs, key, act_low, act_high,
                      activation='relu', deterministic=False,
                      with_logprob=True):
    """tanh-squashed Gaussian policy with unscale postprocess
    (sac_utils.py:192-211)."""
    out = mlp_apply(actor_params, obs, activation)
    mu, log_std = jnp.split(out, 2, axis=-1)
    log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
    std = jnp.exp(log_std)
    if deterministic:
        pre = mu
    else:
        pre = mu + std * jax.random.normal(key, mu.shape)
    logp = None
    if with_logprob:
        logp = jnp.sum(
            -0.5 * ((pre - mu) / std) ** 2 - log_std
            - 0.5 * jnp.log(2 * jnp.pi), axis=-1, keepdims=True)
        # tanh correction (sac_utils.py:204-205).
        logp = logp - jnp.sum(
            2 * (jnp.log(2.0) - pre - jax.nn.softplus(-2 * pre)),
            axis=-1, keepdims=True)
    action = jnp.tanh(pre)
    action = act_low + 0.5 * (action + 1.0) * (act_high - act_low)
    return action, logp


def q_value(q_params, obs, act, activation='relu'):
    return mlp_apply(q_params, jnp.concatenate([obs, act], axis=-1),
                     activation)


class SACAgent:
    """Models + optimizers + jitted update (sac_utils.py:33-176)."""

    def __init__(self, obs_space, act_space, hidden_dim=256,
                 gamma=0.99, tau=0.005, init_temperature=0.2,
                 use_entropy_tuning=False, target_entropy=None,
                 actor_lr=1e-3, critic_lr=1e-3, entropy_lr=1e-3,
                 activation='relu', seed=0, **kwargs):
        self.obs_dim = obs_space.shape[0]
        self.act_dim = act_space.shape[0]
        self.act_low = jnp.asarray(act_space.low, jnp.float32)
        self.act_high = jnp.asarray(act_space.high, jnp.float32)
        self.gamma = gamma
        self.tau = tau
        self.use_entropy_tuning = use_entropy_tuning
        self.target_entropy = (float(target_entropy) if target_entropy
                               is not None else -float(self.act_dim))
        self.activation = activation
        self.params, self.target, self.log_alpha = init_sac_params(
            jax.random.PRNGKey(seed), self.obs_dim, self.act_dim,
            [hidden_dim] * 2, init_temperature)
        self.actor_opt = optax.adam(actor_lr)
        self.critic_opt = optax.adam(critic_lr)
        self.alpha_opt = optax.adam(entropy_lr)
        self.actor_opt_state = self.actor_opt.init(self.params['actor'])
        self.critic_opt_state = self.critic_opt.init(
            {'q1': self.params['q1'], 'q2': self.params['q2']})
        self.alpha_opt_state = self.alpha_opt.init(self.log_alpha)

    # -- pure update used by SAC's fused train phase --------------------
    def make_update_step(self):
        gamma, tau = self.gamma, self.tau
        act_low, act_high = self.act_low, self.act_high
        activation = self.activation
        use_tuning = self.use_entropy_tuning
        target_entropy = self.target_entropy
        actor_opt, critic_opt, alpha_opt = (self.actor_opt, self.critic_opt,
                                            self.alpha_opt)

        def update_step(train_state, batch, key):
            (params, target, log_alpha, a_st, c_st, al_st) = train_state
            alpha = jnp.exp(log_alpha)
            k1, k2 = jax.random.split(key)

            # Critic loss (sac_utils.py:124-141).
            def critic_loss_fn(q_params):
                q1 = q_value(q_params['q1'], batch['obs'], batch['act'],
                             activation)
                q2 = q_value(q_params['q2'], batch['obs'], batch['act'],
                             activation)
                next_act, next_logp = sac_actor_forward(
                    params['actor'], batch['next_obs'], k1, act_low,
                    act_high, activation)
                nq1 = q_value(target['q1'], batch['next_obs'], next_act,
                              activation)
                nq2 = q_value(target['q2'], batch['next_obs'], next_act,
                              activation)
                nq = jnp.minimum(nq1, nq2) - alpha * next_logp
                q_targ = jax.lax.stop_gradient(
                    batch['rew'] + gamma * batch['mask'] * nq)
                return ((q1 - q_targ) ** 2).mean() + ((q2 - q_targ) ** 2).mean()

            q_params = {'q1': params['q1'], 'q2': params['q2']}
            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(q_params)
            c_updates, c_st = critic_opt.update(c_grads, c_st, q_params)
            q_params = optax.apply_updates(q_params, c_updates)
            params = {**params, 'q1': q_params['q1'], 'q2': q_params['q2']}

            # Actor loss (sac_utils.py:110-117).
            def actor_loss_fn(actor_params):
                act, logp = sac_actor_forward(actor_params, batch['obs'], k2,
                                              act_low, act_high, activation)
                q1 = q_value(params['q1'], batch['obs'], act, activation)
                q2 = q_value(params['q2'], batch['obs'], act, activation)
                q = jnp.minimum(q1, q2)
                loss = (jax.lax.stop_gradient(alpha) * logp - q).mean()
                return loss, logp

            (p_loss, logp), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True)(params['actor'])
            a_updates, a_st = actor_opt.update(a_grads, a_st, params['actor'])
            params = {**params,
                      'actor': optax.apply_updates(params['actor'], a_updates)}

            # Alpha (entropy temperature) tuning (sac_utils.py:119-121, 143-156).
            if use_tuning:
                def alpha_loss_fn(la):
                    return -(la * jax.lax.stop_gradient(
                        logp + target_entropy)).mean()
                al_loss, al_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
                al_updates, al_st = alpha_opt.update(al_grad, al_st, log_alpha)
                log_alpha = optax.apply_updates(log_alpha, al_updates)

            # Soft target update (sac_utils.py:421-424).
            target = jax.tree.map(lambda t, s: (1 - tau) * t + tau * s,
                                  target,
                                  {'q1': params['q1'], 'q2': params['q2']})
            losses = jnp.stack([p_loss, c_loss])
            return (params, target, log_alpha, a_st, c_st, al_st), losses

        return update_step

    # -- inference -------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _act_jit(self, params, obs, deterministic, key):
        a, _ = sac_actor_forward(params, obs, key, self.act_low,
                                 self.act_high, self.activation,
                                 deterministic=deterministic,
                                 with_logprob=False)
        return a

    def act(self, obs, deterministic=True, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        return np.asarray(self._act_jit(self.params['actor'],
                                        jnp.asarray(obs), deterministic,
                                        key)).astype(np.float32)

    # -- checkpoint ------------------------------------------------------
    def train_state(self):
        return (self.params, self.target, self.log_alpha,
                self.actor_opt_state, self.critic_opt_state,
                self.alpha_opt_state)

    def set_train_state(self, ts):
        (self.params, self.target, self.log_alpha, self.actor_opt_state,
         self.critic_opt_state, self.alpha_opt_state) = ts

    def state_dict(self):
        return jax.tree.map(np.asarray, {
            'params': self.params, 'target': self.target,
            'log_alpha': self.log_alpha,
            'actor_opt_state': self.actor_opt_state,
            'critic_opt_state': self.critic_opt_state,
            'alpha_opt_state': self.alpha_opt_state})

    def load_state_dict(self, sd):
        self.params = jax.tree.map(jnp.asarray, sd['params'])
        self.target = jax.tree.map(jnp.asarray, sd['target'])
        self.log_alpha = jnp.asarray(sd['log_alpha'])
        self.actor_opt_state = jax.tree.map(jnp.asarray, sd['actor_opt_state'])
        self.critic_opt_state = jax.tree.map(jnp.asarray, sd['critic_opt_state'])
        self.alpha_opt_state = jax.tree.map(jnp.asarray, sd['alpha_opt_state'])
