"""DDPG agent machinery — JAX rebuild of controllers/ddpg/ddpg_utils.py.

Deterministic tanh actor with action-space unscaling + single Q function and
target networks (ddpg_utils.py:127-180); action noise built from the YAML
``random_process`` spec (make_action_noise_process, :226-236) with the
functional OU/Gaussian processes in math/random_processes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.math.networks import mlp_apply, mlp_init
from safe_control_gym_tpu.math.random_processes import (GaussianProcess,
                                                        OrnsteinUhlenbeckProcess)
from safe_control_gym_tpu.math.schedules import (ConstantSchedule,
                                                 LinearSchedule)

__all__ = ['init_ddpg_params', 'ddpg_actor_forward', 'ddpg_q_value',
           'DDPGAgent', 'make_action_noise_process']


def init_ddpg_params(key, obs_dim, act_dim, hidden_dims):
    ka, kq, kf = jax.random.split(key, 3)
    actor = mlp_init(ka, obs_dim, act_dim, hidden_dims, orthogonal=False)
    # Small final-layer init (+-3e-3, standard DDPG practice) keeps the tanh
    # unsaturated early in training so the policy gradient stays alive.
    actor[-1]['w'] = jax.random.uniform(
        kf, actor[-1]['w'].shape, minval=-3e-3, maxval=3e-3)
    params = {
        'actor': actor,
        'q': mlp_init(kq, obs_dim + act_dim, 1, hidden_dims,
                      orthogonal=False),
    }
    target = jax.tree.map(lambda x: x, params)
    return params, target


def ddpg_actor_forward(actor_params, obs, act_low, act_high,
                       activation='relu'):
    """Deterministic tanh actor with unscaling (ddpg_utils.py:127-141)."""
    a = jnp.tanh(mlp_apply(actor_params, obs, activation))
    return act_low + 0.5 * (a + 1.0) * (act_high - act_low)


def ddpg_q_value(q_params, obs, act, activation='relu'):
    return mlp_apply(q_params, jnp.concatenate([obs, act], axis=-1),
                     activation)


def make_action_noise_process(noise_config, act_space):
    """Build OU/Gaussian exploration noise from YAML spec
    (ddpg_utils.py:226-236)."""
    noise_config = dict(noise_config or {})
    process_name = noise_config.pop('func', 'OrnsteinUhlenbeckProcess')
    std_config = dict(noise_config.pop('std', {'func': 'LinearSchedule',
                                               'args': 0.2}))
    std_name = std_config.pop('func', 'LinearSchedule')
    std_args = std_config.pop('args', 0.2)
    if not isinstance(std_args, (list, tuple)):
        std_args = [std_args]
    std_cls = {'LinearSchedule': LinearSchedule,
               'ConstantSchedule': ConstantSchedule}[std_name]
    std = std_cls(*std_args)
    proc_cls = {'OrnsteinUhlenbeckProcess': OrnsteinUhlenbeckProcess,
                'GaussianProcess': GaussianProcess}[process_name]
    return proc_cls(size=act_space.shape[0], std=std, **noise_config)


class DDPGAgent:
    """Models + optimizers + jitted update (ddpg_utils.py:20-121)."""

    def __init__(self, obs_space, act_space, hidden_dim=256, gamma=0.99,
                 tau=0.005, actor_lr=1e-3, critic_lr=1e-3,
                 activation='relu', seed=0, **kwargs):
        self.obs_dim = obs_space.shape[0]
        self.act_dim = act_space.shape[0]
        self.act_low = jnp.asarray(act_space.low, jnp.float32)
        self.act_high = jnp.asarray(act_space.high, jnp.float32)
        self.gamma = gamma
        self.tau = tau
        self.activation = activation
        self.params, self.target = init_ddpg_params(
            jax.random.PRNGKey(seed), self.obs_dim, self.act_dim,
            [hidden_dim] * 2)
        self.actor_opt = optax.adam(actor_lr)
        self.critic_opt = optax.adam(critic_lr)
        self.actor_opt_state = self.actor_opt.init(self.params['actor'])
        self.critic_opt_state = self.critic_opt.init(self.params['q'])

    def make_update_step(self):
        gamma, tau = self.gamma, self.tau
        act_low, act_high = self.act_low, self.act_high
        activation = self.activation
        actor_opt, critic_opt = self.actor_opt, self.critic_opt

        def update_step(train_state, batch, key):
            params, target, a_st, c_st = train_state

            # Critic (ddpg_utils.py:85-98).
            def critic_loss_fn(q_params):
                q = ddpg_q_value(q_params, batch['obs'], batch['act'],
                                 activation)
                next_act = ddpg_actor_forward(target['actor'],
                                              batch['next_obs'], act_low,
                                              act_high, activation)
                nq = ddpg_q_value(target['q'], batch['next_obs'], next_act,
                                  activation)
                q_targ = jax.lax.stop_gradient(
                    batch['rew'] + gamma * batch['mask'] * nq)
                return ((q - q_targ) ** 2).mean()

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(params['q'])
            c_updates, c_st = critic_opt.update(c_grads, c_st, params['q'])
            params = {**params,
                      'q': optax.apply_updates(params['q'], c_updates)}

            # Actor (ddpg_utils.py:77-83).
            def actor_loss_fn(actor_params):
                act = ddpg_actor_forward(actor_params, batch['obs'], act_low,
                                         act_high, activation)
                q = ddpg_q_value(params['q'], batch['obs'], act, activation)
                return -q.mean()

            p_loss, a_grads = jax.value_and_grad(actor_loss_fn)(
                params['actor'])
            a_updates, a_st = actor_opt.update(a_grads, a_st, params['actor'])
            params = {**params,
                      'actor': optax.apply_updates(params['actor'], a_updates)}

            # Soft target update (ddpg_utils.py:115-118).
            target = jax.tree.map(lambda t, s: (1 - tau) * t + tau * s,
                                  target, params)
            return (params, target, a_st, c_st), jnp.stack([p_loss, c_loss])

        return update_step

    @functools.partial(jax.jit, static_argnums=0)
    def _act_jit(self, actor_params, obs):
        return ddpg_actor_forward(actor_params, obs, self.act_low,
                                  self.act_high, self.activation)

    def act(self, obs, **kwargs):
        return np.asarray(self._act_jit(self.params['actor'],
                                        jnp.asarray(obs))).astype(np.float32)

    def train_state(self):
        return (self.params, self.target, self.actor_opt_state,
                self.critic_opt_state)

    def set_train_state(self, ts):
        (self.params, self.target, self.actor_opt_state,
         self.critic_opt_state) = ts

    def state_dict(self):
        return jax.tree.map(np.asarray, {
            'params': self.params, 'target': self.target,
            'actor_opt_state': self.actor_opt_state,
            'critic_opt_state': self.critic_opt_state})

    def load_state_dict(self, sd):
        self.params = jax.tree.map(jnp.asarray, sd['params'])
        self.target = jax.tree.map(jnp.asarray, sd['target'])
        self.actor_opt_state = jax.tree.map(jnp.asarray, sd['actor_opt_state'])
        self.critic_opt_state = jax.tree.map(jnp.asarray,
                                             sd['critic_opt_state'])
