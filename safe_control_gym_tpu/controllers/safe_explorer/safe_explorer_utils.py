"""Safety layer for safe exploration (Dalal 2018) — rebuild of
controllers/safe_explorer/safe_explorer_utils.py (299 LoC reference).

Per-constraint linear sensitivity models c_next ~ c + g_i(obs)' a
(safe_explorer_utils.py:86-105) become a STACKED parameter pytree (leading
axis = constraint index) evaluated with ``vmap`` — one fused forward for all
constraints — and the analytic max-multiplier projection
(safe_explorer_utils.py:120-175) is a pure jittable function, so it runs
inside the PPO rollout scan on device.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.controllers.off_policy_utils import (
    replay_init, replay_push, replay_sample)
from safe_control_gym_tpu.math.networks import mlp_apply, mlp_init

__all__ = ['SafetyLayer', 'ConstraintBuffer']


class SafetyLayer:
    """Layer to learn constraint models and project actions to safety."""

    def __init__(self, obs_space, act_space, hidden_dim=10,
                 num_constraints=1, lr=0.001, slack=None, seed=0, **kwargs):
        self.num_constraints = num_constraints
        self.obs_dim = obs_space.shape[0]
        self.act_dim = act_space.shape[0]
        # Stacked per-constraint MLPs: g_i(obs) -> R^act_dim.
        keys = jax.random.split(jax.random.PRNGKey(seed), num_constraints)
        params_list = [mlp_init(k, self.obs_dim, self.act_dim, [hidden_dim],
                                orthogonal=False) for k in keys]
        self.params = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        if slack is None:
            slack = [0.0] * num_constraints
        elif np.isscalar(slack):
            slack = [float(slack)] * num_constraints
        self.slack = jnp.asarray(np.asarray(slack, dtype=np.float32))
        assert len(slack) == num_constraints
        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(self.params)
        self._build_jits()

    def _build_jits(self):
        opt = self.opt
        slack = self.slack

        def g_all(params, obs):
            """(C, ..., A) sensitivities for all constraints."""
            return jax.vmap(lambda p: mlp_apply(p, obs, 'relu'))(params)

        self._g_all = g_all

        def loss_fn(params, batch):
            """Sum of per-constraint regression losses
            (safe_explorer_utils.py:86-105)."""
            g = g_all(params, batch['obs'])            # (C, B, A)
            pred = batch['c'].T + jnp.einsum('cba,ba->cb', g, batch['act'])
            losses = jnp.mean((batch['c_next'].T - pred) ** 2, axis=1)
            return jnp.sum(losses), losses

        @jax.jit
        def update(params, opt_state, batch):
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        self._update_jit = update

        def get_safe_action(params, obs, act, c):
            """Analytic closed-form projection (Dalal 2018 eqns 5-6;
            safe_explorer_utils.py:120-175). Batched over leading dim."""
            g = g_all(params, obs)                     # (C, B, A)
            numer = jnp.einsum('cba,ba->bc', g, act) + c + slack[None, :]
            denom = jnp.einsum('cba,cba->cb', g, g).T + 1e-8
            mult = jax.nn.relu(numer / denom)          # (B, C)
            max_idx = jnp.argmax(mult, axis=-1)        # (B,)
            max_mult = jnp.take_along_axis(mult, max_idx[:, None], axis=1)
            max_g = jnp.take_along_axis(
                jnp.moveaxis(g, 0, 1), max_idx[:, None, None], axis=1)[:, 0]
            return act - max_mult * max_g

        self._get_safe_action = jax.jit(get_safe_action)

    def update(self, batch: Dict) -> Dict:
        self.params, self.opt_state, losses = self._update_jit(
            self.params, self.opt_state, batch)
        return {f'constraint_{i}_loss': float(l)
                for i, l in enumerate(np.asarray(losses))}

    def compute_loss(self, batch):
        g = self._g_all(self.params, batch['obs'])
        pred = batch['c'].T + jnp.einsum('cba,ba->cb', g, batch['act'])
        return list(np.asarray(jnp.mean((batch['c_next'].T - pred) ** 2,
                                        axis=1)))

    def get_safe_action(self, obs, act, c):
        """Host-friendly wrapper; accepts single or batched arrays."""
        obs = jnp.atleast_2d(jnp.asarray(obs, jnp.float32))
        act = jnp.atleast_2d(jnp.asarray(act, jnp.float32))
        c = jnp.atleast_2d(jnp.asarray(c, jnp.float32))
        return self._get_safe_action(self.params, obs, act, c)

    def state_dict(self):
        return {'params': jax.tree.map(np.asarray, self.params),
                'opt_state': jax.tree.map(np.asarray, self.opt_state)}

    def load_state_dict(self, sd):
        self.params = jax.tree.map(jnp.asarray, sd['params'])
        self.opt_state = jax.tree.map(jnp.asarray, sd['opt_state'])


class ConstraintBuffer:
    """Replay for (obs, act, c, c_next) transitions
    (safe_explorer_utils.py:178+), on-device ring buffer."""

    def __init__(self, obs_dim, act_dim, num_constraints, max_size,
                 batch_size=64):
        self.batch_size = batch_size
        self.state = replay_init(
            {'obs': obs_dim, 'act': act_dim, 'c': num_constraints,
             'c_next': num_constraints}, int(max_size))
        self._key = jax.random.PRNGKey(1)

    def push(self, batch):
        self.state = replay_push(self.state, {
            k: jnp.atleast_2d(jnp.asarray(v, jnp.float32))
            for k, v in batch.items()})

    def sample(self, batch_size=None):
        self._key, k = jax.random.split(self._key)
        return replay_sample(self.state, k, batch_size or self.batch_size)
