"""CBF-QP with learned Lie-derivative residual — rebuild of
safety_filters/cbf/cbf_nn.py (385 LoC reference).

An MLP maps the state to residual terms (a, b) entering the CBF constraint

    -alpha(h(x)) - L_f h(x, u) - a(x)'u - b(x) <= slack

(cbf_nn.py:84-147). ``learn()`` runs episodes with an uncertified controller
(blending certified/uncertified actions across episodes), computes
finite-difference barrier derivatives vs. the model's Lie derivative, and
regresses the residual with Adam on the replayed data (cbf_nn.py:310-385).

The MLP is a JAX pytree trained by optax; both the jitted CBF-QP and the
training step stay on device.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.math.networks import mlp_apply, mlp_init
from safe_control_gym_tpu.safety_filters.cbf.cbf import CBF
from safe_control_gym_tpu.safety_filters.cbf.cbf_utils import CBFBuffer

__all__ = ['CBF_NN']


class CBF_NN(CBF):
    """CBF-QP safety filter with neural Lie-derivative correction."""

    def __init__(self, env_func, slope: float = 0.1,
                 soft_constrained: bool = True, slack_weight: float = 10000.0,
                 slack_tolerance: float = 1.0e-3, max_num_steps: int = 250,
                 hidden_dims=(256, 256), learning_rate: float = 0.001,
                 num_episodes: int = 20, max_buffer_size: int = 1_000_000,
                 train_batch_size: int = 64, train_iterations: int = 200,
                 uncertified_controller=None, **kwargs):
        self.max_num_steps = int(max_num_steps)
        self.hidden_dims = list(hidden_dims)
        self.learning_rate = learning_rate
        self.num_episodes = int(num_episodes)
        self.max_buffer_size = int(max_buffer_size)
        self.train_batch_size = int(train_batch_size)
        self.train_iterations = int(train_iterations)
        self.uncertified_controller = uncertified_controller
        super().__init__(env_func, slope=slope,
                         soft_constrained=soft_constrained,
                         slack_weight=slack_weight,
                         slack_tolerance=slack_tolerance, **kwargs)
        nx, nu = self.model.nx, self.model.nu
        self.mlp_params = mlp_init(jax.random.PRNGKey(self.seed), nx, nu + 1,
                                   self.hidden_dims, orthogonal=False)
        self.opt = optax.adam(self.learning_rate)
        self.opt_state = self.opt.init(self.mlp_params)
        self.buffer = CBFBuffer(nx, nu, self.max_buffer_size,
                                self.train_batch_size)
        self._build_train_step()

    # ------------------------------------------------------------------
    def _build_train_step(self):
        nu = self.model.nu
        opt = self.opt

        def loss_fn(params, batch):
            """MSE between estimated and finite-difference barrier dot
            (cbf_nn.py:227-251)."""
            a_b = mlp_apply(params, batch['state'], 'relu')
            a = a_b[:, :nu]
            b = a_b[:, nu:nu + 1]
            h_dot_est = (batch['barrier_dot']
                         + jnp.sum(a * batch['act'], axis=-1, keepdims=True)
                         + b)
            return ((h_dot_est - batch['barrier_dot_approx']) ** 2).mean()

        @jax.jit
        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = train_step

    def _nn_terms(self, state):
        """Residual (a, b) from the MLP (extract_a_b, cbf_nn.py:206-225)."""
        a_b = mlp_apply(self.mlp_params,
                        jnp.asarray(state, jnp.float32)[None], 'relu')[0]
        return a_b[:self.model.nu], a_b[self.model.nu]

    def _nn_terms_batch(self, states):
        """Whole-batch residual terms in one MLP application (for
        certify_action_batch); current params, never trace-stale."""
        a_b = mlp_apply(self.mlp_params, jnp.asarray(states, jnp.float32),
                        'relu')
        return a_b[:, :self.model.nu], a_b[:, self.model.nu]

    # ------------------------------------------------------------------
    def learn(self, env=None, **kwargs):
        """Collect episodes + regress the residual (cbf_nn.py:310-385)."""
        if env is None:
            env = self.env
        nx, nu = self.model.nx, self.model.nu
        lie = self.get_lie_derivative()
        if self.num_episodes > 1:
            blend = np.arange(self.num_episodes) / (self.num_episodes - 1)
        else:
            blend = np.ones(1)
        for i in range(self.num_episodes):
            obs, info = env.reset()
            states = np.zeros((self.max_num_steps, nx))
            inputs = np.zeros((self.max_num_steps, nu))
            barrier_values = np.zeros((self.max_num_steps, 1))
            lie_values = np.zeros((self.max_num_steps, 1))
            counter = 0
            while counter < self.max_num_steps:
                if self.uncertified_controller is None:
                    uncertified_action = self.env.action_space.sample()
                else:
                    uncertified_action = self.uncertified_controller.select_action(obs, info)
                safe_action, _ = self.certify_action(obs[:nx],
                                                     uncertified_action)
                blended = ((1 - blend[i]) * np.atleast_1d(uncertified_action)
                           + blend[i] * np.atleast_1d(safe_action))
                obs, _, done, info = env.step(blended)
                states[counter] = obs[:nx]
                inputs[counter] = blended
                barrier_values[counter, 0] = float(self.cbf(
                    jnp.asarray(obs[:nx], jnp.float32)))
                lie_values[counter, 0] = float(lie(
                    jnp.asarray(obs[:nx], jnp.float32),
                    jnp.asarray(blended, jnp.float32)))
                counter += 1
                if done:
                    obs, info = env.reset()
            # Symmetric finite difference of the barrier (cbf_nn.py:372).
            barrier_dot_approx = ((barrier_values[2:] - barrier_values[:-2])
                                  / (2 * 1 / env.CTRL_FREQ))
            self.buffer.push({
                'state': states[1:-1], 'act': inputs[1:-1],
                'barrier_dot': lie_values[1:-1],
                'barrier_dot_approx': barrier_dot_approx})
            for _ in range(self.train_iterations):
                batch = self.buffer.sample(self.train_batch_size)
                self.mlp_params, self.opt_state, loss = self._train_step(
                    self.mlp_params, self.opt_state, batch)

    # ------------------------------------------------------------------
    def save(self, path):
        import os
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        with open(path, 'wb') as f:
            pickle.dump({'mlp': jax.tree.map(np.asarray, self.mlp_params)}, f)

    def load(self, path):
        with open(path, 'rb') as f:
            saved = pickle.load(f)
        self.mlp_params = jax.tree.map(jnp.asarray, saved['mlp'])
