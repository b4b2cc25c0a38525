"""GP-MPC (Hewing 2020 cautious MPC) — rebuild of
controllers/mpc/gp_mpc.py (1131 LoC reference).

A LinearMPC prior + Gaussian-process regression of the residual dynamics:

* residual targets = x_next - linear prior prediction (gp_mpc.py:264-286);
* training data gathered by running the prior (epoch 0) or the current
  GP-MPC controller, with LHS/uniform-perturbed initial states
  (gp_mpc.py:704-757, 841-923);
* per-dim GPs trained on device (gp_utils.py rebuild);
* the GP mean enters the MPC dynamics DIRECTLY — where the reference builds
  CasADi kernel expressions so IPOPT can see the GP (gp_mpc.py:223-262),
  here the GP posterior mean is a differentiable JAX function composed with
  the prior dynamics and handled by the same SQP machinery;
* covariance propagation under the LQR-feedback assumption produces
  per-step chance-constraint tightening with the inverse-CDF factor
  (precompute_probabilistic_limits, gp_mpc.py:288-362), fed into the parent
  solver's per-step tightening inputs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from safe_control_gym_tpu.controllers.mpc.gp_utils import (
    GaussianProcessCollection, kmeans_centriods)
from safe_control_gym_tpu.controllers.mpc.linear_mpc import LinearMPC
from safe_control_gym_tpu.controllers.mpc.mpc_utils import \
    discretize_linear_system

__all__ = ['GPMPC']


class GPMPC(LinearMPC):
    """MPC with Gaussian-process residual dynamics and chance constraints."""

    def __init__(self,
                 env_func,
                 horizon: int = 10,
                 q_mpc: list = [1],
                 r_mpc: list = [1],
                 warmstart: bool = True,
                 soft_constraints: bool = False,
                 constraint_tol: float = 1e-6,
                 train_iterations: int = 1,
                 optimization_iterations: int = 300,
                 learning_rate: float = 0.01,
                 normalize_training_data: bool = False,
                 prob: float = 0.955,
                 kernel: str = 'Matern',
                 input_mask: Optional[list] = None,
                 target_mask: Optional[list] = None,
                 gp_approx: str = 'mean_eq',
                 sparse_gp: bool = False,
                 n_ind_points: int = 30,
                 online_learning: bool = False,
                 num_samples: int = 200,
                 **kwargs):
        kwargs.setdefault('sqp_iters', 2)
        super().__init__(env_func, horizon=horizon, q_mpc=q_mpc, r_mpc=r_mpc,
                         warmstart=warmstart,
                         soft_constraints=soft_constraints,
                         constraint_tol=constraint_tol, **kwargs)
        self.train_iterations = int(train_iterations)
        self.optimization_iterations = int(optimization_iterations or 300)
        self.learning_rate = float(learning_rate or 0.01)
        self.normalize_training_data = normalize_training_data
        self.prob = prob
        self.gp_approx = gp_approx
        self.sparse_gp = sparse_gp
        self.n_ind_points = n_ind_points
        self.online_learning = online_learning
        self.num_samples = int(num_samples)
        nx, nu = self.model.nx, self.model.nu
        self.input_mask = (list(range(nx + nu)) if input_mask is None
                           else list(input_mask))
        self.target_mask = (list(range(nx)) if target_mask is None
                            else list(target_mask))
        self.gaussian_process = GaussianProcessCollection(
            target_dim=len(self.target_mask), input_mask=self.input_mask,
            target_mask=self.target_mask, kernel=kernel)
        self.inverse_cdf = scipy.stats.norm.ppf(
            1 - (1 / nx - (self.prob + 1) / (2 * nx)))
        self._gp_trained = False
        self.data_inputs = None
        self.data_targets = None

    # ------------------------------------------------------------------
    def preprocess_training_data(self, x_seq, u_seq, x_next_seq):
        """Residual targets = x_next - linear prior prediction
        (gp_mpc.py:264-286)."""
        x_seq = np.asarray(x_seq)
        u_seq = np.asarray(u_seq)
        x_next_seq = np.asarray(x_next_seq)
        x_pred = (self.X_EQ[None, :]
                  + (x_seq - self.X_EQ[None, :]) @ self.Ad.T
                  + (u_seq - self.U_EQ[None, :]) @ self.Bd.T)
        targets = x_next_seq - x_pred
        inputs = np.concatenate([x_seq, u_seq], axis=1)
        return inputs, targets

    def _gather_training_samples(self, env, n_samples, use_lhs=True):
        """One-step transitions from LHS-sampled initial states
        (gp_mpc.py:704-757: skopt Lhs over the init-state ranges)."""
        from safe_control_gym_tpu.controllers.mpc.gp_utils import lhs_sample
        nx, nu = self.model.nx, self.model.nu
        xs, us, xns = [], [], []
        rng = np.random.default_rng(self.seed)
        if use_lhs:
            # Stratified coverage of a moderate region of the state space.
            lo = np.maximum(np.asarray(env.state_space.low) * 0.25, -2.0)
            hi = np.minimum(np.asarray(env.state_space.high) * 0.25, 2.0)
            init_states = lhs_sample(n_samples, lo, hi,
                                     rand_state=self.seed)
        for i in range(n_samples):
            if use_lhs:
                obs, _ = env.reset()
                env._est = env._est.replace(
                    state=jnp.asarray(init_states[i], jnp.float32))
                env.state = init_states[i].astype(np.float32)
                obs = env.state
            else:
                obs, _ = env.reset()
            if self.env.NAME == 'quadrotor':
                u = rng.random(nu) / 20 - 1 / 40 + self.U_EQ
            else:
                u = env.action_space.sample()
            obs_next, _, _, _ = env.step(u)
            xs.append(np.asarray(obs)[:nx])
            us.append(np.atleast_1d(u))
            xns.append(np.asarray(obs_next)[:nx])
        return np.stack(xs), np.stack(us), np.stack(xns)

    def learn(self, env=None, **kwargs):
        """Gather data -> train GPs -> rebuild the GP-dynamics optimizer
        (gp_mpc.py:841-923)."""
        if env is None:
            env = self.env_func(randomized_init=True, init_state=None,
                                cost='quadratic',
                                normalized_rl_action_space=False)
        for epoch in range(max(1, self.train_iterations)):
            x_seq, u_seq, x_next_seq = self._gather_training_samples(
                env, self.num_samples)
            inputs, targets = self.preprocess_training_data(
                x_seq, u_seq, x_next_seq)
            if self.data_inputs is None:
                self.data_inputs, self.data_targets = inputs, targets
            else:
                self.data_inputs = np.vstack([self.data_inputs, inputs])
                self.data_targets = np.vstack([self.data_targets, targets])
            self.train_gp()
        env.close()

    def train_gp(self, **kwargs):
        """Fit per-dim GPs + compile GP dynamics (gp_mpc.py:678-839)."""
        self.gaussian_process.train(self.data_inputs, self.data_targets,
                                    n_train=self.optimization_iterations,
                                    learning_rate=self.learning_rate)
        self._gp_trained = True
        self.set_gp_dynamics_func()
        self.setup_optimizer(self.solver)
        self.reset_before_run()

    def set_gp_dynamics_func(self):
        """Compose prior linear dynamics with the GP residual mean
        (set_gp_dynamics_func, gp_mpc.py:210-262). With ``sparse_gp`` the
        FITC approximation over kmeans inducing points replaces the exact
        posterior (gp_mpc.py:383-432)."""
        if self.sparse_gp:
            gp_mean, self.z_ind = self.gaussian_process.make_fitc_predict_func(
                self.n_ind_points, rand_state=self.seed)
        else:
            gp_mean = self.gaussian_process.make_casadi_predict_func()
        Ad = jnp.asarray(self.Ad, jnp.float32)
        Bd = jnp.asarray(self.Bd, jnp.float32)
        X_EQ = jnp.asarray(self.X_EQ, jnp.float32)
        U_EQ = jnp.asarray(self.U_EQ, jnp.float32)
        input_mask = jnp.asarray(self.input_mask, jnp.int32)
        target_mask = jnp.asarray(self.target_mask, jnp.int32)
        nx = self.model.nx

        def gp_dynamics(x, u):
            prior = X_EQ + Ad @ (x - X_EQ) + Bd @ (u - U_EQ)
            z = jnp.concatenate([x, u])[input_mask]
            resid = gp_mean(z)
            return prior + jnp.zeros(nx).at[target_mask].set(resid)

        self.dynamics_func = gp_dynamics

    # ------------------------------------------------------------------
    def _constraint_tightening(self, step):
        """Chance-constraint tightening from propagated GP covariance
        (precompute_probabilistic_limits, gp_mpc.py:288-362)."""
        T = self.T
        ms, mu = self._ms, self._mu
        tight_s = np.zeros((T + 1, ms), np.float32)
        tight_u = np.zeros((T, mu), np.float32)
        if not self._gp_trained or self.x_prev is None:
            return jnp.asarray(tight_s), jnp.asarray(tight_u)
        nx, nu = self.model.nx, self.model.nu
        K = np.asarray(self.lqr_gain)  # u = K x convention (negative fb)
        A_cl = self.Ad + self.Bd @ K
        # GP predictive variance along the previous trajectory.
        z_prev = np.concatenate([self.x_prev[:, :-1].T,
                                 np.atleast_2d(self.u_prev).reshape(nu, T).T],
                                axis=1)[:, self.input_mask]
        _, gp_var = self.gaussian_process.predict(z_prev)  # (T, n_targets)
        cov_x = np.zeros((nx, nx))
        state_cons = self.constraints.state_constraints
        input_cons = self.constraints.input_constraints
        for k in range(T):
            # Input tightening via the LQR feedback covariance.
            cov_u = K @ cov_x @ K.T
            su = np.sqrt(np.clip(np.diag(cov_u), 0, None))
            sx = np.sqrt(np.clip(np.diag(cov_x), 0, None))
            ofs_u = 0
            for con in input_cons:
                rows = np.abs(con.A) @ np.concatenate([su])
                tight_u[k, ofs_u:ofs_u + con.num_constraints] = \
                    self.inverse_cdf * rows
                ofs_u += con.num_constraints
            ofs_s = 0
            for con in state_cons:
                rows = np.abs(con.A) @ sx
                tight_s[k, ofs_s:ofs_s + con.num_constraints] = \
                    self.inverse_cdf * rows
                ofs_s += con.num_constraints
            # Propagate: Sigma+ = A_cl Sigma A_cl' + Sigma_gp.
            cov_d = np.zeros((nx, nx))
            cov_d[np.ix_(self.target_mask, self.target_mask)] = np.diag(
                np.clip(gp_var[min(k, gp_var.shape[0] - 1)], 0, None))
            cov_x = A_cl @ cov_x @ A_cl.T + cov_d
        sx = np.sqrt(np.clip(np.diag(cov_x), 0, None))
        ofs_s = 0
        for con in state_cons:
            rows = np.abs(con.A) @ sx
            tight_s[T, ofs_s:ofs_s + con.num_constraints] = \
                self.inverse_cdf * rows
            ofs_s += con.num_constraints
        return jnp.asarray(tight_s), jnp.asarray(tight_u)

    # ------------------------------------------------------------------
    def reset(self):
        self.set_dynamics_func()
        if self._gp_trained:
            self.set_gp_dynamics_func()
        self.setup_optimizer(self.solver)
        self.reset_before_run()

    def save(self, path):
        import os
        import pickle
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        with open(path, 'wb') as f:
            pickle.dump({'gps': self.gaussian_process.state_dict(),
                         'data_inputs': self.data_inputs,
                         'data_targets': self.data_targets}, f)

    def load(self, path):
        import pickle
        with open(path, 'rb') as f:
            sd = pickle.load(f)
        self.gaussian_process.load_state_dict(sd['gps'])
        self.data_inputs = sd.get('data_inputs')
        self.data_targets = sd.get('data_targets')
        self._gp_trained = True
        self.set_gp_dynamics_func()
        self.setup_optimizer(self.solver)
        self.reset_before_run()
