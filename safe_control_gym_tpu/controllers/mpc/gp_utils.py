"""Gaussian-process machinery for GP-MPC — JAX rebuild of
controllers/mpc/gp_utils.py (1236 LoC reference).

The reference trains per-output-dim gpytorch exact GPs (zero mean, SE/Matern
ARD kernels) with Adam on the exact marginal log-likelihood and exports
CasADi kernel/prediction functions so the GP mean can enter the MPC
constraints (gp_utils.py:19-59, 218-586, 1147-1181). Here everything is one
stack of parameters:

* kernels are pure functions (``cov_se_ard`` / ``cov_matern52_ard``);
* per-dim GPs are a stacked parameter pytree trained with a single vmapped,
  jitted Adam loop (replacing the per-dim torch training loops);
* prediction is pure JAX (Cholesky solves), differentiable, and therefore
  drops straight into the SQP-based MPC — the role the CasADi export played;
* ``kmeans_centriods`` (inducing-point selection) is a small jitted Lloyd
  iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.math.linalg import full_matmul_precision

__all__ = ['cov_se_ard', 'cov_matern52_ard', 'GaussianProcess',
           'GaussianProcessCollection', 'BatchGaussianProcess',
           'kmeans_centriods']


def cov_se_ard(x1, x2, lengthscales, signal_var):
    """Squared-exponential ARD kernel (gp_utils.py:19-38)."""
    d = (x1[:, None, :] - x2[None, :, :]) / lengthscales[None, None, :]
    return signal_var * jnp.exp(-0.5 * jnp.sum(d ** 2, axis=-1))


def cov_matern52_ard(x1, x2, lengthscales, signal_var):
    """Matern 5/2 ARD kernel (gp_utils.py:41-59)."""
    d = (x1[:, None, :] - x2[None, :, :]) / lengthscales[None, None, :]
    r = jnp.sqrt(jnp.sum(d ** 2, axis=-1) + 1e-12)
    sr5 = jnp.sqrt(5.0) * r
    return signal_var * (1 + sr5 + 5.0 / 3.0 * r ** 2) * jnp.exp(-sr5)


_KERNELS = {'RBF': cov_se_ard, 'Matern': cov_matern52_ard}


def _nll(params, X, Y, kernel_fn):
    """Negative exact marginal log likelihood for one output dim."""
    ls = jnp.exp(params['log_lengthscales'])
    sv = jnp.exp(params['log_signal_var'])
    nv = jnp.exp(params['log_noise_var'])
    K = kernel_fn(X, X, ls, sv) + (nv + 1e-6) * jnp.eye(X.shape[0])
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), Y)
    return (0.5 * Y @ alpha + jnp.sum(jnp.log(jnp.diag(L)))
            + 0.5 * X.shape[0] * jnp.log(2 * jnp.pi))


class GaussianProcess:
    """Single-output exact GP (gp_utils.py:896-1181 parity)."""

    def __init__(self, input_dim, kernel='Matern', noise_prior=None):
        self.input_dim = input_dim
        self.kernel_name = kernel
        self.kernel_fn = _KERNELS[kernel]
        self.params = {
            'log_lengthscales': jnp.zeros(input_dim),
            'log_signal_var': jnp.zeros(()),
            'log_noise_var': jnp.log(jnp.asarray(0.1)),
        }
        self.X = None
        self.Y = None
        self._alpha = None
        self._K_inv = None
        # Capacity padding for online learning: padded slots carry huge
        # per-point noise so they contribute ~nothing to the posterior,
        # keeping ALL array shapes fixed while data streams in (a TPU/XLA
        # requirement — shape changes would recompile the MPC program).
        self._point_noise = None
        self._n0 = None     # first online slot
        self._ptr = None    # next online slot (ring over [_n0, capacity))

    def train(self, X, Y, n_train=500, learning_rate=0.01, verbose=False):
        """Adam on the exact MLL (gp_utils.py:998-1090 semantics, jitted)."""
        X = jnp.asarray(X, jnp.float32)
        Y = jnp.asarray(Y, jnp.float32).reshape(-1)
        kernel_fn = self.kernel_fn
        opt = optax.adam(learning_rate)

        @jax.jit
        @full_matmul_precision
        def run(params):
            state = opt.init(params)

            def body(carry, _):
                params, state = carry
                loss, g = jax.value_and_grad(_nll)(params, X, Y, kernel_fn)
                updates, state = opt.update(g, state)
                params = optax.apply_updates(params, updates)
                return (params, state), loss

            (params, _), losses = jax.lax.scan(body, (params, state), None,
                                               length=n_train)
            return params, losses

        self.params, losses = run(self.params)
        self.X, self.Y = X, Y
        self._precompute()
        return float(losses[-1])

    def _precompute(self):
        """Cache K+sigma^2I factor / inverse (gp_utils.py:956-970)."""
        ls = jnp.exp(self.params['log_lengthscales'])
        sv = jnp.exp(self.params['log_signal_var'])
        nv = jnp.exp(self.params['log_noise_var'])
        K = self.kernel_fn(self.X, self.X, ls, sv) \
            + (nv + 1e-6) * jnp.eye(self.X.shape[0])
        if self._point_noise is not None:
            K = K + jnp.diag(self._point_noise)
        L = jnp.linalg.cholesky(K)
        self._chol = L
        self._alpha = jax.scipy.linalg.cho_solve((L, True), self.Y)
        self._K_inv = jax.scipy.linalg.cho_solve((L, True),
                                                 jnp.eye(self.X.shape[0]))

    @full_matmul_precision
    def predict(self, x_star, return_pred=False):
        """Posterior mean + variance (gp_utils.py:1092-1129)."""
        x_star = jnp.atleast_2d(jnp.asarray(x_star, jnp.float32))
        ls = jnp.exp(self.params['log_lengthscales'])
        sv = jnp.exp(self.params['log_signal_var'])
        k_star = self.kernel_fn(x_star, self.X, ls, sv)
        mean = k_star @ self._alpha
        v = jax.scipy.linalg.cho_solve((self._chol, True), k_star.T)
        var = (sv - jnp.sum(k_star * v.T, axis=1))
        return np.asarray(mean), np.asarray(var)

    def make_casadi_prediction_func(self):
        """Pure mean-prediction function (the CasADi export's role,
        gp_utils.py:1147-1181): differentiable, jittable."""
        X = self.X
        alpha = self._alpha
        ls = jnp.exp(self.params['log_lengthscales'])
        sv = jnp.exp(self.params['log_signal_var'])
        kernel_fn = self.kernel_fn

        def mean_fn(z):
            k = kernel_fn(jnp.atleast_2d(z), X, ls, sv)
            return (k @ alpha)[0]

        return full_matmul_precision(mean_fn)

    def prediction_jacobian(self, z):
        """d mean / d z (gp_utils.py:1131-1145)."""
        fn = self.make_casadi_prediction_func()
        return np.asarray(jax.jacfwd(fn)(jnp.asarray(z, jnp.float32)))

    def fitc_weights(self, z_ind):
        """FITC weight vector ``w`` such that mean(z*) = K(z*, Z) @ w
        (sparse machinery role of gp_mpc.py:383-432): prediction cost drops
        from O(N) to O(M) kernel evaluations per query.

        mean(z*) = K(z*, Z) Sigma Kzx Lambda^-1 y,
        Sigma = (Kzz + Kzx Lambda^-1 Kxz)^-1,
        Lambda = diag(Kxx - Qxx) + sigma^2 I.
        """
        Z = jnp.asarray(z_ind, jnp.float32)
        ls = jnp.exp(self.params['log_lengthscales'])
        sv = jnp.exp(self.params['log_signal_var'])
        nv = jnp.exp(self.params['log_noise_var'])
        kernel_fn = self.kernel_fn
        # Long-lengthscale kernels make Kzz nearly rank-deficient in f32;
        # use eigendecomposition-based clipped inverses instead of Cholesky.
        def psd_solve(M, B, eps):
            evals, evecs = jnp.linalg.eigh(M)
            inv = jnp.where(evals > eps, 1.0 / jnp.clip(evals, eps), 0.0)
            return (evecs * inv) @ (evecs.T @ B)

        eps = 1e-5 * sv
        Kzz = kernel_fn(Z, Z, ls, sv)
        Kzx = kernel_fn(Z, self.X, ls, sv)
        V = psd_solve(Kzz, Kzx, eps)                    # Kzz^+ Kzx
        Qxx_diag = jnp.sum(Kzx * V, axis=0)
        # FITC diag correction; clip for numerical safety (Qxx can exceed
        # the prior variance by rounding).
        lam = jnp.clip(sv - Qxx_diag, 0.0, None) + nv + 1e-6
        if self._point_noise is not None:
            # Padded online slots must stay invisible to FITC too.
            lam = lam + self._point_noise
        A = Kzz + (Kzx / lam[None, :]) @ Kzx.T
        return psd_solve(A, (Kzx / lam[None, :]) @ self.Y, eps)

    def make_fitc_prediction_func(self, z_ind):
        """Pure FITC mean function built from :meth:`fitc_weights`."""
        Z = jnp.asarray(z_ind, jnp.float32)
        w = self.fitc_weights(z_ind)
        ls = jnp.exp(self.params['log_lengthscales'])
        sv = jnp.exp(self.params['log_signal_var'])
        kernel_fn = self.kernel_fn

        def mean_fn(z):
            k = kernel_fn(jnp.atleast_2d(z), Z, ls, sv)
            return (k @ w)[0]

        return mean_fn

    def pad_capacity(self, capacity: int):
        """Reserve ``capacity - N`` extra data slots for online learning.
        Padded slots hold zero inputs/targets with 1e6 point noise, so the
        posterior is numerically unchanged while every downstream array
        (X, alpha, Cholesky) keeps a fixed shape."""
        n = int(self.X.shape[0])
        if capacity <= n:
            return
        d = int(self.X.shape[1])
        self.X = jnp.concatenate(
            [self.X, jnp.zeros((capacity - n, d), jnp.float32)], axis=0)
        self.Y = jnp.concatenate(
            [self.Y, jnp.zeros((capacity - n,), jnp.float32)], axis=0)
        self._point_noise = jnp.concatenate(
            [jnp.zeros((n,), jnp.float32),
             jnp.full((capacity - n,), 1e6, jnp.float32)])
        self._n0 = n
        self._ptr = n
        self._precompute()

    def add_data(self, x_new, y_new):
        """Append observations and refresh the cached posterior factorization
        WITHOUT re-optimizing hyperparameters. This is the online-learning
        primitive GP-MPC uses per control step (the reference declares
        ``online_learning`` but errors out 'Not yet supported',
        gp_mpc.py:981-983 — here it is real). With a padded capacity the
        new rows fill reserved slots (ring buffer over the online region);
        otherwise the arrays grow."""
        x_new = jnp.atleast_2d(jnp.asarray(x_new, jnp.float32))
        y_new = jnp.atleast_1d(jnp.asarray(y_new, jnp.float32)).reshape(-1)
        if self._point_noise is None:
            self.X = jnp.concatenate([self.X, x_new], axis=0)
            self.Y = jnp.concatenate([self.Y, y_new], axis=0)
        else:
            cap = int(self.X.shape[0])
            for i in range(x_new.shape[0]):
                slot = self._ptr
                self.X = self.X.at[slot].set(x_new[i])
                self.Y = self.Y.at[slot].set(y_new[i])
                self._point_noise = self._point_noise.at[slot].set(0.0)
                self._ptr = self._ptr + 1
                if self._ptr >= cap:
                    self._ptr = self._n0
        self._precompute()

    def real_data(self):
        """(X, Y) restricted to actually-observed rows (drops padding)."""
        if self._point_noise is None:
            return self.X, self.Y
        mask = np.asarray(self._point_noise) == 0.0
        return self.X[mask], self.Y[mask]

    def state_dict(self):
        sd = {'params': jax.tree.map(np.asarray, self.params),
              'X': np.asarray(self.X), 'Y': np.asarray(self.Y)}
        if self._point_noise is not None:
            sd['point_noise'] = np.asarray(self._point_noise)
            sd['n0'] = self._n0
            sd['ptr'] = self._ptr
        return sd

    def load_state_dict(self, sd):
        self.params = jax.tree.map(jnp.asarray, sd['params'])
        self.X = jnp.asarray(sd['X'])
        self.Y = jnp.asarray(sd['Y'])
        if 'point_noise' in sd:
            self._point_noise = jnp.asarray(sd['point_noise'])
            self._n0 = sd['n0']
            self._ptr = sd['ptr']
        self._precompute()


class BatchGaussianProcess:
    """All output dims as ONE stacked parameter pytree — the TPU-native form
    of the reference's batched multitask GP stack (``BatchGPModel``,
    gp_utils.py:589-893, wrapping ``BatchIndependentMultitaskGPModel``,
    gp_utils.py:62-120: gpytorch ``batch_shape=D`` training of D independent
    GPs in one torch program).

    Every leaf of ``params`` carries a leading (D,) axis; training, posterior
    caching, and prediction are single vmapped+jitted programs, so D output
    dims cost one dispatch instead of D. With test data provided, training
    keeps the best-test-marginal-likelihood iterate per dim (the reference's
    best-model checkpointing, gp_utils.py:731-793 / :998-1090)."""

    def __init__(self, input_dim, target_dim, input_mask=None,
                 target_mask=None, kernel='Matern'):
        self.input_dim = int(input_dim)
        self.target_dim = int(target_dim)
        self.input_mask = input_mask
        self.target_mask = target_mask
        self.kernel_name = kernel
        self.kernel_fn = _KERNELS[kernel]
        D, din = self.target_dim, self.input_dim
        self.params = {
            'log_lengthscales': jnp.zeros((D, din)),
            'log_signal_var': jnp.zeros((D,)),
            'log_noise_var': jnp.full((D,), jnp.log(0.1)),
        }
        self.X = None          # (N, din) — shared across output dims
        self.Y = None          # (N, D)
        self._chol = None      # (D, N, N)
        self._alpha = None     # (D, N)

    def _apply_masks(self, X, Y=None):
        X = np.atleast_2d(np.asarray(X))
        if self.input_mask is not None:
            X = X[:, self.input_mask]
        if Y is None:
            return X
        Y = np.atleast_2d(np.asarray(Y))
        if self.target_mask is not None:
            Y = Y[:, self.target_mask]
        return X, Y

    def train(self, train_x, train_y, test_x=None, test_y=None,
              n_train=500, learning_rate=0.01, verbose=False, **kwargs):
        """One vmapped Adam loop over all D output dims (BatchGPModel.train,
        gp_utils.py:688-793). Returns the per-dim final (or best-test)
        training losses."""
        train_x, train_y = self._apply_masks(train_x, train_y)
        X = jnp.asarray(train_x, jnp.float32)
        Y = jnp.asarray(train_y, jnp.float32)
        has_test = test_x is not None and test_y is not None
        if has_test:
            test_x, test_y = self._apply_masks(test_x, test_y)
            Xt = jnp.asarray(test_x, jnp.float32)
            Yt = jnp.asarray(test_y, jnp.float32)
        kernel_fn = self.kernel_fn
        opt = optax.adam(learning_rate)

        @jax.jit
        @full_matmul_precision
        def run(params_stack):
            def one_dim(params, y, yt):
                state = opt.init(params)
                init = (params, state, params, jnp.asarray(jnp.inf))

                def body(carry, _):
                    params, state, best_p, best_l = carry
                    loss, g = jax.value_and_grad(_nll)(params, X, y,
                                                       kernel_fn)
                    updates, state = opt.update(g, state)
                    params = optax.apply_updates(params, updates)
                    # Track the iterate with the best held-out marginal
                    # likelihood (reference keeps the best-test-loss model,
                    # gp_utils.py:769-793). Without test data this carry is
                    # unused and the final iterate wins.
                    track = _nll(params, Xt, yt, kernel_fn) if has_test \
                        else loss
                    better = track < best_l
                    best_p = jax.tree.map(
                        lambda b, p: jnp.where(better, p, b), best_p, params)
                    best_l = jnp.where(better, track, best_l)
                    return (params, state, best_p, best_l), loss

                (params, _, best_p, best_l), losses = jax.lax.scan(
                    body, init, None, length=n_train)
                # Report the loss of the parameters actually returned: the
                # best held-out NLL when checkpointing on test data, else
                # the final training NLL.
                out = best_p if has_test else params
                out_l = best_l if has_test else losses[-1]
                return out, out_l

            yt_stack = Yt if has_test else Y  # same (N?,D) leading split
            return jax.vmap(one_dim, in_axes=(0, 1, 1))(
                params_stack, Y, yt_stack)

        self.params, last_losses = run(self.params)
        self.X, self.Y = X, Y
        self._precompute()
        return [float(l) for l in np.asarray(last_losses)]

    def _precompute(self):
        """Vmapped K+sigma^2 I factorization over output dims
        (_compute_GP_covariances, gp_utils.py:640-654)."""
        X, Y = self.X, self.Y
        kernel_fn = self.kernel_fn

        @full_matmul_precision
        def one_dim(params, y):
            ls = jnp.exp(params['log_lengthscales'])
            sv = jnp.exp(params['log_signal_var'])
            nv = jnp.exp(params['log_noise_var'])
            K = kernel_fn(X, X, ls, sv) + (nv + 1e-6) * jnp.eye(X.shape[0])
            L = jnp.linalg.cholesky(K)
            return L, jax.scipy.linalg.cho_solve((L, True), y)

        self._chol, self._alpha = jax.vmap(one_dim, in_axes=(0, 1))(
            self.params, Y)

    @full_matmul_precision
    def predict(self, x_star, return_pred=False):
        """Stacked posterior mean/variance, one vmapped program
        (BatchGPModel.predict, gp_utils.py:795-824). Returns
        (means (n, D), variances (n, D))."""
        x_star = self._apply_masks(x_star)
        xs = jnp.atleast_2d(jnp.asarray(x_star, jnp.float32))
        X = self.X
        kernel_fn = self.kernel_fn

        def one_dim(params, L, alpha):
            ls = jnp.exp(params['log_lengthscales'])
            sv = jnp.exp(params['log_signal_var'])
            k_star = kernel_fn(xs, X, ls, sv)
            mean = k_star @ alpha
            v = jax.scipy.linalg.cho_solve((L, True), k_star.T)
            return mean, sv - jnp.sum(k_star * v.T, axis=1)

        means, variances = jax.vmap(one_dim)(self.params, self._chol,
                                             self._alpha)
        return np.asarray(means.T), np.asarray(variances.T)

    def make_batched_predict_func(self):
        """Pure mean function z -> (D,) residual vector in one vmapped
        computation (the batched casadi_predict export's role,
        gp_utils.py:826-860)."""
        X, alpha = self.X, self._alpha
        ls = jnp.exp(self.params['log_lengthscales'])
        sv = jnp.exp(self.params['log_signal_var'])
        kernel_fn = self.kernel_fn
        input_mask = (jnp.asarray(self.input_mask, jnp.int32)
                      if self.input_mask is not None else None)

        @full_matmul_precision
        def mean_fn(z):
            zz = jnp.asarray(z, jnp.float32).reshape(-1)
            if input_mask is not None:
                zz = zz[input_mask]
            k = jax.vmap(lambda l, s: kernel_fn(zz[None], X, l, s)[0])(
                ls, sv)                                  # (D, N)
            return jnp.sum(k * alpha, axis=1)

        return mean_fn

    def state_dict(self):
        return {'params': jax.tree.map(np.asarray, self.params),
                'X': np.asarray(self.X), 'Y': np.asarray(self.Y)}

    def load_state_dict(self, sd):
        """init_with_hyperparam's role (gp_utils.py:656-686)."""
        self.params = jax.tree.map(jnp.asarray, sd['params'])
        self.X = jnp.asarray(sd['X'])
        self.Y = jnp.asarray(sd['Y'])
        self._precompute()


class GaussianProcessCollection:
    """One GP per target dim with vmapped training
    (gp_utils.py:218-586 parity)."""

    def __init__(self, model_type=None, likelihood=None, target_dim=1,
                 input_mask=None, target_mask=None, kernel='Matern',
                 **kwargs):
        self.target_dim = target_dim
        self.input_mask = input_mask
        self.target_mask = target_mask
        self.kernel_name = kernel
        self.gps = []

    def train(self, train_x, train_y, test_x=None, test_y=None,
              n_train=500, learning_rate=0.01, verbose=False,
              capacity=None, vectorized=True, **kwargs):
        """Train all per-dim GPs (gp_utils.py:328-430 semantics). With
        ``capacity`` each GP reserves padded slots for online updates.

        ``vectorized`` trains ALL output dims as one stacked parameter
        pytree under a single vmapped+jitted Adam loop — the TPU-native
        form of the reference's batched/multitask GP models
        (gp_utils.py:62-215: BatchIndependentMultitaskGPModel trains D
        independent GPs in one torch batch). One program, one dispatch,
        per-dim results identical to the sequential path."""
        train_x = np.asarray(train_x)
        train_y = np.asarray(train_y)
        if self.input_mask is not None:
            train_x = train_x[:, self.input_mask]
        if self.target_mask is not None:
            train_y = train_y[:, self.target_mask]
        D = train_y.shape[1]
        self.gps = [GaussianProcess(train_x.shape[1], kernel=self.kernel_name)
                    for _ in range(D)]
        if not vectorized:
            losses = [gp.train(train_x, train_y[:, d], n_train=n_train,
                               learning_rate=learning_rate)
                      for d, gp in enumerate(self.gps)]
        else:
            # Delegate to the batched model (masks already applied above).
            batch = BatchGaussianProcess(train_x.shape[1], D,
                                         kernel=self.kernel_name)
            if test_x is not None:
                test_x = np.asarray(test_x)
                test_y = np.asarray(test_y)
                if self.input_mask is not None:
                    test_x = test_x[:, self.input_mask]
                if self.target_mask is not None:
                    test_y = test_y[:, self.target_mask]
            losses = batch.train(train_x, train_y, test_x=test_x,
                                 test_y=test_y, n_train=n_train,
                                 learning_rate=learning_rate)
            for d, gp in enumerate(self.gps):
                gp.params = jax.tree.map(lambda x: x[d], batch.params)
                gp.X, gp.Y = batch.X, batch.Y[:, d]
                gp._precompute()
        if capacity is not None:
            for gp in self.gps:
                gp.pad_capacity(int(capacity))
        return losses

    def predict(self, x_star, return_pred=False):
        """Stacked mean/var over target dims (gp_utils.py:460-500).

        One vmapped+jitted program for ALL output dims: the per-dim loop
        was D separate eager dispatches per call — at tens of ms of
        remote-dispatch latency each, it dominated GP-MPC's per-step cost
        (measured 1.8 s/step before, with the chance-constraint
        tightening calling this every control step)."""
        x_star = np.atleast_2d(np.asarray(x_star))
        if self.input_mask is not None:
            x_star = x_star[:, self.input_mask]
        X = self.gps[0].X
        chol = jnp.stack([gp._chol for gp in self.gps])
        alpha = jnp.stack([gp._alpha for gp in self.gps])
        ls = jnp.stack([jnp.exp(gp.params['log_lengthscales'])
                        for gp in self.gps])
        sv = jnp.stack([jnp.exp(gp.params['log_signal_var'])
                        for gp in self.gps])
        means, variances = _stacked_gp_predict(
            X, chol, alpha, ls, sv,
            jnp.asarray(x_star, jnp.float32), self.gps[0].kernel_fn)
        return np.asarray(means.T), np.asarray(variances.T)

    def make_casadi_predict_func(self):
        """Stacked pure mean function z -> residual vector
        (casadi_predict, gp_mpc.py:502-507's dependency). All per-dim GPs
        share the same training inputs, so the D means are one vmapped
        kernel+dot program, not D sequential traces."""
        X = self.gps[0].X
        alphas = jnp.stack([gp._alpha for gp in self.gps])
        ls = jnp.stack([jnp.exp(gp.params['log_lengthscales'])
                        for gp in self.gps])
        sv = jnp.stack([jnp.exp(gp.params['log_signal_var'])
                        for gp in self.gps])
        kernel_fn = self.gps[0].kernel_fn

        @full_matmul_precision
        def predict(z):
            zz = jnp.atleast_2d(jnp.asarray(z, jnp.float32))
            k = jax.vmap(lambda l, s: kernel_fn(zz, X, l, s)[0])(ls, sv)
            return jnp.sum(k * alphas, axis=1)

        return predict

    def make_fitc_predict_func(self, n_ind_points, rand_state=0):
        """Stacked FITC mean function with shared kmeans inducing points
        (precompute_sparse_gp_values, gp_mpc.py:383-432); one vmapped
        program over output dims."""
        X = np.asarray(self.gps[0].real_data()[0])
        z_ind = kmeans_centriods(min(n_ind_points, X.shape[0]), X,
                                 rand_state=rand_state)
        Z = jnp.asarray(z_ind, jnp.float32)
        ws = jnp.stack([gp.fitc_weights(z_ind) for gp in self.gps])
        ls = jnp.stack([jnp.exp(gp.params['log_lengthscales'])
                        for gp in self.gps])
        sv = jnp.stack([jnp.exp(gp.params['log_signal_var'])
                        for gp in self.gps])
        kernel_fn = self.gps[0].kernel_fn

        @full_matmul_precision
        def predict(z):
            zz = jnp.atleast_2d(jnp.asarray(z, jnp.float32))
            k = jax.vmap(lambda l, s: kernel_fn(zz, Z, l, s)[0])(ls, sv)
            return jnp.sum(k * ws, axis=1)

        return predict, z_ind

    def add_data(self, inputs, targets):
        """Append a batch of (input, target) rows to every per-dim GP and
        refresh posteriors (online-learning path; masks applied as in
        ``train``)."""
        inputs = np.atleast_2d(np.asarray(inputs))
        targets = np.atleast_2d(np.asarray(targets))
        if self.input_mask is not None:
            inputs = inputs[:, self.input_mask]
        if self.target_mask is not None:
            targets = targets[:, self.target_mask]
        for d, gp in enumerate(self.gps):
            gp.add_data(inputs, targets[:, d])

    def state_dict(self):
        return [gp.state_dict() for gp in self.gps]

    def load_state_dict(self, sds):
        self.gps = []
        for sd in sds:
            gp = GaussianProcess(np.asarray(sd['X']).shape[1],
                                 kernel=self.kernel_name)
            gp.load_state_dict(sd)
            self.gps.append(gp)


@partial(jax.jit, static_argnames=('kernel_fn',))
@full_matmul_precision
def _stacked_gp_predict(X, chol, alpha, ls, sv, xs, kernel_fn):
    """Posterior mean/var for D stacked GPs sharing X, one program."""
    def one_dim(L, a, l, s):
        k = kernel_fn(xs, X, l, s)
        mean = k @ a
        v = jax.scipy.linalg.cho_solve((L, True), k.T)
        return mean, s - jnp.sum(k * v.T, axis=1)

    return jax.vmap(one_dim)(chol, alpha, ls, sv)


def lhs_sample(n_samples, lower, upper, rand_state=0):
    """Latin hypercube sampling over a box (replaces skopt's Lhs used for
    GP-MPC initial-state sampling, gp_mpc.py:704-757): one sample per
    stratum per dimension, randomly permuted."""
    lower = np.atleast_1d(np.asarray(lower, dtype=float))
    upper = np.atleast_1d(np.asarray(upper, dtype=float))
    d = lower.shape[0]
    rng = np.random.default_rng(rand_state)
    u = (rng.random((n_samples, d)) + np.arange(n_samples)[:, None]) / n_samples
    for j in range(d):
        u[:, j] = u[rng.permutation(n_samples), j]
    return lower + u * (upper - lower)


def kmeans_centriods(n_cent, data, rand_state=0, iters: int = 50):
    """Lloyd's k-means for inducing-point selection
    (gp_utils.py:1224-1236)."""
    data = jnp.asarray(data, jnp.float32)
    key = jax.random.PRNGKey(rand_state)
    idx = jax.random.choice(key, data.shape[0], (n_cent,), replace=False)
    centroids = data[idx]

    @jax.jit
    def step(centroids):
        d = jnp.sum((data[:, None, :] - centroids[None, :, :]) ** 2, -1)
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, n_cent)
        counts = one_hot.sum(0)[:, None]
        sums = one_hot.T @ data
        return jnp.where(counts > 0, sums / jnp.clip(counts, 1), centroids)

    for _ in range(iters):
        centroids = step(centroids)
    return np.asarray(centroids)
