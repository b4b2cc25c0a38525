"""MPSC utilities — TPU-native rebuild of safety_filters/mpsc/mpsc_utils.py.

The reference computes the ellipsoidal RPI set by solving a log-det LMI with
cvxpy + MOSEK (mpsc_utils.py:21-61). Here the same S-procedure feasibility
problem

    max log det P  s.t.  [[A'PA - tau P, A'P w_i], [w_i'PA, w_i'P w_i + tau - 1]] <= 0

is solved on device: P is parameterized by its Cholesky factor (PSD by
construction), the semidefinite constraints enter as a hinge penalty on the
max eigenvalue of each (nx+1)x(nx+1) block (vmapped ``eigh``), and Adam
minimizes ``-logdet P + mu * sum hinge``; a final bisection on a scalar
shrink factor certifies exact feasibility of all sampled constraints.

Polytope machinery (pytope) is replaced by exact AABB Pontryagin differences
and scipy's qhull for vertex->halfspace conversion of learned terminal sets.
"""

from __future__ import annotations

from enum import Enum
from functools import partial
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.envs.benchmark_env import Task
from safe_control_gym_tpu.math.linalg import full_matmul_precision
from safe_control_gym_tpu.envs.constraints import (BoundedConstraint,
                                                   LinearConstraint)

__all__ = ['Cost_Function', 'compute_RPI_set', 'ellipse_bounding_box',
           'pontryagin_difference_AABB', 'get_trajectory_on_horizon',
           'vertices_to_halfspaces']


class Cost_Function(str, Enum):
    """MPSC cost functions (mpsc_utils.py:15-18)."""
    ONE_STEP_COST = 'one_step_cost'


def _lmi_blocks(P, Acl, w):
    """The (nx+1)x(nx+1) S-procedure block for each residual w_i."""
    tauP = _lmi_blocks.tau * P
    APA = Acl.T @ P @ Acl
    APw = Acl.T @ P @ w
    wPw = w @ P @ w
    top = jnp.concatenate([APA - tauP, APw[:, None]], axis=1)
    bot = jnp.concatenate([APw[None, :], (wPw + _lmi_blocks.tau - 1.0)[None, None]],
                          axis=1)
    return jnp.concatenate([top, bot], axis=0)


def compute_RPI_set(Acl, w, tau, iters: int = 3000, lr: float = 5e-2,
                    penalty: float = 100.0, seed: int = 0):
    """Robust positively invariant ellipsoid P (mpsc_utils.py:21-61 parity).

    Args:
        Acl: closed-loop A+BK (nx, nx).
        w: residual samples (nx, n_samples).
        tau: S-procedure coefficient (~0.95).

    Returns:
        P (ndarray): ellipse matrix with x'Px <= 1 robust invariant.

    Preconditioning: the LMI is exactly congruence-invariant under a state
    rescaling x~ = Dx (P = D P~ D maps every S-procedure block by
    diag(D,1)(.)diag(D,1)), but the *solvers* — isotropic descent init,
    identity-Q Lyapunov fallback — are not. State dims of a quadrotor span
    4+ orders of magnitude in minimal-tube size, which cost a 30-5000x
    volume overshoot before scaling. D is built from a cheap certified
    over-approximation of the minimal-RPI AABB: half-width_i =
    sum_k |e_i' Acl^k| r (support functions of the box residual hull).
    """
    Acl64 = np.asarray(Acl, np.float64)
    W64 = np.asarray(w, np.float64).T               # (n_samples, nx)
    nx = Acl64.shape[0]
    r = np.abs(W64).max(axis=0)                     # per-dim residual bound
    hw = np.zeros(nx)
    Ak = np.eye(nx)
    for _ in range(5000):
        hw += np.abs(Ak) @ r
        Ak = Ak @ Acl64
        if np.abs(Ak).max() < 1e-12:
            break
    hw = np.maximum(hw, max(float(hw.max()), 1e-12) * 1e-6)
    D = 1.0 / hw                                    # diag scaling
    Acl_s = (D[:, None] * Acl64) / D[None, :]       # D A D^-1
    W_s = W64 * D[None, :]                          # rows (Dw)'

    Acl = jnp.asarray(Acl_s, jnp.float32)
    W = jnp.asarray(W_s, jnp.float32)
    _lmi_blocks.tau = float(tau)

    def constraint_eigs(P):
        blocks = jax.vmap(lambda wi: _lmi_blocks(P, Acl, wi))(W)
        evals = jnp.linalg.eigvalsh(blocks)
        return evals[:, -1]  # max eigenvalue per block

    def loss_fn(L_flat):
        L = jnp.tril(L_flat)
        P = L @ L.T + 1e-8 * jnp.eye(nx)
        sign, logdet = jnp.linalg.slogdet(P)
        viol = jnp.clip(constraint_eigs(P), 0.0, None)
        return -logdet + penalty * jnp.sum(viol ** 2) + penalty * jnp.sum(viol)

    # Init from the certified Lyapunov ellipse when one exists (strictly
    # feasible start: the descent then only grows log-det while the penalty
    # stays ~0); otherwise mid-scale identity from residual magnitudes.
    P_lyap = _lyapunov_rpi(Acl_s, W_s, float(tau))
    if P_lyap is not None:
        L0 = jnp.asarray(np.linalg.cholesky(P_lyap), jnp.float32)
    else:
        w_scale = float(jnp.abs(W).max()) + 1e-6
        L0 = jnp.eye(nx) * (0.3 / w_scale)
    opt = optax.adam(lr)

    @jax.jit
    @full_matmul_precision
    def run(L0):
        state = opt.init(L0)

        def body(carry, _):
            L, state = carry
            loss, g = jax.value_and_grad(loss_fn)(L)
            updates, state = opt.update(g, state)
            L = optax.apply_updates(L, updates)
            return (L, state), loss

        (L, _), losses = jax.lax.scan(body, (L0, state), None, length=iters)
        return L, losses

    L, _ = run(L0)
    L = jnp.tril(L)
    P = np.asarray(L @ L.T)

    # Certify: shrink P (grow the ellipse) makes invariance easier w.r.t.
    # trajectories but containment harder; instead bisection on scale s in
    # [1e-3, 1] applied as s*P, accepting the largest s (tightest set given
    # shape) with all constraints satisfied; then fall back to smaller.
    eig_fn = jax.jit(lambda Pm: jnp.max(constraint_eigs(jnp.asarray(Pm, jnp.float32))))
    P_desc = None
    if float(eig_fn(P)) <= 1e-6:
        P_desc = P
    else:
        # Scale search: find s such that s*P satisfies the LMIs.
        for s in np.geomspace(1.0, 1e-3, 25):
            if float(eig_fn(P * s)) <= 1e-6:
                P_desc = P * s
                break
    # Keep the tighter (larger log-det => smaller ellipse) certified set of
    # {descent result, Lyapunov fallback}. Scaling cannot rescue a shape
    # violating the contraction condition A'PA ≼ tau*P, so the fallback is
    # what guarantees a certificate whenever Acl is strictly stable.
    def unscale(P_s):
        # P = D P~ D maps the scaled-space certificate back (congruence).
        return (D[:, None] * np.asarray(P_s, np.float64)) * D[None, :]

    candidates = [c for c in (P_desc, P_lyap) if c is not None]
    if candidates:
        return unscale(max(candidates,
                           key=lambda c: np.linalg.slogdet(c)[1]))
    print('[WARNING] compute_RPI_set: could not certify the RPI set; '
          'returning best-effort P.')
    return unscale(P)


def _lyapunov_rpi(Acl, W, tau):
    """Certified (conservative) RPI ellipse via a discrete Lyapunov
    equation — the guaranteed fallback behind the log-det descent.

    For any S-procedure coefficient tau_c in (rho(Acl)^2, 1), the solution
    of ``Acl' P Acl - tau_c P = -I`` makes the top-left LMI block exactly
    ``-s I`` under scaling ``s P``; the Schur complement of the full
    (nx+1)-block then reduces to the closed form
    ``s * (w'Pw + |Acl'Pw|^2) <= 1 - tau_c`` per residual sample, so the
    largest certified containment scale is analytic. Replaces the MOSEK
    LMI feasibility fallback role of the reference (mpsc_utils.py:21-61).

    Args:
        Acl: (nx, nx) closed-loop map (float64).
        W: (n_samples, nx) residual samples.
        tau: configured S-procedure coefficient (used when valid).

    Returns:
        P (ndarray) certified, or None if Acl is not strictly stable.
    """
    rho = float(np.max(np.abs(np.linalg.eigvals(Acl))))
    if rho >= 0.9995:
        return None
    nx = Acl.shape[0]

    def solve(tau_c):
        M = Acl / np.sqrt(tau_c)
        # P = sum_k (M')^k (I/tau_c) M^k by doubling.
        P = np.eye(nx) / tau_c
        Mk = M.copy()
        for _ in range(64):
            P = P + Mk.T @ P @ Mk
            Mk = Mk @ Mk
            if np.abs(Mk).max() < 1e-14:
                break
        # Analytic containment scale over all residual samples.
        PW = W @ P                                       # rows w'P
        quad = np.sum(PW * W, axis=1)                    # w'Pw
        cross = np.sum((PW @ Acl) ** 2, axis=1)          # |Acl'Pw|^2
        denom = float(np.max(quad + cross))
        return P if denom <= 0 else P * ((1.0 - tau_c) / denom)

    # Any tau_c in (rho^2, 1) certifies; the volume of the resulting tube
    # varies by orders of magnitude across that interval (tau_c -> rho^2
    # blows up the Lyapunov series, tau_c -> 1 kills the containment
    # scale). Grid-search the tightest set; include the configured tau
    # when it is valid.
    lo = rho ** 2 + 1e-4
    grid = list(np.linspace(lo, 0.9995, 12))
    if tau > rho ** 2:
        grid.append(tau)
    best, best_logdet = None, -np.inf
    for tau_c in grid:
        P = solve(min(float(tau_c), 0.9995))
        logdet = np.linalg.slogdet(P)[1]
        if np.isfinite(logdet) and logdet > best_logdet:
            best, best_logdet = P, logdet
    return best


def ellipse_bounding_box(P):
    """AABB vertices of the ellipse x'Px <= 1 (mpsc_utils.py:64-80)."""
    P = np.asarray(P)
    c = np.eye(P.shape[0])
    Pinv = np.linalg.inv(P)
    extremes = []
    for i in range(P.shape[0]):
        e = np.sqrt(c[:, i, None].T @ Pinv @ c[:, i, None])[0, 0]
        extremes.append((e, -e))
    return np.vstack(list(product(*extremes)))


def pontryagin_difference_AABB(verts1, verts2):
    """Exact AABB Pontryagin difference verts1 (-) verts2
    (mpsc_utils.py:83-120 semantics; exact box formula
    lower' = l1 - l2, upper' = u1 - u2, which reduces to the reference's
    symmetric-set shortcut when verts2 is centered)."""
    verts1 = np.asarray(verts1, dtype=float)
    verts2 = np.asarray(verts2, dtype=float)
    if verts1.ndim == 1:
        verts1 = verts1[:, None]
    if verts2.ndim == 1:
        verts2 = verts2[:, None]
    l1, u1 = verts1.min(axis=0), verts1.max(axis=0)
    l2, u2 = verts2.min(axis=0), verts2.max(axis=0)
    lower = l1 - l2
    upper = u1 - u2
    if np.any(upper < lower):
        print('Warning: Tightened set is the Zero set.')
        lower = np.zeros_like(lower)
        upper = np.zeros_like(upper)
    if verts1.shape[1] > 1:
        verts = np.vstack(list(product(*zip(upper, lower))))
        const_func = partial(BoundedConstraint, lower_bounds=lower,
                             upper_bounds=upper)
        return verts, const_func
    const_func = partial(BoundedConstraint, lower_bounds=lower,
                         upper_bounds=upper)
    return np.vstack((lower, upper)), const_func


def vertices_to_halfspaces(vertices):
    """V-rep -> H-rep (A, b) via scipy qhull — replaces pytope."""
    from scipy.spatial import ConvexHull
    hull = ConvexHull(np.asarray(vertices), qhull_options='QJ')
    # hull.equations: [A | -b] with A x + b0 <= 0 -> A x <= -b0.
    A = hull.equations[:, :-1]
    b = -hull.equations[:, -1]
    return A, b


def get_trajectory_on_horizon(env, iteration, horizon):
    """Next-horizon reference slice, padded with the final state
    (mpsc_utils.py:123-144)."""
    if env.TASK == Task.TRAJ_TRACKING:
        iteration = int(iteration)
        wp_idx = [min(iteration + i, env.X_GOAL.shape[0] - 1)
                  for i in range(horizon)]
        return env.X_GOAL[wp_idx]
    return env.X_GOAL
