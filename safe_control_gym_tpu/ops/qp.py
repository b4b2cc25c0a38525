"""On-device quadratic programming — the TPU-native replacement for the
reference's host C++ solvers (IPOPT / qpOASES / qrsqp via CasADi Opti,
mpc.py:170-246; HPIPM via acados, mpc_acados.py:164-175).

OSQP-style ADMM over the general form

    min 0.5 z'Pz + q'z   s.t.  l <= Az <= u

with a single dense Cholesky factorization of the quasi-definite KKT proxy
``P + sigma I + rho A'A`` reused across all iterations. Everything is
shape-static and jittable: MPC problems (a few hundred variables) factor in
microseconds on the MXU, batch under ``vmap`` (batched CBF-QPs, multi-env
MPC), and differentiate under ``jax.grad`` if needed.

Equality rows are expressed as l == u. Fixed iteration count keeps the
computation compilable; warm starting (z, y carried across control steps)
gives OSQP-like effective accuracy for receding-horizon use.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ['QPSolution', 'admm_qp', 'make_qp_solver']


class QPSolution(NamedTuple):
    x: jax.Array          # primal solution
    z: jax.Array          # slack (Ax projected)
    y: jax.Array          # dual
    prim_res: jax.Array   # final primal residual ||Ax - z||_inf
    dual_res: jax.Array   # final dual residual


def admm_qp(P: jax.Array, q: jax.Array, A: jax.Array, l: jax.Array,
            u: jax.Array, x0: Optional[jax.Array] = None,
            y0: Optional[jax.Array] = None, rho: float = 0.1,
            sigma: float = 1e-6, alpha: float = 1.6,
            iters: int = 200, tol: Optional[float] = None,
            polish: bool = False) -> QPSolution:
    """Solve the QP with staged ADMM (OSQP algorithm 1).

    All arrays dense; returns a :class:`QPSolution`. ``rho`` is scaled per
    row: equality rows (l == u) get 1e3 x rho, the standard OSQP heuristic.

    ``iters`` is an upper bound: with ``tol`` set, stages stop early once
    the (equilibrated) primal residual < tol and dual residual < 10*tol —
    a bounded ``lax.while_loop``, so the program stays compilable while
    hard problems (e.g. heavy slack penalties on infeasible starts) can be
    given a large budget without slowing the easy ones.

    ``polish`` runs an OSQP-style active-set polish after ADMM: one exact
    LU solve of the KKT system restricted to the detected active rows,
    accepted only when it improves BOTH residuals. ADMM reaches
    feasibility fast but its optimality tail is slow on ill-conditioned
    long-horizon MPC programs (measured: a horizon-20 12-state tube QP
    needed 30k iterations for an accurate action; polished, 2k suffice) —
    the polish makes solution QUALITY independent of that tail.

    TPU note: the body runs under full-f32 matmul precision. The MXU's
    default bfloat16 inputs stall ADMM at ~1e-1 primal residual (each
    A@x / KKT product injects ~1e-2 relative error, larger than the
    per-iteration contraction); 'highest' restores CPU-identical
    convergence at a modest MXU cost on these tiny matrices.
    """
    with jax.default_matmul_precision('highest'):
        return _admm_qp_body(P, q, A, l, u, x0, y0, rho, sigma, alpha,
                             iters, tol, polish)


def _polish_kkt(P, q, A, l, u, x, sigma, eps_act):
    """Exact active-set KKT solve (OSQP polish, all shapes static).

    Active rows are detected from proximity of Ax to its bounds; inactive
    rows are zeroed out of the saddle system and given a unit dual diagonal
    so their multipliers come out exactly 0. One LU + one iterative-
    refinement pass in the equilibrated scaling (all entries O(1))."""
    n, m = P.shape[0], A.shape[0]
    Ax = A @ x
    act_l = jnp.isfinite(l) & ((Ax - l) < eps_act)
    act_u = jnp.isfinite(u) & ((u - Ax) < eps_act)
    act = jnp.logical_or(act_l, act_u)
    a = act.astype(P.dtype)
    b = jnp.where(act_u, u, jnp.where(act_l, l, 0.0)) * a
    A_eff = A * a[:, None]
    M = jnp.block([
        [P + sigma * jnp.eye(n), A_eff.T],
        [A_eff, -jnp.diag(jnp.where(act, 1e-7, 1.0))]])
    rhs = jnp.concatenate([-q, b])
    lu = jax.scipy.linalg.lu_factor(M)
    sol = jax.scipy.linalg.lu_solve(lu, rhs)
    sol = sol + jax.scipy.linalg.lu_solve(lu, rhs - M @ sol)
    return sol[:n], sol[n:]


def _admm_qp_body(P, q, A, l, u, x0, y0, rho, sigma, alpha, iters,
                  tol=None, polish=False):
    n = P.shape[0]
    m = A.shape[0]
    x = jnp.zeros(n) if x0 is None else x0
    y = jnp.zeros(m) if y0 is None else y0

    # Ruiz equilibration (rows AND columns): badly-scaled constraint rows
    # (RPI-ellipsoid gradients ~1e5) or cost columns (slack penalties ~1e4)
    # destroy ADMM convergence. Iteratively normalize to unit inf-norm;
    # primal/dual are rescaled transparently on entry/exit.
    c = jnp.ones(n)   # column scaling (primal)
    d = jnp.ones(m)   # row scaling (dual)
    Ps, As = P, A
    for _ in range(3):
        col_norm = jnp.maximum(jnp.max(jnp.abs(Ps), axis=0),
                               jnp.max(jnp.abs(As), axis=0))
        dc = 1.0 / jnp.sqrt(jnp.clip(col_norm, 1e-8, None))
        Ps = Ps * dc[None, :] * dc[:, None]
        As = As * dc[None, :]
        c = c * dc
        row_norm = jnp.max(jnp.abs(As), axis=1)
        dr = 1.0 / jnp.clip(row_norm, 1e-8, None)
        As = As * dr[:, None]
        d = d * dr
    P = Ps
    A = As
    q = q * c
    l = jnp.where(jnp.isfinite(l), l * d, l)
    u = jnp.where(jnp.isfinite(u), u * d, u)
    x = x / c
    y = y / d
    z = jnp.clip(A @ x, l, u)

    eq_mask = (u - l) < 1e-9

    # Staged ADMM with OSQP-style rho adaptation: problems whose optimal
    # duals are large (e.g. heavy slack penalties) need rho to grow with the
    # residual ratio, otherwise y converges at O(rho) per iteration. Each
    # stage refactors the (small) KKT matrix with the updated rho.
    n_stages = 10
    tol_j = jnp.asarray(0.0 if tol is None else float(tol), jnp.float32)

    def stage_once(x, z, y, rho_s, stage_iters):
        rho_vec = jnp.where(eq_mask, rho_s * 1e3, rho_s)
        K = P + sigma * jnp.eye(n) + (A.T * rho_vec) @ A
        K = 0.5 * (K + K.T)
        # Explicit inverse instead of per-iteration cho_solve: the two
        # triangular solves per iteration are SEQUENTIAL n-step chains
        # (measured: the batched solver runs at ~9 GFLOP/s, bound by
        # those chains — tools/mfu_bench.py), while `Kinv @ rhs` is one
        # (B, n, n) x (B, n) MXU contraction under vmap. The chains now
        # run once per STAGE (inversion) instead of once per iteration.
        # One Newton-Schulz step squares the inverse's residual
        # (O((kappa*eps)^2) — K is equilibrated + sigma-regularized), and
        # the active-set polish below remains the final-accuracy
        # mechanism either way.
        chol = jax.scipy.linalg.cho_factor(K)
        Kinv = jax.scipy.linalg.cho_solve(chol, jnp.eye(n, dtype=P.dtype))
        Kinv = Kinv + Kinv @ (jnp.eye(n, dtype=P.dtype) - K @ Kinv)

        def body(_, carry):
            x, z, y = carry
            rhs = sigma * x - q + A.T @ (rho_vec * z - y)
            x_new = Kinv @ rhs
            Ax = A @ x_new
            Ax_relaxed = alpha * Ax + (1 - alpha) * z
            z_new = jnp.clip(Ax_relaxed + y / rho_vec, l, u)
            y_new = y + rho_vec * (Ax_relaxed - z_new)
            return x_new, z_new, y_new

        x, z, y = jax.lax.fori_loop(0, stage_iters, body, (x, z, y))
        Ax = A @ x
        pr = jnp.max(jnp.abs(Ax - z)) + 1e-12
        dr = jnp.max(jnp.abs(P @ x + q + A.T @ y)) + 1e-12
        scale = jnp.clip(jnp.sqrt(pr / dr), 0.2, 5.0)
        rho_next = jnp.clip(rho_s * scale, 1e-4, 1e4)
        # Feasibility-style residual (violation of [l, u]) for early exit,
        # matching the final reported prim_res.
        pr_exit = jnp.max(jnp.abs(Ax - jnp.clip(Ax, l, u)))
        return x, z, y, rho_next, pr_exit, dr

    if tol is None:
        # Fixed uniform stages under scan: reverse-mode differentiable.
        stage_iters = max(iters // n_stages, 1)

        def stage(carry, _):
            x, z, y, rho_s = carry
            x, z, y, rho_next, _pr, _dr = stage_once(x, z, y, rho_s,
                                                     stage_iters)
            return (x, z, y, rho_next), None

        (x, z, y, _), _ = jax.lax.scan(
            stage, (x, z, y, jnp.asarray(rho, jnp.float32)), None,
            length=n_stages)
    else:
        # Early-exit bounded while_loop (forward-only) over GEOMETRICALLY
        # GROWING stages: easy problems pay only the tiny early stages;
        # hard ones spend most of the budget in late stages where rho has
        # adapted. Sizes sum to ``iters``.
        desc, rem = [], iters
        for k in range(n_stages - 1):
            half = max(rem // 2, 4)
            desc.append(half)
            rem = max(rem - half, 1)
        desc.append(max(rem, 1))
        sizes = jnp.asarray(desc[::-1], jnp.int32)   # ascending

        def cond(carry):
            _x, _z, _y, _rho, k, pr, dr = carry
            not_conv = jnp.logical_or(pr > tol_j, dr > 10.0 * tol_j)
            return jnp.logical_and(k < n_stages, not_conv)

        def body(carry):
            x, z, y, rho_s, k, _pr, _dr = carry
            x, z, y, rho_next, pr, dr = stage_once(x, z, y, rho_s, sizes[k])
            return (x, z, y, rho_next, k + 1, pr, dr)

        inf = jnp.asarray(jnp.inf, jnp.float32)
        (x, z, y, _, _, _, _) = jax.lax.while_loop(
            cond, body,
            (x, z, y, jnp.asarray(rho, jnp.float32), jnp.asarray(0),
             inf, inf))
    Ax = A @ x
    # Residual in the equilibrated scaling: scale-free feasibility measure
    # (a unit-norm-row violation of eps means eps relative error regardless
    # of the original row magnitudes).
    prim_res = jnp.max(jnp.abs(Ax - jnp.clip(Ax, l, u)))
    dual_res = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    if polish:
        # Ladder of active-set margins: at marginal ADMM convergence a
        # single adaptive margin either misses active rows (polish
        # infeasible) or over-flags them (polish over-constrained); try a
        # few and keep the best accepted candidate. All margins polish the
        # SAME ADMM iterate, so the three KKT factorizations are
        # independent — they run as ONE batched LU (vmap) instead of three
        # sequential ones (each LU is ~10 ms of pure latency on the v5e at
        # MPC sizes; the batched form pays one). The acceptance chain then
        # folds sequentially over the candidates, preserving the original
        # semantics: each candidate must improve on the residuals of the
        # best iterate ACCEPTED SO FAR.
        eps_ladder = jnp.stack([jnp.asarray(1e-4, P.dtype),
                                jnp.asarray(1e-3, P.dtype),
                                jnp.maximum(1e-4, 5.0 * prim_res)])
        xs_p, ys_p = jax.vmap(
            lambda e: _polish_kkt(P, q, A, l, u, x, sigma, e))(eps_ladder)
        Axs_p = xs_p @ A.T
        prs_p = jnp.max(jnp.abs(Axs_p - jnp.clip(Axs_p, l, u)), axis=1)
        drs_p = jnp.max(jnp.abs(xs_p @ P.T + q + ys_p @ A), axis=1)
        for i in range(eps_ladder.shape[0]):
            # Accept only an improvement on both residuals (missed active
            # rows make the polish infeasible -> rejected, iterate kept).
            ok = jnp.logical_and(prs_p[i] <= jnp.maximum(prim_res, 1e-6),
                                 drs_p[i] <= dual_res)
            x = jnp.where(ok, xs_p[i], x)
            y = jnp.where(ok, ys_p[i], y)
            z = jnp.where(ok, jnp.clip(Axs_p[i], l, u), z)
            prim_res = jnp.where(ok, prs_p[i], prim_res)
            dual_res = jnp.where(ok, drs_p[i], dual_res)
    return QPSolution(x=x * c, z=z, y=y * d, prim_res=prim_res,
                      dual_res=dual_res)


def make_qp_solver(iters: int = 200, rho: float = 0.1, sigma: float = 1e-6,
                   alpha: float = 1.6):
    """Returns a jit-ready closure ``solve(P, q, A, l, u, x0, y0)``."""
    def solve(P, q, A, l, u, x0=None, y0=None):
        return admm_qp(P, q, A, l, u, x0=x0, y0=y0, rho=rho, sigma=sigma,
                       alpha=alpha, iters=iters)
    return solve
