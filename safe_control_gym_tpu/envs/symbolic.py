"""Analytic (prior) model — JAX-autodiff replacement for the CasADi
``SymbolicModel`` (reference math_and_models/symbolic_systems.py:6-121).

This is the contract between environments and every model-based controller:
each env exposes ``env.symbolic`` carrying its own dynamics, observation
model, quadratic cost, Jacobians, and cost derivatives. In the reference
these are CasADi computation graphs; here they are plain JAX functions with
``jax.jacfwd``/``jax.hessian`` providing the linearizations, so everything a
controller builds from them (Riccati solves, SQP subproblems, iLQR backward
passes) stays jittable end-to-end and runs on TPU.

API parity (names and call conventions follow symbolic_systems.py so that
ported controller logic reads the same):

* ``fc_func(x, u)`` -> x_dot                      (symbolic_systems.py:68)
* ``fd_func(x, u)`` -> x_next over dt             (:70-73, cvodes -> RK4)
* ``g_func(x, u)`` -> y                           (:75)
* ``df_func(x, u)`` -> {'dfdx', 'dfdu'}           (:80-84)
* ``dg_func(x, u)`` -> {'dgdx', 'dgdu'}           (:85-89)
* ``fc_linear_func(x_eval, u_eval, x, u)``        (:91-104)
* ``fd_linear_func(x_eval, u_eval, x, u)``
* ``loss(x, u, Xr, Ur, Q, R)`` -> {'l','l_x','l_xx','l_u','l_uu','l_xu'} (:112-121)

plus cached ``X_EQ``/``U_EQ`` and prior parameter values (params dict,
:43-48).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from safe_control_gym_tpu.envs.dynamics import rk4_step

__all__ = ['AnalyticModel']


_KWARG_ALIASES = {'x0': 'x', 'p': 'u'}  # cs.integrator call style (x0=, p=)


def _positional_or_kw(fn, names):
    """Wrap fn(*arrays) so it also accepts the reference's kwargs style
    (including the CasADi-integrator aliases fd_func(x0=..., p=...))."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if kwargs:
            kwargs = {_KWARG_ALIASES.get(k, k): v for k, v in kwargs.items()}
            args = args + tuple(jnp.atleast_1d(jnp.asarray(kwargs[n], dtype=jnp.float32).squeeze())
                                for n in names[len(args):])
        else:
            args = tuple(jnp.atleast_1d(jnp.asarray(a, dtype=jnp.float32).squeeze()) for a in args)
        return fn(*args)
    return wrapper


class AnalyticModel:
    """Differentiable prior model of a system: dynamics + cost + Jacobians."""

    def __init__(self,
                 dyn_fn: Callable,
                 nx: int,
                 nu: int,
                 dt: float,
                 obs_fn: Optional[Callable] = None,
                 params: Optional[Dict[str, Any]] = None,
                 integration_algo: str = 'rk4',
                 integration_substeps: int = 1):
        """
        Args:
            dyn_fn: continuous dynamics ``f(x, u) -> x_dot`` with parameters
                already bound (pure JAX function of two arrays).
            nx/nu: state/input dims. dt: control timestep.
            obs_fn: observation ``g(x, u) -> y``; identity-on-state if None.
            params: cached prior properties (incl. X_EQ / U_EQ), splatted
                into attributes like the reference (symbolic_systems.py:43-48).
            integration_algo: 'rk4' (default) or 'euler'.
            integration_substeps: inner steps per dt for fd_func accuracy.
        """
        self.nx, self.nu = nx, nu
        self.dt = float(dt)
        self.integration_algo = integration_algo
        self._dyn = dyn_fn
        self._obs = obs_fn if obs_fn is not None else (lambda x, u: x)
        self.ny = nx if obs_fn is None else int(jnp.shape(
            obs_fn(jnp.zeros(nx), jnp.zeros(nu)))[0])
        self.params = dict(params or {})
        for name, param in self.params.items():
            assert name not in self.__dict__
            setattr(self, name, param)

        sub = max(1, int(integration_substeps))
        h = self.dt / sub

        def _fc(x, u):
            return dyn_fn(x, u)

        def _fd(x, u):
            def body(carry, _):
                if integration_algo == 'euler':
                    nxt = carry + h * dyn_fn(carry, u)
                else:
                    nxt = rk4_step(lambda s, a, _p: dyn_fn(s, a), carry, u, h, None)
                return nxt, None
            out, _ = jax.lax.scan(body, x, None, length=sub)
            return out

        def _g(x, u):
            return self._obs(x, u)

        def _df(x, u):
            return {'dfdx': jax.jacfwd(_fc, argnums=0)(x, u),
                    'dfdu': jax.jacfwd(_fc, argnums=1)(x, u)}

        def _dg(x, u):
            return {'dgdx': jax.jacfwd(_g, argnums=0)(x, u),
                    'dgdu': jax.jacfwd(_g, argnums=1)(x, u)}

        def _fc_linear(x_eval, u_eval, x, u):
            d = _df(x, u)
            return _fc(x, u) + d['dfdx'] @ (x_eval - x) + d['dfdu'] @ (u_eval - u)

        def _fd_linear(x_eval, u_eval, x, u):
            # Integrate the frozen linearization over dt (RK4 on the affine ODE).
            def lin_dyn(s, _a, _p):
                return _fc_linear(s, u_eval, x, u)
            def body(carry, _):
                return rk4_step(lin_dyn, carry, u_eval, h, None), None
            out, _ = jax.lax.scan(body, x_eval, None, length=sub)
            return out

        def _quad_cost(x, u, Xr, Ur, Q, R):
            dx = x - Xr
            du = u - Ur
            return 0.5 * dx @ Q @ dx + 0.5 * du @ R @ du

        def _loss(x, u, Xr, Ur, Q, R):
            args = (x, u, Xr, Ur, Q, R)
            l = _quad_cost(*args)
            l_x = jax.grad(_quad_cost, argnums=0)(*args)
            l_u = jax.grad(_quad_cost, argnums=1)(*args)
            l_xx = jax.hessian(_quad_cost, argnums=0)(*args)
            l_uu = jax.hessian(_quad_cost, argnums=1)(*args)
            l_xu = jax.jacfwd(jax.grad(_quad_cost, argnums=0), argnums=1)(*args)
            return {'l': l, 'l_x': l_x, 'l_xx': l_xx, 'l_u': l_u,
                    'l_uu': l_uu, 'l_xu': l_xu}

        # Public API — jitted; positional or reference-style kwargs.
        self.fc_func = _positional_or_kw(jax.jit(_fc), ['x', 'u'])
        self.fd_func = _positional_or_kw(jax.jit(_fd), ['x', 'u'])
        self.g_func = _positional_or_kw(jax.jit(_g), ['x', 'u'])
        self.df_func = _positional_or_kw(jax.jit(_df), ['x', 'u'])
        self.dg_func = _positional_or_kw(jax.jit(_dg), ['x', 'u'])
        self.fc_linear_func = _positional_or_kw(
            jax.jit(_fc_linear), ['x_eval', 'u_eval', 'x', 'u'])
        self.fd_linear_func = _positional_or_kw(
            jax.jit(_fd_linear), ['x_eval', 'u_eval', 'x', 'u'])

        jitted_loss = jax.jit(_loss)

        def loss(*args, **kwargs):
            names = ['x', 'u', 'Xr', 'Ur', 'Q', 'R']
            if kwargs:
                vals = list(args)
                for n in names[len(args):]:
                    vals.append(kwargs[n])
            else:
                vals = list(args)
            x, u, Xr, Ur, Q, R = [jnp.asarray(v, dtype=jnp.float32) for v in vals]
            x, u, Xr, Ur = (jnp.atleast_1d(x.squeeze()), jnp.atleast_1d(u.squeeze()),
                            jnp.atleast_1d(Xr.squeeze()), jnp.atleast_1d(Ur.squeeze()))
            Q = jnp.atleast_2d(Q)
            R = jnp.atleast_2d(R)
            return jitted_loss(x, u, Xr, Ur, Q, R)

        self.loss = loss

        # Raw (unwrapped, strictly positional) functions for controllers that
        # compose them under their own jit/vmap/scan.
        self.fc_fn = _fc
        self.fd_fn = _fd
        self.g_fn = _g
        self.df_fn = _df
        self.loss_fn = _loss
