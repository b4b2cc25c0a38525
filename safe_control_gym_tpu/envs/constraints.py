"""Constraint framework — JAX rebuild of envs/constraints.py.

Same ``g(x) <= 0`` semantics and class taxonomy as the reference
(constraints.py:13-665): Quadratic / Linear / Bounded / Default /
SymmetricState constraints over STATE, INPUT, or INPUT_AND_STATE variables,
with ``active_dims`` filter matrices, ``strict`` violation, ``tolerance`` /
``is_almost_active``, and a ``ConstraintList`` aggregator.

Differences from the reference, by design:

* every ``sym_func`` is a pure JAX function, so the whole stacked constraint
  evaluation folds into the env's jitted step (no per-step Python/CasADi
  round-trip, cf. benchmark_env.py:447-502), and the same function is what
  MPC/MPSC/CBF differentiate via autodiff;
* constraints are constructed from explicit dims/spaces rather than a live
  env object, making them usable inside vmapped functional envs. An ``env``
  argument with ``state_dim``/``action_dim``/(``state_space``/
  ``physical_action_bounds``) attributes is still accepted for parity.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    'ConstrainedVariableType', 'Constraint', 'QuadraticConstraint',
    'LinearConstraint', 'BoundedConstraint', 'DefaultConstraint',
    'SymmetricStateConstraint', 'ConstraintList', 'GENERAL_CONSTRAINTS',
    'create_constraint_list', 'get_symbolic_constraint_models',
]


class ConstrainedVariableType(str, Enum):
    """Allowable constraint variable types (constraints.py:13-18)."""
    STATE = 'state'
    INPUT = 'input'
    INPUT_AND_STATE = 'input_and_state'


class Constraint:
    """Base constraint g(x) <= 0 (constraints.py:21-178)."""

    def __init__(self, env, constrained_variable, strict=False,
                 active_dims=None, tolerance=None, decimals=8, **kwargs):
        self.constrained_variable = ConstrainedVariableType(constrained_variable)
        if self.constrained_variable == ConstrainedVariableType.STATE:
            self.dim = env.state_dim
        elif self.constrained_variable == ConstrainedVariableType.INPUT:
            self.dim = env.action_dim
        else:
            self.dim = env.state_dim + env.action_dim
        self.strict = strict
        self.decimals = decimals
        if active_dims is not None:
            if isinstance(active_dims, int):
                active_dims = [active_dims]
            assert len(active_dims) <= self.dim
            assert all(int(n) < self.dim for n in active_dims)
            assert len(active_dims) == len(set(active_dims))
            self.constraint_filter = np.eye(self.dim)[[int(n) for n in active_dims]]
            self.dim = len(active_dims)
        else:
            self.constraint_filter = np.eye(self.dim)
        self.tolerance = np.array(tolerance, ndmin=1) if tolerance is not None else None

    def reset(self):
        pass

    def get_symbolic_model(self):
        """The pure function g(x) (constraints.py:121-128 analog)."""
        return self.sym_func

    def _round(self, v):
        scale = 10.0 ** self.decimals
        return jnp.round(v * scale) / scale

    def get_env_constraint_var(self, env):
        """Pull the constrained variable off a (stateful) env
        (constraints.py:155-173)."""
        if self.constrained_variable == ConstrainedVariableType.STATE:
            return env.state
        if self.constrained_variable == ConstrainedVariableType.INPUT:
            return env.current_noisy_physical_action
        return (env.state, env.current_noisy_physical_action)

    def value_from(self, state, inp):
        """Pure evaluation from explicit (state, input) arrays — the path
        used inside jitted env steps."""
        if self.constrained_variable == ConstrainedVariableType.STATE:
            var = state
        elif self.constrained_variable == ConstrainedVariableType.INPUT:
            var = inp
        else:
            var = jnp.concatenate([state, inp])
        return self._round(jnp.atleast_1d(jnp.squeeze(self.sym_func(var))))

    def get_value(self, env):
        var = self.get_env_constraint_var(env)
        if isinstance(var, tuple):
            var = jnp.concatenate([jnp.atleast_1d(jnp.asarray(v)) for v in var])
        else:
            var = jnp.atleast_1d(jnp.asarray(var))
        return np.asarray(self._round(jnp.atleast_1d(jnp.squeeze(self.sym_func(var)))))

    def is_violated(self, env, c_value=None):
        if c_value is None:
            c_value = self.get_value(env)
        if self.strict:
            return bool(np.any(np.greater_equal(np.asarray(c_value), 0.0)))
        return bool(np.any(np.greater(np.asarray(c_value), 0.0)))

    def is_almost_active(self, env, c_value=None):
        if self.tolerance is None:
            return False
        if c_value is None:
            c_value = self.get_value(env)
        return bool(np.any(np.greater(np.asarray(c_value) + self.tolerance, 0.0)))

    def check_tolerance_shape(self):
        if self.tolerance is not None and len(self.tolerance) != self.num_constraints:
            raise ValueError('[ERROR] tolerance dim != num_constraints.')


class QuadraticConstraint(Constraint):
    """x' P x <= b (constraints.py:181-231)."""

    def __init__(self, env, P, b, constrained_variable, strict=False,
                 active_dims=None, tolerance=None, decimals=8):
        super().__init__(env, constrained_variable, strict=strict,
                         active_dims=active_dims, tolerance=tolerance,
                         decimals=decimals)
        P = np.array(P, ndmin=2)
        assert P.shape == (self.dim, self.dim)
        self.P = P
        self.b = float(b)
        self.num_constraints = 1
        F = jnp.asarray(self.constraint_filter, dtype=jnp.float32)
        Pj = jnp.asarray(P, dtype=jnp.float32)
        self.sym_func = lambda x: x.T @ F.T @ Pj @ F @ x - self.b
        self.check_tolerance_shape()


class LinearConstraint(Constraint):
    """A x <= b (constraints.py:234-283)."""

    def __init__(self, env, A, b, constrained_variable, strict=False,
                 active_dims=None, tolerance=None, decimals=8):
        super().__init__(env, constrained_variable, strict=strict,
                         active_dims=active_dims, tolerance=tolerance,
                         decimals=decimals)
        A = np.asarray(A, dtype=np.float32).reshape(-1, self.dim)
        b = np.asarray(b, dtype=np.float32).reshape(-1)
        assert b.shape[0] == A.shape[0]
        self.A = A
        self.b = b
        self.num_constraints = A.shape[0]
        Aj = jnp.asarray(A)
        bj = jnp.asarray(b)
        F = jnp.asarray(self.constraint_filter, dtype=jnp.float32)
        self.sym_func = lambda x: Aj @ F @ x - bj
        self.check_tolerance_shape()


class BoundedConstraint(LinearConstraint):
    """lb <= x <= ub as stacked linear constraints (constraints.py:286-329)."""

    def __init__(self, env, lower_bounds, upper_bounds, constrained_variable,
                 strict=False, active_dims=None, tolerance=None, decimals=8):
        self.lower_bounds = np.array(lower_bounds, ndmin=1)
        self.upper_bounds = np.array(upper_bounds, ndmin=1)
        dim = self.lower_bounds.shape[0]
        A = np.vstack((-np.eye(dim), np.eye(dim)))
        b = np.hstack((-self.lower_bounds, self.upper_bounds))
        super().__init__(env, A, b, constrained_variable, strict=strict,
                         active_dims=active_dims, tolerance=tolerance,
                         decimals=decimals)
        self.check_tolerance_shape()


class DefaultConstraint(BoundedConstraint):
    """Bounds from the env's state space / physical action bounds
    (constraints.py:332-397)."""

    def __init__(self, env, constrained_variable, lower_bounds=None,
                 upper_bounds=None, strict=False, tolerance=None, decimals=8):
        constrained_variable = ConstrainedVariableType(constrained_variable)
        if constrained_variable == ConstrainedVariableType.STATE:
            if hasattr(env, 'state_space'):
                lo, hi = env.state_space.low, env.state_space.high
            else:
                lo, hi = env.observation_space.low, env.observation_space.high
        elif constrained_variable == ConstrainedVariableType.INPUT:
            lo, hi = env.physical_action_bounds
        else:
            raise NotImplementedError(
                '[ERROR] DefaultConstraint can only be STATE or INPUT.')
        if upper_bounds is None:
            upper_bounds = np.asarray(hi)
        else:
            upper_bounds = np.array(upper_bounds, ndmin=1)
            assert len(upper_bounds) == len(np.atleast_1d(hi))
        if lower_bounds is None:
            lower_bounds = np.asarray(lo)
        else:
            lower_bounds = np.array(lower_bounds, ndmin=1)
            assert len(lower_bounds) == len(np.atleast_1d(lo))
        super().__init__(env, lower_bounds.astype(np.float64),
                         upper_bounds.astype(np.float64), constrained_variable,
                         strict=strict, active_dims=None, tolerance=tolerance,
                         decimals=decimals)


class SymmetricStateConstraint(BoundedConstraint):
    """|x| <= b, cartpole/safe-explorer specific (constraints.py:400-455)."""

    def __init__(self, env, constrained_variable, bound, strict=False,
                 active_dims=None, tolerance=None, decimals=8, **kwargs):
        assert bound is not None
        self.bound = np.array(bound, ndmin=1)
        super().__init__(env, lower_bounds=-self.bound, upper_bounds=self.bound,
                         constrained_variable=constrained_variable,
                         strict=strict, active_dims=active_dims,
                         tolerance=tolerance, decimals=decimals)
        self.num_constraints = self.bound.shape[0]
        F = jnp.asarray(self.constraint_filter, dtype=jnp.float32)
        bj = jnp.asarray(self.bound, dtype=jnp.float32)
        self.sym_func = lambda x: jnp.abs(F @ x) - bj

    def value_from(self, state, inp):
        return self._round(jnp.atleast_1d(jnp.squeeze(self.sym_func(state))))

    def get_value(self, env):
        return np.asarray(self._round(
            jnp.abs(jnp.asarray(self.constraint_filter) @ jnp.asarray(env.state))
            - jnp.asarray(self.bound)))

    def check_tolerance_shape(self):
        if self.tolerance is not None and len(self.tolerance) != len(self.bound):
            raise ValueError('[ERROR] tolerance dim != num constraints.')


class ConstraintList:
    """Collection of constraints with stacked evaluation
    (constraints.py:458-636)."""

    def __init__(self, constraints: Sequence[Constraint]):
        self.constraints = list(constraints)
        self.constraint_lengths = [con.num_constraints for con in self.constraints]
        self.constraint_indices = np.cumsum([0] + self.constraint_lengths)
        self.num_constraints = int(sum(self.constraint_lengths))
        self.state_constraints = [
            c for c in self.constraints
            if c.constrained_variable == ConstrainedVariableType.STATE]
        self.num_state_constraints = sum(c.num_constraints for c in self.state_constraints)
        self.input_constraints = [
            c for c in self.constraints
            if c.constrained_variable == ConstrainedVariableType.INPUT]
        self.num_input_constraints = sum(c.num_constraints for c in self.input_constraints)
        self.input_state_constraints = [
            c for c in self.constraints
            if c.constrained_variable == ConstrainedVariableType.INPUT_AND_STATE]
        self.num_input_state_constraints = sum(
            c.num_constraints for c in self.input_state_constraints)

    def __len__(self):
        return len(self.constraints)

    def get_all_symbolic_models(self):
        return [con.get_symbolic_model() for con in self.constraints]

    def get_state_constraint_symbolic_models(self):
        return [con.get_symbolic_model() for con in self.state_constraints]

    def get_input_constraint_symbolic_models(self):
        return [con.get_symbolic_model() for con in self.input_constraints]

    def values_from(self, state, inp):
        """Pure stacked evaluation — jit/vmap-safe (used in env step)."""
        if not self.constraints:
            return jnp.zeros((0,), dtype=jnp.float32)
        return jnp.concatenate(
            [con.value_from(state, inp) for con in self.constraints])

    def get_values(self, env, only_state=False):
        if only_state:
            return np.concatenate(
                [np.atleast_1d(con.get_value(env)) for con in self.state_constraints]
            ) if self.state_constraints else np.zeros(0)
        if not self.constraints:
            return np.zeros(0)
        return np.concatenate([np.atleast_1d(con.get_value(env))
                               for con in self.constraints])

    def _split(self, c_value):
        return [np.asarray(c_value)[self.constraint_indices[i]:self.constraint_indices[i + 1]]
                for i in range(len(self.constraints))]

    def is_violated(self, env, c_value=None):
        if c_value is not None:
            return any(con.is_violated(env, c_value=cv)
                       for con, cv in zip(self.constraints, self._split(c_value)))
        return any(con.is_violated(env) for con in self.constraints)

    def violated_mask(self, c_value):
        """Pure per-step violation flag from a stacked value array."""
        if not self.constraints:
            return jnp.zeros((), dtype=bool)
        flags = []
        i = 0
        for con in self.constraints:
            cv = c_value[i:i + con.num_constraints]
            flags.append(jnp.any(cv >= 0.0) if con.strict else jnp.any(cv > 0.0))
            i += con.num_constraints
        return jnp.any(jnp.stack(flags))

    def is_almost_active(self, env, c_value=None):
        if c_value is not None:
            return any(con.is_almost_active(env, c_value=cv)
                       for con, cv in zip(self.constraints, self._split(c_value)))
        return any(con.is_almost_active(env) for con in self.constraints)


GENERAL_CONSTRAINTS = {
    'linear_constraint': LinearConstraint,
    'quadratic_constraint': QuadraticConstraint,
    'bounded_constraint': BoundedConstraint,
    'default_constraint': DefaultConstraint,
}


def create_constraint_list(constraint_specs: Sequence[Dict[str, Any]],
                           available_constraints: Dict[str, Any], env
                           ) -> Optional[ConstraintList]:
    """Create a ConstraintList from YAML spec dicts
    (constraints.py:647-665)."""
    constraint_list = []
    for constraint in constraint_specs:
        assert isinstance(constraint, dict), '[ERROR]: Each constraint must be a dict.'
        assert 'constraint_form' in constraint, \
            '[ERROR]: Each constraint must have a constraint_form.'
        con_form = constraint['constraint_form']
        assert con_form in available_constraints, '[ERROR]: Unknown constraint form.'
        con_class = available_constraints[con_form]
        cfg = {k: v for k, v in constraint.items() if k != 'constraint_form'}
        constraint_list.append(con_class(env, **cfg))
    return ConstraintList(constraint_list)


def get_symbolic_constraint_models(constraint_list: ConstraintList):
    """List of pure constraint functions (constraints.py:639-644 analog)."""
    return constraint_list.get_all_symbolic_models()
