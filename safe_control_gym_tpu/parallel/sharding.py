"""Multi-chip scaling — the TPU-native replacement for the reference's
process-level parallelism (SubprocVecEnv pipes, subproc_vec_env.py:20-251).

The reference's complete parallelism inventory is environment
data-parallelism over worker processes (SURVEY §2.9). On TPU the same axis —
the env batch — is sharded over a ``jax.sharding.Mesh`` of chips: env states
live distributed, every chip steps its shard inside the same jitted program,
and learner reductions (gradient means) become XLA ``psum`` collectives over
ICI. No pipes, no pickling, no NCCL: one SPMD program.

Helpers:
* ``make_env_mesh(n)`` — 1-D mesh over the env/data axis;
* ``shard_env_batch`` — place a batched EnvState pytree on the mesh;
* ``make_sharded_env_step`` — jit the vmapped step with in/out shardings;
* ``make_dp_train_step`` — wrap a (params, batch) -> (params, metrics)
  update into a data-parallel step with replicated params and psum-averaged
  gradients (XLA inserts the collective from the shardings).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_env_mesh', 'shard_env_batch', 'make_sharded_env_step',
           'replicate', 'make_dp_train_step', 'make_dp_tp_mesh',
           'mlp_tp_shardings', 'actor_critic_tp_shardings']


def make_env_mesh(n_devices: Optional[int] = None,
                  axis_name: str = 'env') -> Mesh:
    """1-D device mesh over the env/data axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def shard_env_batch(mesh: Mesh, states, axis_name: str = 'env'):
    """Place a batched EnvState pytree with the batch dim sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(states, jax.tree.map(lambda _: sharding, states))


def replicate(mesh: Mesh, pytree):
    """Replicate parameters on every chip."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(pytree, jax.tree.map(lambda _: sharding, pytree))


def make_sharded_env_step(mesh: Mesh, func_env, axis_name: str = 'env'):
    """Jit the vmapped env step with batch-sharded in/out shardings.

    Returns (reset_fn(keys), step_fn(states, actions)); both run as SPMD
    programs over the mesh — each chip simulates its own shard of envs with
    zero cross-chip traffic (embarrassingly parallel hot loop).
    """
    batch_sh = NamedSharding(mesh, P(axis_name))
    step_v = jax.vmap(func_env.step)
    reset_v = jax.vmap(func_env.reset)

    def _tree_sh(tree_example):
        return jax.tree.map(lambda _: batch_sh, tree_example)

    reset_jit = jax.jit(reset_v, out_shardings=None)

    step_jit = jax.jit(step_v)

    def reset_fn(keys):
        states, obs = reset_jit(keys)
        return shard_env_batch(mesh, states, axis_name), jax.device_put(
            obs, batch_sh)

    def step_fn(states, actions):
        return step_jit(states, jax.device_put(actions, batch_sh))

    return reset_fn, step_fn


def make_dp_tp_mesh(n_model: int = 2, n_devices: Optional[int] = None,
                    env_axis: str = 'env', model_axis: str = 'model') -> Mesh:
    """2-D mesh factoring the chips into data ('env') x tensor ('model')
    axes — the standard dp x tp grid of the scaling playbook. Lay the model
    axis innermost so its collectives ride the fastest ICI links."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % n_model == 0, (n, n_model)
    grid = np.array(devices).reshape(n // n_model, n_model)
    return Mesh(grid, axis_names=(env_axis, model_axis))


def mlp_tp_shardings(mesh: Mesh, params, model_axis: str = 'model'):
    """Megatron-style tensor-parallel shardings for an ``mlp_init`` param
    list (math/networks.py): alternate column- and row-partitioned weight
    matrices over ``model_axis``, so an activation leaves a column-sharded
    layer 'model'-sharded on features, flows through the elementwise
    nonlinearity chip-local, and is reduced back (one psum, inserted by
    XLA from the shardings) in the following row-sharded layer. Biases of
    column-sharded layers are sharded with their features; biases of
    row-sharded layers are replicated (added after the reduction). The
    final (output) layer joins the alternation so hidden layers stay
    distributed end to end.

    Returns a pytree of ``NamedSharding`` with the exact structure of
    ``params`` — usable for ``jax.device_put`` on the params and, via
    ``optax.tree_map_params``, on optimizer states.
    """
    col = NamedSharding(mesh, P(None, model_axis))
    row = NamedSharding(mesh, P(model_axis, None))
    repl = NamedSharding(mesh, P())
    vec = NamedSharding(mesh, P(model_axis))
    n_shards = mesh.shape[model_axis]
    out = []
    feat_sharded = False  # whether this layer's INPUT activations are sharded
    for layer in params:
        in_dim, out_dim = layer['w'].shape
        if feat_sharded:
            # Row-parallel: consumes sharded features, psum-reduces output.
            out.append({'w': row, 'b': repl})
            feat_sharded = False
        elif out_dim % n_shards == 0 and out_dim >= n_shards:
            # Column-parallel: produces sharded features.
            out.append({'w': col, 'b': vec})
            feat_sharded = True
        else:
            # Output too small/indivisible to split (e.g. nu=1 heads).
            out.append({'w': repl, 'b': repl})
    return out


def actor_critic_tp_shardings(mesh: Mesh, params, model_axis: str = 'model'):
    """Tensor-parallel shardings for the PPO/SafePPO/RARL actor-critic
    param dict ``{'actor': [...], 'critic': [...], ('logstd')}`` — each MLP
    megatron-partitioned, scalars/vectors without a feature axis
    replicated."""
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in params.items():
        if isinstance(v, (list, tuple)):
            out[k] = type(v)(mlp_tp_shardings(mesh, v, model_axis))
        else:
            out[k] = repl
    return out


def make_dp_train_step(mesh: Mesh, update_fn: Callable,
                       axis_name: str = 'env'):
    """Data-parallel training step: params replicated, batch sharded.

    ``update_fn(params, batch) -> (params, metrics)`` written as if on one
    device; the mean-over-batch gradients inside it become cross-chip psum
    collectives automatically because XLA propagates the shardings.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))

    @jax.jit
    def step(params, batch):
        return update_fn(params, batch)

    def run(params, batch):
        params = replicate(mesh, params)
        batch = jax.tree.map(lambda x: jax.device_put(x, batch_sh), batch)
        with mesh:
            return step(params, batch)

    return run
