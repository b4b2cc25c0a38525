"""Shared off-policy RL machinery (SAC/DDPG): an on-device replay buffer.

The reference's SACBuffer/DDPGBuffer (sac_utils.py:301-419) are host numpy
ring buffers; here the buffer is a pytree of preallocated device arrays with
a write pointer, so rollout-collection, insertion, and minibatch sampling all
stay inside jitted scans — no host<->device traffic in the training loop.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ['ReplayState', 'replay_init', 'replay_push', 'replay_sample']


@struct.dataclass
class ReplayState:
    data: Dict[str, jax.Array]   # each (max_size, dim)
    ptr: jax.Array               # i32 next write index
    count: jax.Array             # i32 total pushed (can exceed max_size)


def replay_init(specs: Dict[str, int], max_size: int) -> ReplayState:
    """specs: name -> feature dim."""
    data = {k: jnp.zeros((max_size, d), jnp.float32) for k, d in specs.items()}
    return ReplayState(data=data, ptr=jnp.zeros((), jnp.int32),
                       count=jnp.zeros((), jnp.int32))


def replay_push(state: ReplayState, batch: Dict[str, jax.Array]) -> ReplayState:
    """Insert N rows (ring semantics) — jittable scatter."""
    n = next(iter(batch.values())).shape[0]
    max_size = next(iter(state.data.values())).shape[0]
    idx = (state.ptr + jnp.arange(n)) % max_size
    data = {k: v.at[idx].set(batch[k].reshape(n, -1).astype(jnp.float32))
            for k, v in state.data.items()}
    return ReplayState(data=data, ptr=(state.ptr + n) % max_size,
                       count=state.count + n)


def replay_sample(state: ReplayState, key: jax.Array, batch_size: int
                  ) -> Dict[str, jax.Array]:
    """Uniform sample over the filled portion."""
    max_size = next(iter(state.data.values())).shape[0]
    filled = jnp.minimum(state.count, max_size)
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(filled, 1))
    return {k: v[idx] for k, v in state.data.items()}
