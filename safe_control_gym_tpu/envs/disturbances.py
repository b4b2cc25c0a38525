"""Disturbance framework — functional JAX rebuild of envs/disturbances.py.

The reference applies additive disturbances to three channels (observation /
action / dynamics) via stateful objects drawing from ``env.np_random``
(disturbances.py:6-303). Here each disturbance spec from YAML is compiled at
env-construction time into a pair of pure functions:

* ``init(key) -> dstate``  — samples per-episode parameters (e.g. the random
  ``step_offset`` of impulse/step disturbances, disturbances.py:99-107);
* ``apply(target, dstate, ctrl_step, t, key) -> target'`` — adds the noise
  for the current step (pure; fresh PRNG key per call).

``DisturbanceList`` composes them sequentially (disturbances.py:38-67). All
compiled functions are jit/vmap-safe: per-episode state lives in a flat array
pytree threaded through the env state, and randomness comes from explicit
keys instead of a shared numpy generator.

Supported types (DISTURBANCE_TYPES, disturbances.py:277-282): impulse, step,
uniform, white_noise, periodic.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'DisturbanceSpec', 'ImpulseDisturbance', 'StepDisturbance',
    'UniformNoise', 'WhiteNoise', 'PeriodicNoise', 'DisturbanceList',
    'DISTURBANCE_TYPES', 'create_disturbance_list',
]


def _as_vec(v, dim, name):
    if isinstance(v, (int, float)):
        return np.full(dim, float(v), dtype=np.float32)
    arr = np.asarray(v, dtype=np.float32).ravel()
    if arr.size == 1:
        return np.full(dim, float(arr[0]), dtype=np.float32)
    assert arr.size == dim, f'{name} shape should match dim {dim}.'
    return arr


class DisturbanceSpec:
    """Base disturbance: identity with optional mask (disturbances.py:6-35)."""

    #: number of f32 slots of per-episode state this spec needs.
    state_size = 0
    #: number of i.i.d. random slots this spec consumes PER STEP. Every
    #: supported type is either stateless-with-noise (uniform/white/periodic)
    #: or stateful-without-noise (impulse/step), so the batched hot loop can
    #: pre-draw all per-step randomness in ONE (batch, noise_size) kernel
    #: instead of per-env key splits (see ``draw``/``apply_drawn``).
    noise_size = 0

    def __init__(self, dim: int, mask=None, **kwargs):
        self.dim = dim
        self.mask = None if mask is None else np.asarray(mask, dtype=np.float32)
        if self.mask is not None:
            assert self.dim == len(self.mask)

    def _masked(self, noise):
        if self.mask is not None:
            return noise * jnp.asarray(self.mask)
        return noise

    def init(self, key: jax.Array) -> jax.Array:
        return jnp.zeros((self.state_size,), dtype=jnp.float32)

    def apply(self, target, dstate, ctrl_step, t, key):
        return target

    def draw(self, key, prefix=()):
        """Pre-draw this spec's per-step randomness with shape
        ``prefix + (noise_size,)`` — one fused kernel for a whole batch."""
        return jnp.zeros(tuple(prefix) + (0,), dtype=jnp.float32)

    def apply_drawn(self, target, dstate, ctrl_step, t, drawn):
        """``apply`` with pre-drawn randomness (same distribution as the
        keyed path). Default delegates with key=None — valid ONLY for
        specs whose apply never consumes the key (noise_size == 0, e.g.
        impulse/step); any spec with per-step randomness MUST declare
        noise_size and override draw/apply_drawn (see WhiteNoise)."""
        return self.apply(target, dstate, ctrl_step, t, None)


class ImpulseDisturbance(DisturbanceSpec):
    """Square/triangle pulse around a (possibly random) step offset
    (disturbances.py:70-123)."""

    state_size = 1

    def __init__(self, dim, mask=None, magnitude=1, step_offset=None,
                 duration=1, decay_rate=1, max_step=100, **kwargs):
        super().__init__(dim, mask)
        assert duration >= 1
        assert 0 < decay_rate <= 1
        self.magnitude = float(magnitude)
        self.step_offset = step_offset
        self.duration = float(duration)
        self.decay_rate = float(decay_rate)
        self.max_step = int(max_step)

    def init(self, key):
        if self.step_offset is None:
            off = jax.random.randint(key, (), 0, self.max_step)
        else:
            off = jnp.asarray(self.step_offset, dtype=jnp.int32)
        return jnp.asarray(off, dtype=jnp.float32)[None]

    def apply(self, target, dstate, ctrl_step, t, key):
        offset = dstate[0]
        peak_step = jnp.floor(offset + self.duration / 2)
        peak_offset = jnp.abs(ctrl_step - peak_step)
        decay = jnp.where(peak_offset < self.duration / 2,
                          self.decay_rate ** peak_offset, 0.0)
        active = (ctrl_step >= offset).astype(jnp.float32)
        noise = self.magnitude * decay * active
        return target + self._masked(noise)


class StepDisturbance(DisturbanceSpec):
    """Constant bias after a (possibly random) offset (disturbances.py:126-163)."""

    state_size = 1

    def __init__(self, dim, mask=None, magnitude=1, step_offset=None,
                 max_step=100, **kwargs):
        super().__init__(dim, mask)
        self.magnitude = float(magnitude)
        self.step_offset = step_offset
        self.max_step = int(max_step)

    def init(self, key):
        if self.step_offset is None:
            off = jax.random.randint(key, (), 0, self.max_step)
        else:
            off = jnp.asarray(self.step_offset, dtype=jnp.int32)
        return jnp.asarray(off, dtype=jnp.float32)[None]

    def apply(self, target, dstate, ctrl_step, t, key):
        active = (ctrl_step >= dstate[0]).astype(jnp.float32)
        noise = self.magnitude * active
        return target + self._masked(noise)


class UniformNoise(DisturbanceSpec):
    """i.i.d. U(low, high) noise per step (disturbances.py:166-192)."""

    def __init__(self, dim, mask=None, low=0.0, high=1.0, **kwargs):
        super().__init__(dim, mask)
        self.low = _as_vec(low, dim, 'low')
        self.high = _as_vec(high, dim, 'high')
        self.noise_size = dim

    def apply(self, target, dstate, ctrl_step, t, key):
        noise = jax.random.uniform(key, (self.dim,),
                                   minval=jnp.asarray(self.low),
                                   maxval=jnp.asarray(self.high))
        return target + self._masked(noise)

    def draw(self, key, prefix=()):
        return jax.random.uniform(key, tuple(prefix) + (self.dim,),
                                  minval=jnp.asarray(self.low),
                                  maxval=jnp.asarray(self.high))

    def apply_drawn(self, target, dstate, ctrl_step, t, drawn):
        return target + self._masked(drawn)


class WhiteNoise(DisturbanceSpec):
    """i.i.d. N(0, std) noise per step (disturbances.py:195-223)."""

    def __init__(self, dim, mask=None, std=1.0, **kwargs):
        super().__init__(dim, mask)
        self.std = _as_vec(std, dim, 'std')
        self.noise_size = dim

    def apply(self, target, dstate, ctrl_step, t, key):
        noise = jax.random.normal(key, (self.dim,)) * jnp.asarray(self.std)
        return target + self._masked(noise)

    def draw(self, key, prefix=()):
        return (jax.random.normal(key, tuple(prefix) + (self.dim,))
                * jnp.asarray(self.std))

    def apply_drawn(self, target, dstate, ctrl_step, t, drawn):
        return target + self._masked(drawn)


class PeriodicNoise(DisturbanceSpec):
    """Sinusoid with per-step random phase (disturbances.py:233-259)."""

    def __init__(self, dim, mask=None, scale=1.0, frequency=1.0, **kwargs):
        super().__init__(dim, mask)
        self.scale = float(scale)
        self.frequency = float(frequency)
        self.noise_size = dim

    def apply(self, target, dstate, ctrl_step, t, key):
        phase = jax.random.uniform(key, (self.dim,), minval=-jnp.pi, maxval=jnp.pi)
        noise = self.scale * jnp.sin(2 * jnp.pi * self.frequency * t + phase)
        return target + self._masked(noise)

    def draw(self, key, prefix=()):
        # Pre-drawn randomness is the per-step random phase.
        return jax.random.uniform(key, tuple(prefix) + (self.dim,),
                                  minval=-jnp.pi, maxval=jnp.pi)

    def apply_drawn(self, target, dstate, ctrl_step, t, drawn):
        noise = self.scale * jnp.sin(2 * jnp.pi * self.frequency * t + drawn)
        return target + self._masked(noise)


class DisturbanceList:
    """Sequential composition of disturbances (disturbances.py:38-67),
    compiled into pure init/apply functions."""

    def __init__(self, disturbances: Sequence[DisturbanceSpec]):
        self.disturbances = list(disturbances)
        self.state_size = sum(d.state_size for d in self.disturbances)
        self.noise_size = sum(d.noise_size for d in self.disturbances)

    def init(self, key: jax.Array) -> jax.Array:
        """Sample all per-episode disturbance parameters into one flat array."""
        if not self.disturbances:
            return jnp.zeros((0,), dtype=jnp.float32)
        keys = jax.random.split(key, len(self.disturbances))
        parts = [d.init(k) for d, k in zip(self.disturbances, keys)]
        parts = [p for p in parts if p.shape[0] > 0]
        if not parts:
            return jnp.zeros((0,), dtype=jnp.float32)
        return jnp.concatenate(parts)

    def apply(self, target, dstate, ctrl_step, t, key):
        out = target
        idx = 0
        keys = jax.random.split(key, max(1, len(self.disturbances)))
        for d, k in zip(self.disturbances, keys):
            sub = dstate[idx:idx + d.state_size]
            out = d.apply(out, sub, ctrl_step, t, k)
            idx += d.state_size
        return out

    def draw(self, key, prefix=()):
        """Pre-draw ALL per-step randomness for the list: a few fused
        ``prefix + (dim,)`` kernels (one per stochastic spec) instead of a
        per-env key split + per-env draw under vmap. Shape
        ``prefix + (noise_size,)``; slots follow spec order."""
        if self.noise_size == 0:
            return jnp.zeros(tuple(prefix) + (0,), dtype=jnp.float32)
        keys = jax.random.split(key, len(self.disturbances))
        parts = [d.draw(k, prefix) for d, k in zip(self.disturbances, keys)
                 if d.noise_size > 0]
        return jnp.concatenate(parts, axis=-1)

    def apply_drawn(self, target, dstate, ctrl_step, t, drawn):
        """``apply`` consuming pre-drawn randomness from ``draw`` (same
        distribution; impulse/step specs are deterministic per step and
        take their offset from ``dstate`` as in the keyed path)."""
        out = target
        s_idx = n_idx = 0
        for d in self.disturbances:
            sub = dstate[s_idx:s_idx + d.state_size]
            out = d.apply_drawn(out, sub, ctrl_step, t,
                                drawn[..., n_idx:n_idx + d.noise_size])
            s_idx += d.state_size
            n_idx += d.noise_size
        return out


class BrownianNoise(DisturbanceSpec):
    """Random-walk noise (stub in the reference, disturbances.py:226-231;
    implemented here as an integrated white-noise state)."""

    def __init__(self, dim, mask=None, std=1.0, **kwargs):
        super().__init__(dim, mask)
        self.std = _as_vec(std, dim, 'std')
        self.state_size = dim
        self.noise_size = dim

    def init(self, key):
        return jnp.zeros((self.dim,), jnp.float32)

    def apply(self, target, dstate, ctrl_step, t, key):
        # NOTE: the walk state would need to live in dstate to accumulate
        # across steps; as in the reference this type is not wired into
        # DISTURBANCE_TYPES and serves as an extension point.
        walk = dstate + jax.random.normal(key, (self.dim,)) * jnp.asarray(self.std)
        return target + self._masked(walk)

    def draw(self, key, prefix=()):
        return (jax.random.normal(key, tuple(prefix) + (self.dim,))
                * jnp.asarray(self.std))

    def apply_drawn(self, target, dstate, ctrl_step, t, drawn):
        return target + self._masked(dstate + drawn)


class StateDependentDisturbance(DisturbanceSpec):
    """Time/state-varying disturbance, e.g. friction — extension-point stub
    (disturbances.py:262-274 parity)."""

    def __init__(self, dim, mask=None, **kwargs):
        super().__init__(dim, mask)


DISTURBANCE_TYPES = {
    'impulse': ImpulseDisturbance,
    'step': StepDisturbance,
    'uniform': UniformNoise,
    'white_noise': WhiteNoise,
    'periodic': PeriodicNoise,
}


def create_disturbance_list(disturbance_specs, shared_args, max_step: int
                            ) -> DisturbanceList:
    """Build a DisturbanceList from YAML spec dicts
    (disturbances.py:285-303). ``shared_args`` carries the per-channel dim;
    ``max_step`` bounds random step offsets (EPISODE_LEN_SEC/CTRL_TIMESTEP).
    """
    disturb_list = []
    for disturb in disturbance_specs:
        assert 'disturbance_func' in disturb, \
            '[ERROR]: Every disturbance must specify a disturbance_func.'
        func = disturb['disturbance_func']
        assert func in DISTURBANCE_TYPES, \
            '[ERROR]: disturbance type not available.'
        cfg = {k: v for k, v in disturb.items() if k != 'disturbance_func'}
        disturb_list.append(
            DISTURBANCE_TYPES[func](**shared_args, max_step=max_step, **cfg))
    return DisturbanceList(disturb_list)
