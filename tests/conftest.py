"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the driver separately
dry-runs the multichip path)."""

import os

# Must be set before jax initializes its backends.
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = _flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
