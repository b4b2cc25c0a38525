"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the driver separately
dry-runs the multichip path)."""

import os

# Must be set before jax initializes its backends.
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = _flags + ' --xla_force_host_platform_device_count=8'
# Before the XLA extension loads: silences the spurious per-entry
# cpu_aot_loader ERROR on compile-cache reloads (see
# utils.enable_persistent_compile_cache docstring).
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the suite's wall-clock is dominated by
# XLA compiles on the single host core. Executables are keyed by HLO
# hash, so reuse across runs is safe; override the location with
# JAX_COMPILATION_CACHE_DIR.
from safe_control_gym_tpu.utils.utils import \
    enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()
