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

# SCG_TPU_TESTS=1 leaves the platform alone (the axon plugin registers the
# real chip) so the tpu-marked tests — the stochastic-kernel statistical
# equivalence suite — can run on hardware; everything else self-skips or
# runs identically.
if not os.environ.get('SCG_TPU_TESTS'):
    jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the suite's wall-clock is dominated by
# XLA compiles on the single host core. Executables are keyed by HLO
# hash, so reuse across runs is safe; override the location with
# JAX_COMPILATION_CACHE_DIR.
from safe_control_gym_tpu.utils.utils import \
    enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

import pytest  # noqa: E402

# Curated smoke tier (`-m smoke`): ONE representative cell per
# subsystem/matrix, no training loops — the suite's wall-clock is
# compile-bound on the single host core, so the fast tier is a curated
# subset, not a marker on the heavy modules. Measured wall-clock lives in
# PERFORMANCE.md ("Test tiers"). Patterns are nodeids relative to tests/:
# a module name marks the whole module, a full nodeid marks one test
# (parametrized cells match by prefix).
_SMOKE = (
    'test_build.py',
    'test_math.py',
    'test_linalg.py',
    'test_dynamics.py',
    'test_infra.py::test_registry_contents',
    'test_infra.py::test_default_configs_load',
    'test_infra.py::test_experiment_logger',
    'test_envs.py::test_cartpole_seed_determinism',
    'test_envs.py::test_quadrotor_shapes',
    'test_envs.py::test_vmapped_batch_stepping',
    'test_native_oracle.py::test_cartpole_sim_matches_cpp_oracle',
    'test_pallas.py::test_cartpole_pallas_kernel_matches_reference',
    'test_rollout_kernel.py::test_replay_matches_production_step',
    'test_policy_rollout_kernel.py::'
    'test_cartpole_policy_rollout_matches_production',
    'test_controllers.py::test_lqr_cartpole_stabilization',
    'test_fused_eval.py::test_ppo_scan_eval_runs_and_is_deterministic',
    'test_mpc.py::test_admm_qp_analytic',
    'test_safety_filters.py::test_cbf_passthrough_when_safe',
    'test_subproc_vec_env.py',
    'test_hpo/test_population.py::test_split_suggestion_partition',
    'test_examples/test_lqr.py::test_lqr[lqr-stab-cartpole]',
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split('tests/')[-1]
        for p in _SMOKE:
            if rel == p or rel.startswith(p + '::') or rel.startswith(p + '['):
                item.add_marker(pytest.mark.smoke)
                break
