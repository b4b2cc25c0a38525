"""Smoke/import test — parity with reference tests/test_build.py:1-9."""


def test_imports():
    import safe_control_gym_tpu
    import safe_control_gym_tpu.controllers
    import safe_control_gym_tpu.envs
    import safe_control_gym_tpu.envs.benchmark_env
    import safe_control_gym_tpu.envs.cartpole
    import safe_control_gym_tpu.envs.constraints
    import safe_control_gym_tpu.envs.disturbances
    import safe_control_gym_tpu.envs.dynamics
    import safe_control_gym_tpu.envs.env_wrappers.record_episode_statistics
    import safe_control_gym_tpu.envs.env_wrappers.vectorized_env
    import safe_control_gym_tpu.envs.quadrotor
    import safe_control_gym_tpu.envs.symbolic
    import safe_control_gym_tpu.experiments.base_experiment
    import safe_control_gym_tpu.hyperparameters.hpo
    import safe_control_gym_tpu.hyperparameters.hpo_sampler
    import safe_control_gym_tpu.math.distributions
    import safe_control_gym_tpu.math.linalg
    import safe_control_gym_tpu.math.metrics
    import safe_control_gym_tpu.math.networks
    import safe_control_gym_tpu.math.normalization
    import safe_control_gym_tpu.math.random_processes
    import safe_control_gym_tpu.math.rotations
    import safe_control_gym_tpu.math.schedules
    import safe_control_gym_tpu.ops.qp
    import safe_control_gym_tpu.parallel.sharding
    import safe_control_gym_tpu.safety_filters
    import safe_control_gym_tpu.utils.configuration
    import safe_control_gym_tpu.utils.logging
    import safe_control_gym_tpu.utils.plotting
    import safe_control_gym_tpu.utils.registration
    import safe_control_gym_tpu.utils.utils
