"""Infra tests: config factory, registry, logging, plotting, HPO study,
vec env wrappers, multi-chip sharding."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from safe_control_gym_tpu.utils.registration import get_config, make, registry


def test_registry_contents():
    # Full algo/env/filter surface of the reference is registered.
    ids = set(s.idx for s in registry.all())
    expected = {'cartpole', 'quadrotor', 'lqr', 'ilqr', 'pid', 'mpc',
                'linear_mpc', 'gp_mpc', 'mpc_acados', 'ppo', 'sac', 'ddpg',
                'safe_explorer_ppo', 'rarl', 'rap', 'linear_mpsc', 'cbf',
                'cbf_nn'}
    assert expected <= ids, expected - ids


def test_default_configs_load():
    for idx in ['cartpole', 'quadrotor', 'lqr', 'ilqr', 'pid', 'mpc',
                'linear_mpc', 'gp_mpc', 'mpc_acados', 'ppo', 'sac', 'ddpg',
                'safe_explorer_ppo', 'rarl', 'rap', 'linear_mpsc', 'cbf',
                'cbf_nn']:
        cfg = get_config(idx)
        assert isinstance(cfg, dict)


def test_config_factory_merge(tmp_path, monkeypatch):
    import yaml
    override = {'task_config': {'ctrl_freq': 25},
                'algo_config': {'q_lqr': [2.0]}}
    f = tmp_path / 'override.yaml'
    f.write_text(yaml.dump(override))
    monkeypatch.setattr(sys, 'argv', [
        'prog', '--algo', 'lqr', '--task', 'cartpole', '--overrides', str(f),
        '--kv_overrides', 'algo_config.r_lqr=[0.5]', '--seed', '7'])
    from safe_control_gym_tpu.utils.configuration import ConfigFactory
    config = ConfigFactory().merge()
    assert config.task_config.ctrl_freq == 25
    assert config.algo_config.q_lqr == [2.0]
    assert config.algo_config.r_lqr == [0.5]
    assert config.seed == 7
    # Registry defaults below overrides are still present.
    assert 'discrete_dynamics' in config.algo_config


def test_experiment_logger(tmp_path):
    from safe_control_gym_tpu.utils.logging import ExperimentLogger
    logger = ExperimentLogger(str(tmp_path))
    logger.add_scalar('loss/a', 1.5, 10)
    logger.add_scalar('loss/a', 1.2, 20)
    logger.dump_scalars()
    logger.close()
    log_file = os.path.join(str(tmp_path), 'logs', 'loss_a.log')
    assert os.path.exists(log_file)
    lines = open(log_file).read().strip().split('\n')
    assert len(lines) == 2
    # Restore truncation (resume semantics).
    from safe_control_gym_tpu.utils.logging import FileLogger
    fl = FileLogger(str(tmp_path))
    fl.restore(10)
    fl.close()
    lines = open(log_file).read().strip().split('\n')
    assert len(lines) == 1


def test_plotting_from_logs(tmp_path):
    from safe_control_gym_tpu.utils.logging import ExperimentLogger
    from safe_control_gym_tpu.utils.plotting import (load_from_logs,
                                                     plot_from_logs)
    logger = ExperimentLogger(str(tmp_path))
    for i in range(20):
        logger.add_scalar('rew', float(i), i)
    logger.close()
    data = load_from_logs(str(tmp_path))
    assert 'rew' in data
    plot_from_logs(str(tmp_path), str(tmp_path / 'plots'), window=5)
    assert os.path.exists(str(tmp_path / 'plots' / 'rew.png'))


def test_tpe_study_beats_random_on_quadratic():
    from safe_control_gym_tpu.hyperparameters.study import create_study
    def obj(trial):
        x = trial.suggest_float('x', -5.0, 5.0)
        return -(x - 1.7) ** 2
    tpe = create_study(sampler='tpe', seed=0)
    tpe.optimize(obj, n_trials=40)
    assert abs(tpe.best_params['x'] - 1.7) < 1.0


def test_jax_vec_env_wrapper_api():
    from safe_control_gym_tpu.envs.env_wrappers.vectorized_env import \
        make_vec_envs
    env_func = partial(make, 'cartpole', normalized_rl_action_space=True,
                       episode_len_sec=2)
    venv = make_vec_envs(env_func, batch_size=4, seed=0)
    obs = venv.reset()
    assert obs.shape == (4, 4)
    total_dones = 0
    for _ in range(120):
        obs, rew, done, infos = venv.step(np.random.uniform(-1, 1, (4, 1)))
        total_dones += done.sum()
        for i, inf in enumerate(infos):
            if done[i]:
                assert 'terminal_observation' in inf
    assert total_dones > 0
    venv.close()


def test_sharded_env_step_8_devices():
    from safe_control_gym_tpu.parallel.sharding import (make_env_mesh,
                                                        make_sharded_env_step)
    assert len(jax.devices()) >= 8, 'conftest should provide 8 cpu devices'
    mesh = make_env_mesh(8)
    env = make('cartpole')
    reset_fn, step_fn = make_sharded_env_step(mesh, env.func)
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    states, obs = reset_fn(keys)
    # The batch really is sharded across the mesh.
    shard_devs = {s.device for s in states.state.addressable_shards}
    assert len(shard_devs) == 8
    states, out = step_fn(states, jnp.zeros((32, 1)))
    assert out.obs.shape == (32, 4)
    assert np.isfinite(np.asarray(out.reward)).all()
