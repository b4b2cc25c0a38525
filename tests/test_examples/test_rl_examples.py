"""Pretrained-artifact tests (reference examples/rl/models, examples/mpsc/models)."""

import functools



def test_pretrained_artifacts_load_and_solve():
    """The committed pretrained models load and hold the pole upright
    (reference ships examples/rl/models/*.pt, rl_experiment.py:46-60)."""
    import os

    import yaml

    from safe_control_gym_tpu.experiments.base_experiment import \
        BaseExperiment
    from safe_control_gym_tpu.utils.registration import get_config, make
    root = os.path.join(os.path.dirname(__file__), '..', '..', 'examples')
    with open(os.path.join(root, 'rl', 'config_overrides', 'cartpole',
                           'cartpole_stab.yaml')) as f:
        task = yaml.safe_load(f)['task_config']
    env_func = functools.partial(make, 'cartpole', **task)
    for algo in ('ppo', 'sac'):
        path = os.path.join(root, 'rl', 'models', algo,
                            f'{algo}_model_cartpole_stab.pt')
        assert os.path.exists(path), path
        cfg = get_config(algo)
        with open(os.path.join(root, 'rl', 'config_overrides', 'cartpole',
                               f'{algo}_cartpole.yaml')) as f:
            cfg.update(yaml.safe_load(f)['algo_config'])
        ctrl = make(algo, env_func, training=False, output_dir='/tmp/evalpre',
                    **cfg)
        ctrl.load(path)
        exp = BaseExperiment(env=env_func(), ctrl=ctrl)
        _, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
        exp.close()
        ctrl.close()
        # Full episode without falling (250 steps at 50 Hz / 5 s).
        assert metrics['average_length'] >= 240, (algo, metrics)


def test_pretrained_quadrotor_artifacts_fly():
    """The committed quadrotor_2D policies hold full hover episodes."""
    import os

    import yaml

    from safe_control_gym_tpu.experiments.base_experiment import \
        BaseExperiment
    from safe_control_gym_tpu.utils.registration import get_config, make
    root = os.path.join(os.path.dirname(__file__), '..', '..', 'examples')
    base = os.path.join(root, 'rl', 'config_overrides', 'quadrotor_2D')
    with open(os.path.join(base, 'quadrotor_2D_stab.yaml')) as f:
        task = yaml.safe_load(f)['task_config']
    env_func = functools.partial(make, 'quadrotor', **task)
    for algo in ('ppo', 'sac'):
        cfg = get_config(algo)
        with open(os.path.join(base, f'{algo}_quadrotor_2D.yaml')) as f:
            cfg.update(yaml.safe_load(f)['algo_config'])
        ctrl = make(algo, env_func, training=False,
                    output_dir='/tmp/evalpre', **cfg)
        ctrl.load(os.path.join(root, 'rl', 'models', algo,
                               f'{algo}_model_quadrotor_2D_stab.pt'))
        exp = BaseExperiment(env=env_func(), ctrl=ctrl)
        _, metrics = exp.run_evaluation(n_episodes=2, verbose=False)
        exp.close()
        ctrl.close()
        assert metrics['average_length'] >= 240, (algo, metrics)


def test_pretrained_mpsc_artifact_certifies():
    import os

    import numpy as np
    import yaml

    from safe_control_gym_tpu.utils.registration import get_config, make
    root = os.path.join(os.path.dirname(__file__), '..', '..', 'examples')
    base = os.path.join(root, 'mpsc', 'config_overrides', 'cartpole')
    with open(os.path.join(base, 'cartpole_stab.yaml')) as f:
        task = yaml.safe_load(f)['task_config']
    sf_cfg = get_config('linear_mpsc')
    with open(os.path.join(base, 'linear_mpsc_cartpole.yaml')) as f:
        sf_cfg.update(yaml.safe_load(f)['sf_config'])
    env_func = functools.partial(make, 'cartpole', **task)
    sf = make('linear_mpsc', env_func, **sf_cfg)
    sf.load(os.path.join(root, 'mpsc', 'models', 'linear_mpsc_cartpole.pkl'))
    env = env_func()
    obs, _ = env.reset()
    sf.reset_before_run(env=env)
    u, success = sf.certify_action(obs, np.array([0.5], np.float32))
    assert success
    assert np.isfinite(u).all()


def test_pretrained_quadrotor_track_and_3d_artifacts():
    """Tracking (2D figure8) and 3D-stabilization artifacts load and fly."""
    import os

    import yaml

    from safe_control_gym_tpu.experiments.base_experiment import \
        BaseExperiment
    from safe_control_gym_tpu.utils.registration import get_config, make
    root = os.path.join(os.path.dirname(__file__), '..', '..', 'examples')

    def run_one(algo, sysdir, taskfile, artifact):
        base = os.path.join(root, 'rl', 'config_overrides', sysdir)
        with open(os.path.join(base, taskfile)) as f:
            task = yaml.safe_load(f)['task_config']
        cfg = get_config(algo)
        with open(os.path.join(base, f'{algo}_{sysdir}.yaml')) as f:
            cfg.update(yaml.safe_load(f)['algo_config'])
        env_func = functools.partial(make, 'quadrotor', **task)
        ctrl = make(algo, env_func, training=False,
                    output_dir='/tmp/evalpre', **cfg)
        ctrl.load(os.path.join(root, 'rl', 'models', algo,
                               f'{algo}_model_{artifact}.pt'))
        exp = BaseExperiment(env=env_func(), ctrl=ctrl)
        _, metrics = exp.run_evaluation(n_episodes=1, verbose=False)
        exp.close()
        ctrl.close()
        assert metrics['average_length'] >= 240, (algo, artifact, metrics)

    run_one('ppo', 'quadrotor_2D', 'quadrotor_2D_track.yaml',
            'quadrotor_2D_track')
    run_one('ppo', 'quadrotor_3D', 'quadrotor_3D_stab.yaml',
            'quadrotor_3D_stab')
    run_one('sac', 'quadrotor_3D', 'quadrotor_3D_stab.yaml',
            'quadrotor_3D_stab')
