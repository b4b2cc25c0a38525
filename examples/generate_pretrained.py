"""Generate the committed pretrained artifacts the examples load.

The reference ships pretrained models under ``examples/rl/models/*.pt``
(one per {algo} x {system} x {task} cell, named
``<algo>_model_<system>_<task>.pt``), RL policies for the MPSC demos under
``examples/mpsc/models/*.pt`` and RPI pickles ``linear_mpsc_<system>.pkl``
(rl_experiment.py:53, mpsc_experiment.py:57-89). This script reproduces
those artifacts for the TPU build using the example YAML configs themselves.
Run from the repo root:

    python examples/generate_pretrained.py [--steps 45000] [--only JOB ...]
"""

import argparse
import os
from functools import partial

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))


def _load_yaml(*parts):
    with open(os.path.join(HERE, *parts)) as f:
        return yaml.safe_load(f)


def train_rl(algo, steps, sysdir='cartpole', system='cartpole',
             task='stab', tpu_scale=False):
    from safe_control_gym_tpu.utils.registration import get_config, make
    task_cfg = _load_yaml('rl', 'config_overrides', sysdir,
                          f'{sysdir}_{task}.yaml')['task_config']
    # Defaults from the algo's registered YAML, then the example overrides
    # (what ConfigFactory does for the CLI entry points).
    algo_cfg = get_config(algo)
    algo_cfg.update(_load_yaml('rl', 'config_overrides', sysdir,
                               f'{algo}_{sysdir}.yaml')['algo_config'])
    algo_cfg['max_env_steps'] = steps
    if tpu_scale:
        # On-chip settings used for the committed quadrotor artifacts.
        if algo == 'ppo':
            algo_cfg.update(rollout_batch_size=256, rollout_steps=128,
                            mini_batch_size=4096, fused_iterations=8)
        else:
            algo_cfg.update(rollout_batch_size=32, train_interval=320,
                            train_batch_size=512, warm_up_steps=5000,
                            max_buffer_size=400000, fused_iterations=8)
    env_func = partial(make, system, **task_cfg)
    ctrl = make(algo, env_func, training=True, seed=0,
                output_dir=f'/tmp/pretrain_{algo}_{sysdir}_{task}',
                **algo_cfg)
    ctrl.learn()
    out_dir = os.path.join(HERE, 'rl', 'models', algo)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'{algo}_model_{sysdir}_{task}.pt')
    ctrl.save(path)
    ctrl.close()
    print(f'{algo}/{sysdir}/{task}: saved {path}')


def train_mpsc_rl(algo, steps, sysdir='cartpole', system='cartpole',
                  task='stab'):
    """RL policies the MPSC demos certify (reference ships
    examples/mpsc/models/<algo>_model_<system>_<task>.pt)."""
    from safe_control_gym_tpu.utils.registration import get_config, make
    task_cfg = _load_yaml('mpsc', 'config_overrides', sysdir,
                          f'{sysdir}_{task}.yaml')['task_config']
    algo_cfg = get_config(algo)
    algo_cfg.update(_load_yaml('mpsc', 'config_overrides', sysdir,
                               f'{algo}_{sysdir}.yaml')['algo_config'])
    algo_cfg['max_env_steps'] = steps
    env_func = partial(make, system, **task_cfg)
    ctrl = make(algo, env_func, training=True, seed=0,
                output_dir=f'/tmp/pretrain_mpsc_{algo}_{sysdir}_{task}',
                **algo_cfg)
    ctrl.learn()
    out_dir = os.path.join(HERE, 'mpsc', 'models')
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'{algo}_model_{sysdir}_{task}.pt')
    ctrl.save(path)
    ctrl.close()
    print(f'mpsc {algo}/{sysdir}/{task}: saved {path}')


def learn_mpsc(sysdir='cartpole', system='cartpole'):
    from safe_control_gym_tpu.utils.registration import get_config, make
    task_cfg = _load_yaml('mpsc', 'config_overrides', sysdir,
                          f'{sysdir}_stab.yaml')['task_config']
    sf_cfg = get_config('linear_mpsc')
    sf_cfg.update(_load_yaml('mpsc', 'config_overrides', sysdir,
                             f'linear_mpsc_{sysdir}.yaml')['sf_config'])
    env_func = partial(make, system, **task_cfg)
    sf = make('linear_mpsc', env_func, **sf_cfg)
    sf.learn()
    out_dir = os.path.join(HERE, 'mpsc', 'models')
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'linear_mpsc_{sysdir}.pkl')
    sf.save(path)
    print(f'mpsc/{sysdir}: saved {path}')


def train_safe_explorer(steps, sysdir='cartpole', system='cartpole',
                        task='stab'):
    from safe_control_gym_tpu.utils.registration import get_config, make
    spec = _load_yaml('rl', 'config_overrides', sysdir,
                      f'safe_explorer_ppo_{sysdir}.yaml')
    task_cfg = _load_yaml('rl', 'config_overrides', sysdir,
                          f'{sysdir}_{task}.yaml')['task_config']
    task_cfg.update(spec.get('task_config', {}))
    cfg = get_config('safe_explorer_ppo')
    cfg.update(spec['algo_config'])
    cfg.update(max_env_steps=steps, constraint_steps_per_epoch=1000,
               constraint_epochs=3)
    env_func = partial(make, system, **task_cfg)
    ctrl = make('safe_explorer_ppo', env_func, training=True, seed=0,
                output_dir=f'/tmp/pretrain_se_{sysdir}_{task}', **cfg)
    ctrl.learn()
    out_dir = os.path.join(HERE, 'rl', 'models', 'safe_explorer_ppo')
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir,
                        f'safe_explorer_ppo_model_{sysdir}_{task}.pt')
    ctrl.save(path)
    ctrl.close()
    print(f'safe_explorer_ppo/{sysdir}/{task}: saved {path}')


def learn_cbf_nn():
    from safe_control_gym_tpu.utils.registration import get_config, make
    task_cfg = _load_yaml('cbf', 'config_overrides', 'cartpole',
                          'cartpole_stab.yaml')['task_config']
    env_func = partial(make, 'cartpole', **task_cfg)
    sf_cfg = get_config('cbf_nn')
    sf_cfg.update(num_episodes=5, train_iterations=100)
    sf = make('cbf_nn', env_func, **sf_cfg)
    sf.learn()
    out_dir = os.path.join(HERE, 'cbf', 'models')
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, 'cbf_nn_cartpole.pt')
    sf.save(path)
    print(f'cbf_nn: saved {path}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=45000)
    parser.add_argument('--tpu_scale', action='store_true')
    parser.add_argument('--only', nargs='*', default=None,
                        help='subset of job names to run')
    args = parser.parse_args()

    JOBS = {
        # RL eval artifacts (examples/rl/models).
        'ppo_cartpole_stab': lambda: train_rl('ppo', args.steps),
        'ppo_cartpole_track': lambda: train_rl('ppo', args.steps,
                                               task='track'),
        'sac_cartpole_stab': lambda: train_rl('sac', args.steps // 2),
        'sac_cartpole_track': lambda: train_rl('sac', args.steps // 2,
                                               task='track'),
        'ppo_quadrotor_2D_stab': lambda: train_rl(
            'ppo', args.steps, sysdir='quadrotor_2D', system='quadrotor'),
        'sac_quadrotor_2D_stab': lambda: train_rl(
            'sac', args.steps // 2, sysdir='quadrotor_2D',
            system='quadrotor'),
        'ppo_quadrotor_2D_track': lambda: train_rl(
            'ppo', 6_000_000, sysdir='quadrotor_2D', system='quadrotor',
            task='track', tpu_scale=True),
        'sac_quadrotor_2D_track': lambda: train_rl(
            'sac', 1_500_000, sysdir='quadrotor_2D', system='quadrotor',
            task='track', tpu_scale=True),
        'ppo_quadrotor_3D_stab': lambda: train_rl(
            'ppo', 2_000_000, sysdir='quadrotor_3D', system='quadrotor',
            tpu_scale=True),
        'sac_quadrotor_3D_stab': lambda: train_rl(
            'sac', 1_500_000, sysdir='quadrotor_3D', system='quadrotor',
            tpu_scale=True),
        'ppo_quadrotor_3D_track': lambda: train_rl(
            'ppo', 6_000_000, sysdir='quadrotor_3D', system='quadrotor',
            task='track', tpu_scale=True),
        'sac_quadrotor_3D_track': lambda: train_rl(
            'sac', 1_500_000, sysdir='quadrotor_3D', system='quadrotor',
            task='track', tpu_scale=True),
        # Safe-explorer artifacts.
        'se_cartpole_stab': lambda: train_safe_explorer(args.steps // 2),
        'se_cartpole_track': lambda: train_safe_explorer(
            args.steps // 2, task='track'),
        'se_quadrotor_2D_stab': lambda: train_safe_explorer(
            args.steps // 2, sysdir='quadrotor_2D', system='quadrotor'),
        'se_quadrotor_2D_track': lambda: train_safe_explorer(
            args.steps // 2, sysdir='quadrotor_2D', system='quadrotor',
            task='track'),
        'se_quadrotor_3D_stab': lambda: train_safe_explorer(
            args.steps // 2, sysdir='quadrotor_3D', system='quadrotor'),
        'se_quadrotor_3D_track': lambda: train_safe_explorer(
            args.steps // 2, sysdir='quadrotor_3D', system='quadrotor',
            task='track'),
        # MPSC artifacts.
        'mpsc_rpi_cartpole': lambda: learn_mpsc(),
        'mpsc_rpi_quadrotor_2D': lambda: learn_mpsc(
            sysdir='quadrotor_2D', system='quadrotor'),
        'mpsc_ppo_cartpole_stab': lambda: train_mpsc_rl(
            'ppo', args.steps // 2),
        'mpsc_ppo_cartpole_track': lambda: train_mpsc_rl(
            'ppo', args.steps // 2, task='track'),
        'mpsc_sac_cartpole_stab': lambda: train_mpsc_rl(
            'sac', args.steps // 4),
        'mpsc_sac_cartpole_track': lambda: train_mpsc_rl(
            'sac', args.steps // 4, task='track'),
        'mpsc_ppo_quadrotor_2D_stab': lambda: train_mpsc_rl(
            'ppo', args.steps // 2, sysdir='quadrotor_2D',
            system='quadrotor'),
        'mpsc_ppo_quadrotor_2D_track': lambda: train_mpsc_rl(
            'ppo', args.steps // 2, sysdir='quadrotor_2D',
            system='quadrotor', task='track'),
        'mpsc_sac_quadrotor_2D_stab': lambda: train_mpsc_rl(
            'sac', args.steps // 4, sysdir='quadrotor_2D',
            system='quadrotor'),
        'mpsc_sac_quadrotor_2D_track': lambda: train_mpsc_rl(
            'sac', args.steps // 4, sysdir='quadrotor_2D',
            system='quadrotor', task='track'),
        # CBF.
        'cbf_nn': learn_cbf_nn,
    }
    names = args.only if args.only else list(JOBS)
    for name in names:
        JOBS[name]()
