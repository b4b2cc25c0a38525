"""Generate the committed pretrained artifacts the examples load.

The reference ships pretrained models under ``examples/rl/models/*.pt`` and
``examples/mpsc/models/*.pkl`` so demo scripts evaluate instead of training
(rl_experiment.py:46-60, mpsc_experiment.py:64-200). This script reproduces
those artifacts for the TPU build using the example YAML configs themselves.
Run from the repo root:

    python examples/generate_pretrained.py [--steps 45000]
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
             taskfile=None, out_name=None, tpu_scale=False):
    from safe_control_gym_tpu.utils.registration import get_config, make
    task_cfg = _load_yaml('rl', 'config_overrides', sysdir,
                          taskfile or f'{sysdir}_stab.yaml')['task_config']
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
                output_dir=f'/tmp/pretrain_{algo}_{sysdir}', **algo_cfg)
    ctrl.learn()
    out_dir = os.path.join(HERE, 'rl', 'models', algo)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'model_latest_{out_name or system}.pt')
    ctrl.save(path)
    ctrl.close()
    print(f'{algo}/{sysdir}: saved {path}')


def learn_mpsc(sysdir='cartpole', system='cartpole'):
    from safe_control_gym_tpu.utils.registration import get_config, make
    task_cfg = _load_yaml('mpsc', 'config_overrides', sysdir,
                          f'{sysdir}_stab.yaml')['task_config']
    sf_cfg = get_config('linear_mpsc')
    sf_cfg.update(_load_yaml('mpsc', 'config_overrides', sysdir,
                             f'linear_mpsc_{sysdir}_stab.yaml')['sf_config'])
    env_func = partial(make, system, **task_cfg)
    sf = make('linear_mpsc', env_func, **sf_cfg)
    sf.learn()
    out_dir = os.path.join(HERE, 'mpsc', 'models')
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'mpsc_{system}.pkl')
    sf.save(path)
    print(f'mpsc/{sysdir}: saved {path}')


def train_safe_explorer(steps):
    from safe_control_gym_tpu.utils.registration import get_config, make
    spec = _load_yaml('rl', 'config_overrides', 'cartpole',
                      'safe_explorer_ppo_cartpole.yaml')
    task_cfg = _load_yaml('rl', 'config_overrides', 'cartpole',
                          'cartpole_stab.yaml')['task_config']
    task_cfg.update(spec.get('task_config', {}))
    cfg = get_config('safe_explorer_ppo')
    cfg.update(spec['algo_config'])
    cfg.update(max_env_steps=steps, constraint_steps_per_epoch=1000,
               constraint_epochs=3)
    env_func = partial(make, 'cartpole', **task_cfg)
    ctrl = make('safe_explorer_ppo', env_func, training=True, seed=0,
                output_dir='/tmp/pretrain_se', **cfg)
    ctrl.learn()
    out_dir = os.path.join(HERE, 'rl', 'models', 'safe_explorer_ppo')
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, 'model_latest_cartpole.pt')
    ctrl.save(path)
    ctrl.close()
    print(f'safe_explorer_ppo: saved {path}')


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
    args = parser.parse_args()
    train_rl('ppo', args.steps)
    train_rl('sac', args.steps // 2)
    train_rl('ppo', args.steps, sysdir='quadrotor_2D', system='quadrotor')
    train_rl('sac', args.steps // 2, sysdir='quadrotor_2D',
             system='quadrotor')
    if args.tpu_scale:
        train_rl('ppo', 6_000_000, sysdir='quadrotor_2D',
                 system='quadrotor', taskfile='quadrotor_2D_track.yaml',
                 out_name='quadrotor_track', tpu_scale=True)
        train_rl('sac', 1_500_000, sysdir='quadrotor_2D',
                 system='quadrotor', taskfile='quadrotor_2D_track.yaml',
                 out_name='quadrotor_track', tpu_scale=True)
        train_rl('ppo', 2_000_000, sysdir='quadrotor_3D',
                 system='quadrotor', taskfile='quadrotor_3D_stab.yaml',
                 out_name='quadrotor_3D', tpu_scale=True)
        train_rl('sac', 1_500_000, sysdir='quadrotor_3D',
                 system='quadrotor', taskfile='quadrotor_3D_stab.yaml',
                 out_name='quadrotor_3D', tpu_scale=True)
    train_safe_explorer(args.steps // 2)
    learn_mpsc()
    learn_mpsc(sysdir='quadrotor_2D', system='quadrotor')
    learn_cbf_nn()
