"""Measure the population-batched HPO study end-to-end (PERFORMANCE.md).

A 40-trial PPO-cartpole TPE study with ``vectorized_trials=8``: five
rounds of 8 trials, each round's 8 trials x 2 repetitions = 16 full
training runs executed as ONE vmapped device program
(hyperparameters/population.py). The sequential reference equivalent is
40 x 2 separate torch training runs coordinated through MySQL
(reference hyperparameters/hpo.py:117-158).

Search space: the numeric PPO hyperparameters (actor_lr, critic_lr,
entropy_coef, target_kl) so the whole study stays on one compiled
executable. Each trial trains 32 envs x 64 steps x 24 iterations =
49,152 env steps of cartpole (50/1000 Hz) and evaluates 4 episodes
deterministically; score = CVaR@0.5 of the 8 episode returns.

Usage: python tools/hpo_population_wallclock.py [out_dir]
Run strictly solo; prints a JSON summary line.
"""

import json
import shutil
import sys
import time

from safe_control_gym_tpu.hyperparameters.hpo import HPO


def main(out_dir='/tmp/hpo_pop_study'):
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    hpo = HPO(
        'ppo', 'cartpole', sampler='tpe', output_dir=out_dir,
        task_config=dict(ctrl_freq=50, pyb_freq=1000,
                         normalized_rl_action_space=True),
        hpo_config={
            'trials': 40, 'vectorized_trials': 8, 'repetitions': 2,
            'n_episodes': 4, 'alpha': 0.5, 'prune': False, 'seed': 0,
            'hps_config': {'actor_lr': None, 'critic_lr': None,
                           'entropy_coef': None, 'target_kl': None},
        },
        algo_config={'rollout_batch_size': 32, 'rollout_steps': 64,
                     'max_env_steps': 49_152, 'opt_epochs': 10,
                     'mini_batch_size': 256, 'hidden_dim': 64,
                     'use_gae': True})
    study = hpo.hyperparameter_optimization()
    wall = time.perf_counter() - t0
    done = [t for t in study.trials if t['state'] == 'COMPLETE']
    best = study.best_trial
    total_env_steps = len(done) * 2 * 49_152
    print(json.dumps({
        'metric': 'population HPO study wall-clock (40 PPO-cartpole '
                  'trials x 2 reps, vectorized_trials=8, incl. compile)',
        'value': round(wall, 1), 'unit': 's',
        'trials_complete': len(done),
        'best_value': round(float(best['value']), 2),
        'best_params': {k: (round(v, 6) if isinstance(v, float) else v)
                        for k, v in best['params'].items()},
        'env_steps_trained': total_env_steps,
        'env_steps_per_sec': round(total_env_steps / wall, 1),
    }))
    hpo.close()


if __name__ == '__main__':
    main(*sys.argv[1:2])
