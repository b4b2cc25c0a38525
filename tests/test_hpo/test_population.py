"""Population-batched HPO: B hyperparameter draws train simultaneously
as vmap lanes of ONE device program (hyperparameters/population.py),
wired into the TPE study via ask/tell rounds
(HPO._optimize_vectorized). Role parity: the per-trial train+eval loop
of reference hyperparameters/hpo.py:117-158, widened over the
population axis instead of sequenced."""

import os
from functools import partial

import numpy as np
import pytest

import jax

from safe_control_gym_tpu.hyperparameters.hpo import HPO
from safe_control_gym_tpu.hyperparameters.population import (
    VECTOR_HPS, make_population_ppo_evaluator, split_suggestion)
from safe_control_gym_tpu.utils.registration import make

ENV = partial(make, 'cartpole', seed=0)


def _keys(seeds):
    return np.stack([np.asarray(jax.random.PRNGKey(s)) for s in seeds])


def test_evaluator_shapes_and_determinism():
    ev = make_population_ppo_evaluator(
        ENV, rollout_batch_size=8, rollout_steps=16, iterations=2,
        opt_epochs=2, mini_batch_size=32, n_eval=3)
    hp = {'actor_lr': np.array([3e-4, 3e-3]),
          'entropy_coef': np.array([0.01, 0.05])}
    r1 = np.asarray(ev(hp, _keys([0, 1])))
    assert r1.shape == (2, 3)
    assert np.isfinite(r1).all()
    # Bitwise-deterministic per (hp row, key).
    r2 = np.asarray(ev(hp, _keys([0, 1])))
    assert np.array_equal(r1, r2)
    # Hyperparameters actually reach the program: changing only the hp
    # row changes the outcome under the identical key.
    hp_b = {'actor_lr': np.array([3e-2, 3e-3]),
            'entropy_coef': np.array([0.01, 0.05])}
    r3 = np.asarray(ev(hp_b, _keys([0, 1])))
    assert not np.allclose(r1[0], r3[0])
    assert np.array_equal(r1[1], r3[1])  # untouched lane identical


def test_population_training_separates_good_from_bad():
    """A sane learning rate must out-train a divergent one inside the
    same vmapped program (both lanes share every other setting)."""
    ev = make_population_ppo_evaluator(
        ENV, rollout_batch_size=16, rollout_steps=32, iterations=12,
        opt_epochs=5, mini_batch_size=64, use_gae=True, n_eval=4)
    hp = {'actor_lr': np.array([1e-3, 0.9]),
          'critic_lr': np.array([1e-3, 0.9]),
          'entropy_coef': np.array([0.01, 0.01])}
    r = np.asarray(ev(hp, _keys([7, 7])))
    good = np.nan_to_num(r[0], nan=-1e9).mean()
    bad = np.nan_to_num(r[1], nan=-1e9).mean()
    assert good > bad


def test_hpo_vectorized_study(tmp_path):
    """End-to-end vectorized study: rounds of B trials, one program per
    round, TPE history between rounds, artifacts on disk."""
    out = str(tmp_path / 'hpo_pop')
    hpo = HPO(
        'ppo', 'cartpole', sampler='tpe', output_dir=out,
        task_config={},
        hpo_config={
            'trials': 6, 'vectorized_trials': 3, 'repetitions': 2,
            'n_episodes': 2, 'prune': False,
            # Numeric-only search keeps the whole study on ONE compiled
            # executable (structural hps would re-shape the program).
            'hps_config': {'actor_lr': None, 'critic_lr': None,
                           'entropy_coef': None},
        },
        algo_config={'rollout_batch_size': 8, 'rollout_steps': 16,
                     'max_env_steps': 256, 'opt_epochs': 2,
                     'mini_batch_size': 32, 'hidden_dim': 32})
    study = hpo.hyperparameter_optimization()
    done = [t for t in study.trials if t['state'] == 'COMPLETE']
    assert len(done) == 6
    # Only the requested hyperparameters were searched.
    assert set(done[0]['params']) == {'actor_lr', 'critic_lr',
                                      'entropy_coef'}
    assert study.best_trial is not None
    assert os.path.exists(os.path.join(out, 'trials.csv'))
    assert os.path.exists(os.path.join(out, 'hyperparameters_0.yaml'))
    hpo.close()


def test_split_suggestion_partition():
    sug = {'actor_lr': 1e-3, 'hidden_dim': 64, 'gamma': 0.99,
           'activation': 'tanh', 'rollout_steps': 100}
    vec, struct = split_suggestion(sug)
    assert set(vec) == {'actor_lr', 'gamma'}
    assert set(struct) == {'hidden_dim', 'activation', 'rollout_steps'}
    assert all(k in VECTOR_HPS for k in vec)
