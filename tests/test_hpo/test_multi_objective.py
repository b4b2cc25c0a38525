"""Multi-objective HPO: Pareto studies + visualization artifacts
(reference hyperparameters/hpo.py:216-262: ``directions=[...]`` studies,
``best_trials`` Pareto front, per-objective best-hyperparameter YAMLs and
param-importance / optimization-history plots)."""

import glob
import os

import numpy as np

from safe_control_gym_tpu.hyperparameters.hpo import HPO
from safe_control_gym_tpu.hyperparameters.hpo_sampler import \
    HYPERPARAMS_SAMPLER
from safe_control_gym_tpu.hyperparameters.study import create_study


def test_pareto_study_front(tmp_path):
    """A two-objective study with a known trade-off produces a non-trivial
    Pareto ``best_trials`` set and per-trial value vectors."""
    study = create_study(direction=['maximize', 'minimize'],
                         sampler='random', seed=0,
                         storage_path=str(tmp_path / 's.json'))

    def objective(trial):
        x = trial.suggest_float('x', 0.0, 1.0)
        # Objective 0 (maximize) and objective 1 (minimize) both grow with
        # x -> every x is a distinct Pareto trade-off point.
        return [x, x ** 2]

    study.optimize(objective, n_trials=12)
    assert all(t['values'] is not None and len(t['values']) == 2
               for t in study.trials)
    front = study.best_trials
    # Monotone trade-off: EVERY trial is non-dominated.
    assert len(front) == 12
    # Sanity: a dominated point would be excluded.
    assert study._dominates([0.9, 0.1], [0.5, 0.5])
    assert not study._dominates([0.5, 0.5], [0.9, 0.1])


def test_is_better_multi_objective(tmp_path):
    study = create_study(direction=['maximize', 'minimize'],
                         sampler='random', seed=0,
                         storage_path=str(tmp_path / 's.json'))
    study.optimize(lambda t: [0.5, 0.5], n_trials=1)
    assert study.is_better([0.6, 0.4])      # dominates incumbent
    assert study.is_better([0.6, 0.6])      # trade-off: non-dominated
    assert not study.is_better([0.4, 0.6])  # dominated


def test_hpo_multi_objective_artifacts(tmp_path, monkeypatch):
    """End-to-end two-objective HPO: Pareto YAMLs + per-objective
    importance/history plots are written (hpo.py:239-262 parity)."""
    monkeypatch.setitem(
        HYPERPARAMS_SAMPLER, 'fake',
        lambda cfg, trial: {'lr': trial.suggest_float('lr', 1e-4, 1e-1,
                                                      log=True)})
    hpo = HPO('fake', 'cartpole', sampler='random', output_dir=str(tmp_path),
              hpo_config=dict(trials=6, repetitions=2, n_episodes=1,
                              alpha=0.5,
                              objective=['average_return',
                                         'average_constraint_violation'],
                              direction=['maximize', 'minimize']))
    assert hpo.use_pruner is False
    rng = np.random.default_rng(0)

    def fake_metrics(trial, rep):
        lr = trial.params['lr']
        return {'average_return': 100 * lr + rng.normal(0, 0.1),
                'average_constraint_violation': 50 * lr
                + rng.normal(0, 0.05)}

    monkeypatch.setattr(hpo, '_one_repetition_metrics', fake_metrics)
    hpo.hyperparameter_optimization()
    done = [t for t in hpo.study.trials if t['values'] is not None]
    assert len(done) == 6
    front = hpo.study.best_trials
    assert len(front) >= 1
    pareto_yamls = glob.glob(str(tmp_path / 'best_hyperparameters_[[]*.yaml'))
    assert len(pareto_yamls) == len(front)
    for name in ('average_return', 'average_constraint_violation'):
        assert os.path.exists(
            tmp_path / f'optimization_history_{name}.png')
        assert os.path.exists(tmp_path / f'param_importances_{name}.png')
    assert os.path.exists(tmp_path / 'trials.csv')
    with open(tmp_path / 'trials.csv') as f:
        header = f.readline()
    assert 'value_0' in header and 'value_1' in header


def test_hpo_scalar_study_plots(tmp_path, monkeypatch):
    """Scalar studies also emit the two study-visualization artifacts."""
    monkeypatch.setitem(
        HYPERPARAMS_SAMPLER, 'fake',
        lambda cfg, trial: {'lr': trial.suggest_float('lr', 1e-4, 1e-1,
                                                      log=True)})
    hpo = HPO('fake', 'cartpole', sampler='random', output_dir=str(tmp_path),
              hpo_config=dict(trials=5, repetitions=1, n_episodes=1,
                              alpha=0.5, prune=False))
    monkeypatch.setattr(hpo, '_one_repetition',
                        lambda trial, rep: [1000 * trial.params['lr']])
    hpo.hyperparameter_optimization()
    assert os.path.exists(tmp_path / 'optimization_history.png')
    assert os.path.exists(tmp_path / 'param_importances.png')
    # The single informative param must carry all the importance.
    hist = [t for t in hpo.study.trials if t['value'] is not None]
    imps = hpo._param_importances(hist, [t['value'] for t in hist])
    assert imps['lr'] > 0.99
