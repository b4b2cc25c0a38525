"""HPO pruning + adaptive repetitions (reference hyperparameters/hpo.py:
MedianPruner in the study setup :27-60, dynamical extra runs near the
incumbent :149-158 — intermediate reporting, which the reference leaves as
a TODO, is real here)."""

import numpy as np

from safe_control_gym_tpu.hyperparameters.hpo import HPO
from safe_control_gym_tpu.hyperparameters.hpo_sampler import \
    HYPERPARAMS_SAMPLER
from safe_control_gym_tpu.hyperparameters.study import (MedianPruner,
                                                        TrialPruned,
                                                        create_study)


def test_median_pruner_prunes_bad_trial():
    study = create_study(direction='maximize', sampler='random',
                         pruner=MedianPruner(n_startup_trials=3))
    pruned_at = []

    def objective(trial):
        trial.suggest_float('x', 0.0, 1.0)
        quality = 10.0 if trial.number < 3 else 0.0
        for step in range(3):
            trial.report(quality, step)
            if step < 2 and trial.should_prune():
                pruned_at.append((trial.number, step))
                raise TrialPruned()
        return quality

    study.optimize(objective, n_trials=5)
    states = [t['state'] for t in study.trials]
    assert states[:3] == ['COMPLETE'] * 3          # startup trials complete
    assert states[3] == 'PRUNED' and states[4] == 'PRUNED'
    # Pruned at the FIRST report — no wasted repetitions.
    assert all(step == 0 for _, step in pruned_at)
    assert study.best_value == 10.0


def test_median_pruner_keeps_good_trials():
    study = create_study(direction='maximize', sampler='random',
                         pruner=MedianPruner(n_startup_trials=3))

    def objective(trial):
        trial.suggest_float('x', 0.0, 1.0)
        quality = 10.0 + trial.number      # monotonically improving
        for step in range(3):
            trial.report(quality, step)
            if trial.should_prune():
                raise TrialPruned()
        return quality

    study.optimize(objective, n_trials=6)
    assert all(t['state'] == 'COMPLETE' for t in study.trials)


def test_hpo_adaptive_repetitions(monkeypatch, tmp_path):
    """Better-than-incumbent trials get extra repetitions until the CVaR
    estimate stabilizes; ordinary trials stay at the base count."""
    monkeypatch.setitem(HYPERPARAMS_SAMPLER, 'fake',
                        lambda cfg, trial: {})
    hpo = HPO('fake', 'cartpole', sampler='random',
              output_dir=str(tmp_path),
              hpo_config=dict(trials=3, repetitions=2, n_episodes=1,
                              alpha=0.5, prune=False, dynamical_runs=True,
                              warm_trials=1, approximation_threshold=0.5,
                              max_extra_repetitions=3))
    # Scripted per-trial repetition outcomes: trial 0 poor, trial 1 poor,
    # trial 2 better-than-incumbent with a drifting-then-stable estimate.
    script = {0: [10.0, 10.0, 10.0, 10.0, 10.0, 10.0],
              1: [5.0, 5.0, 5.0, 5.0, 5.0, 5.0],
              2: [50.0, 50.0, 30.0, 30.2, 30.2, 30.2]}
    calls = {0: 0, 1: 0, 2: 0}

    def fake_rep(trial, rep):
        calls[trial.number] += 1
        return [script[trial.number][rep]]

    monkeypatch.setattr(hpo, '_one_repetition', fake_rep)
    hpo.study.optimize(hpo.objective, n_trials=3, catch=(Exception,))
    # Trials 0/1: exactly the base repetitions.
    assert calls[0] == 2 and calls[1] == 2, calls
    # Trial 2 beat the incumbent -> extra repetitions until |dCVaR| <= 0.5:
    # base cvar 50, +rep -> 36.7 (drift), +rep -> ~35 (drift) ... up to cap.
    assert calls[2] > 2, calls
    assert hpo.study.trials[2]['state'] == 'COMPLETE'
    # Intermediate values were reported for every repetition run.
    assert len(hpo.study.trials[2]['intermediate']) == calls[2]


def test_pruned_trials_excluded_from_best():
    study = create_study(direction='minimize', sampler='random',
                         pruner=MedianPruner(n_startup_trials=1))

    def objective(trial):
        trial.suggest_float('x', 0.0, 1.0)
        if trial.number == 1:
            trial.report(1e9, 0)
            if trial.should_prune():
                raise TrialPruned()
        trial.report(1.0, 0)
        return 1.0

    study.optimize(objective, n_trials=3)
    assert study.trials[1]['state'] == 'PRUNED'
    assert study.trials[1]['value'] is None
    assert study.best_value == 1.0
    assert np.isfinite(study.best_value)
