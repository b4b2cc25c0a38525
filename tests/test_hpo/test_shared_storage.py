"""Shared-study storage: multiple worker processes cooperate on one study
through the fcntl-locked JSON file (the role of the reference's MySQL
storage, hyperparameters/database.py)."""

import json
import multiprocessing as mp
import os

import numpy as np

from safe_control_gym_tpu.hyperparameters import database
from safe_control_gym_tpu.hyperparameters.study import create_study


def _objective(trial):
    x = trial.suggest_float('x', -2.0, 2.0)
    return -(x - 0.7) ** 2


def _worker(storage_path, seed, n_trials):
    study = create_study(direction='maximize', sampler='random', seed=seed,
                         storage_path=storage_path)
    study.optimize(_objective, n_trials=n_trials)


def test_two_workers_share_one_study(tmp_path):
    storage = str(tmp_path / 'study.json')
    ctx = mp.get_context('spawn')
    ps = [ctx.Process(target=_worker, args=(storage, seed, 6))
          for seed in (1, 2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
        assert p.exitcode == 0
    with open(storage) as f:
        trials = json.load(f)
    # Nothing lost to clobbering: all 12 trials from both workers persist,
    # with unique uids and contiguous renumbering.
    assert len(trials) == 12, len(trials)
    assert len({t['uid'] for t in trials}) == 12
    assert sorted(t['number'] for t in trials) == list(range(12))
    assert all(np.isfinite(t['value']) for t in trials)


def test_refresh_sees_other_workers_trials(tmp_path):
    storage = str(tmp_path / 'study.json')
    s1 = create_study(direction='maximize', sampler='random', seed=1,
                      storage_path=storage)
    s2 = create_study(direction='maximize', sampler='random', seed=2,
                      storage_path=storage)
    s1.optimize(_objective, n_trials=3)
    s2.refresh()
    assert len(s2.trials) == 3
    s2.optimize(_objective, n_trials=2)
    s1.refresh()
    assert len(s1.trials) == 5
    assert s1.best_value == s2.best_value


def test_database_create_drop(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = database.create('mystudy')
    assert os.path.isdir(path)
    database.drop('mystudy')
    assert not os.path.isdir(path)
