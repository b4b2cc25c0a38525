"""SQLite study database (hyperparameters/database.py): the embedded
replacement for the reference's MySQL storage — shared multi-process
trials, resume, and the mysqldump-style backup/restore recipe
(reference database.py:10-53)."""

import multiprocessing as mp
import os

import numpy as np

from safe_control_gym_tpu.hyperparameters import database
from safe_control_gym_tpu.hyperparameters.database import SqliteTrialStore
from safe_control_gym_tpu.hyperparameters.study import create_study


def _objective(trial):
    x = trial.suggest_float('x', -2.0, 2.0)
    return -(x - 0.7) ** 2


def _worker(storage_path, seed, n_trials):
    study = create_study(direction='maximize', sampler='random', seed=seed,
                         storage_path=storage_path)
    study.optimize(_objective, n_trials=n_trials)


def test_sqlite_study_optimize_and_resume(tmp_path):
    path = str(tmp_path / 'study.db')
    s1 = create_study(sampler='tpe', seed=0, storage_path=path)
    s1.optimize(_objective, n_trials=5)
    assert os.path.exists(path)
    # A fresh Study on the same .db resumes all prior trials.
    s2 = create_study(sampler='tpe', seed=1, storage_path=path)
    assert len(s2.trials) == 5
    s2.optimize(_objective, n_trials=3)
    assert len(s2.trials) == 8
    assert s2.best_value is not None


def test_two_processes_share_one_sqlite_study(tmp_path):
    """Concurrent workers upsert into one study.db without clobbering —
    the MySQL-coordination role, with SQLite's own locking instead of the
    JSON backend's fcntl sidecar."""
    storage = str(tmp_path / 'study.db')
    ctx = mp.get_context('spawn')
    ps = [ctx.Process(target=_worker, args=(storage, seed, 6))
          for seed in (1, 2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=180)
        assert p.exitcode == 0
    trials = SqliteTrialStore(storage).load()
    assert len(trials) == 12, len(trials)
    assert len({t['uid'] for t in trials}) == 12
    assert sorted(t['number'] for t in trials) == list(range(12))
    assert all(np.isfinite(t['value']) for t in trials)


def test_trial_record_round_trip(tmp_path):
    """params/values/intermediate survive the SQL round trip intact
    (including multi-objective value vectors)."""
    store = SqliteTrialStore(str(tmp_path / 's.db'))
    t = {'uid': 'abc123', 'number': 0,
         'params': {'lr': 3e-4, 'act': 'tanh'},
         'value': 1.5, 'values': [1.5, -0.25], 'state': 'COMPLETE',
         'intermediate': {'0': 1.0, '1': 1.5}}
    out = store.merge_write([t])
    assert out == [t]
    # Upsert by uid: rewriting the same uid updates, not duplicates.
    t2 = dict(t, value=2.0, values=[2.0, -0.1])
    out = store.merge_write([t2])
    assert len(out) == 1 and out[0]['value'] == 2.0


def test_backup_restore_round_trip(tmp_path, monkeypatch):
    """backup() dumps portable SQL; restore() rebuilds an identical study
    (the mysqldump/mysql recipe in reference database.py:23-30)."""
    monkeypatch.chdir(tmp_path)
    database.create('mystudy')
    s = create_study(sampler='random', seed=0,
                     storage_path=database.study_db_path('mystudy'))
    s.optimize(_objective, n_trials=4)
    dump = database.backup('mystudy')
    assert os.path.exists(dump) and open(dump).read().startswith('BEGIN')
    before = SqliteTrialStore(database.study_db_path('mystudy')).load()
    database.drop('mystudy')
    database.restore(dump, 'mystudy')
    after = SqliteTrialStore(database.study_db_path('mystudy')).load()
    assert after == before and len(after) == 4


def test_create_initializes_db(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = database.create('fresh')
    db = database.study_db_path('fresh')
    assert os.path.isdir(path) and os.path.exists(db)
    # Schema is live: an empty study loads cleanly.
    assert SqliteTrialStore(db).load() == []
    database.drop('fresh')
    assert not os.path.isdir(path)
