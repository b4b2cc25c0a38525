"""Hyperparameter optimization — rebuild of hyperparameters/hpo.py
(295 LoC reference).

A study (TPE/Random sampler) optimizes algorithm hyperparameters with
objective = CVaR over repeated train+eval runs (hpo.py:117-158: each trial
trains the controller from scratch ``n_repetitions`` times, evaluates with
BaseExperiment over ``n_episodes``, and scores the CVaR of the returns so
flaky configs rank low). Results: trials.csv, best-hyperparameter YAML
(hpo.py:211-264). MySQL/dashboard storage is replaced by JSON persistence
(study.py); Optuna is used when available, else the native TPE.

Because training runs fully on-device, a complete PPO trial takes seconds —
the HPO loop that needed a MySQL-coordinated cluster in the reference runs
on one host.
"""

from __future__ import annotations

import csv
import os
from functools import partial

import numpy as np
import yaml

from safe_control_gym_tpu.experiments.base_experiment import BaseExperiment
from safe_control_gym_tpu.hyperparameters.hpo_sampler import \
    HYPERPARAMS_SAMPLER
from safe_control_gym_tpu.hyperparameters.study import (MedianPruner,
                                                        TrialPruned,
                                                        create_study)
from safe_control_gym_tpu.math.metrics import compute_cvar
from safe_control_gym_tpu.utils.registration import make

__all__ = ['HPO']


class HPO:
    """Hyperparameter optimization harness."""

    def __init__(self, algo, task, sampler='tpe', output_dir='./hpo',
                 task_config=None, hpo_config=None, algo_config=None,
                 **kwargs):
        self.algo = algo
        self.task = task
        self.output_dir = output_dir
        self.task_config = dict(task_config or {})
        # Registry defaults under the user's algo overrides (what the
        # reference's ConfigFactory does before HPO, hpo.py:27-60).
        try:
            from safe_control_gym_tpu.utils.registration import get_config
            self.algo_config = get_config(algo)
        except Exception:
            self.algo_config = {}
        self.algo_config.update(algo_config or {})
        self.hpo_config = dict(hpo_config or {})
        self.n_trials = int(self.hpo_config.get('trials', 20))
        self.n_repetitions = int(self.hpo_config.get('repetitions', 2))
        self.n_episodes = int(self.hpo_config.get('n_episodes', 5))
        self.cvar_alpha = float(self.hpo_config.get('alpha', 0.5))
        self.hps_config = self.hpo_config.get('hps_config', {})
        # Pruning + adaptive repetitions (reference hpo.py:27-60 configures
        # a MedianPruner; :149-158 adds dynamical extra runs near the
        # incumbent to fight maximization bias).
        self.use_pruner = bool(self.hpo_config.get('prune', True))
        self.dynamical_runs = bool(self.hpo_config.get('dynamical_runs',
                                                       False))
        self.warm_trials = int(self.hpo_config.get('warm_trials', 5))
        self.approximation_threshold = float(
            self.hpo_config.get('approximation_threshold', 5.0))
        self.max_extra_repetitions = int(
            self.hpo_config.get('max_extra_repetitions', 4))
        os.makedirs(output_dir, exist_ok=True)
        pruner = (MedianPruner(
            n_startup_trials=int(self.hpo_config.get('pruner_startup_trials',
                                                     5)),
            n_warmup_steps=int(self.hpo_config.get('pruner_warmup_steps', 0)))
            if self.use_pruner else None)
        self.study = create_study(
            study_name=f'{algo}_hpo', direction='maximize', sampler=sampler,
            seed=int(self.hpo_config.get('seed', 0)),
            storage_path=os.path.join(output_dir, 'study.json'),
            pruner=pruner)

    # ------------------------------------------------------------------
    def _one_repetition(self, trial, rep) -> list:
        """Train + evaluate once; returns the episode-return list."""
        seed = 1000 * (trial.number + 1) + rep
        env_func = partial(make, self.task, seed=seed, **self.task_config)
        cfg = {**self.algo_config, **self._suggestion}
        ctrl = make(self.algo, env_func, seed=seed,
                    output_dir=os.path.join(
                        self.output_dir, f'trial_{trial.number}'),
                    **cfg)
        if hasattr(ctrl, 'reset'):
            ctrl.reset()
        ctrl.learn()
        if hasattr(ctrl, 'run'):
            res = ctrl.run(n_episodes=self.n_episodes)
            out = np.asarray(res['ep_returns']).tolist()
        else:
            exp = BaseExperiment(env_func(), ctrl)
            _, metrics = exp.run_evaluation(n_episodes=self.n_episodes,
                                            verbose=False)
            out = [float(metrics['average_return'])]
        ctrl.close()
        return out

    def objective(self, trial) -> float:
        """One trial: repeated train+eval, CVaR score, per-repetition
        pruning reports, and extra repetitions near the incumbent
        (hpo.py:111-158)."""
        sampler_fn = HYPERPARAMS_SAMPLER[self.algo]
        self._suggestion = sampler_fn(self.hps_config, trial)
        returns = []
        cvar = 0.0
        try:
            for rep in range(self.n_repetitions):
                returns.extend(self._one_repetition(trial, rep))
                cvar = compute_cvar(np.asarray(returns), self.cvar_alpha,
                                    lower_range=True)
                # Real intermediate reporting (the reference leaves this as
                # a TODO next to its MedianPruner, hpo.py:116).
                trial.report(cvar, step=rep)
                if rep + 1 < self.n_repetitions and trial.should_prune():
                    raise TrialPruned()
            # Extra repetitions near the incumbent: better-than-best trials
            # get more runs until the CVaR estimate stabilizes
            # (hpo.py:149-158 'dynamical runs').
            if (self.dynamical_runs
                    and len(self.study.trials) >= self.warm_trials
                    and (self.study.best_value is None
                         or cvar > self.study.best_value)):
                rep = self.n_repetitions
                while rep < self.n_repetitions + self.max_extra_repetitions:
                    returns.extend(self._one_repetition(trial, rep))
                    new_cvar = compute_cvar(np.asarray(returns),
                                            self.cvar_alpha,
                                            lower_range=True)
                    trial.report(new_cvar, step=rep)
                    stable = abs(new_cvar - cvar) <= \
                        self.approximation_threshold
                    cvar = new_cvar
                    rep += 1
                    if stable:
                        break
        except TrialPruned:
            raise
        except Exception as e:
            # Crashed trials score 0 (hpo.py:111-133).
            print(f'[HPO] trial crashed: {e}')
            return 0.0
        return cvar

    # ------------------------------------------------------------------
    def hyperparameter_optimization(self):
        """Run the study + dump artifacts (hpo.py:160-264)."""
        self.study.optimize(self.objective, n_trials=self.n_trials,
                            catch=(Exception,))
        self.save_results()
        return self.study

    def save_results(self, top_n: int = 3):
        """trials.csv + top-n hyperparameter YAMLs (hpo.py:211-264)."""
        rows = self.study.trials_dataframe()
        if not rows:
            return
        keys = sorted({k for r in rows for k in r})
        with open(os.path.join(self.output_dir, 'trials.csv'), 'w',
                  newline='') as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            for r in rows:
                w.writerow(r)
        done = [r for r in rows if r.get('value') is not None]
        done.sort(key=lambda r: r['value'], reverse=True)
        for i, r in enumerate(done[:top_n]):
            params = {k: v for k, v in r.items()
                      if k not in ('number', 'value', 'state')}
            with open(os.path.join(self.output_dir,
                                   f'hyperparameters_{i}.yaml'), 'w') as f:
                yaml.dump(params, f, default_flow_style=False)

    def checkpoint(self):
        self.study._persist()
