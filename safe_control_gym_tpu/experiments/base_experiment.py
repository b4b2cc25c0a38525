"""Experiment harness — parity rebuild of experiments/base_experiment.py
(BaseExperiment :16-307, RecordDataWrapper :310-377, MetricExtractor
:380-493).

BaseExperiment standardizes evaluation/training over (env, ctrl, optional
train_env, optional safety_filter); it wraps the env in RecordDataWrapper
and computes the standard metric dict {average_length, average_return,
average_rmse, rmse_std, worst_case_rmse_at_0.5 (CVaR), failure_rate,
average_constraint_violation, constraint_violation_std} via MetricExtractor.

Design note: this harness is intentionally host-side and sequential — it
is the *measurement* path, where per-step info dicts, wall-clock pacing,
and arbitrary controller/filter combinations matter more than throughput.
The TPU-native *training/benchmark* paths never go through it: RL
controllers roll out with fused ``lax.scan`` programs over vmapped env
batches, and batched controller evaluation vmaps the functional env core
directly (see ``experiments/benchmark_suite.py``). The two paths share the
same underlying pure step function, so what this harness measures is
exactly what the fused programs execute — the shim only mirrors the latest
``StepOut`` into numpy/info-dict form for the metric extractor.

Structure (this repo's idiom, not the reference's): the recorded step
channels and the per-episode metric reducers are declarative tables
(``RecordDataWrapper.STEP_CHANNELS``, ``MetricExtractor`` reducers) rather
than inline bookkeeping loops, and all component plumbing (reset/close/
save/load across ctrl, filter, and the two envs) iterates one component
table instead of repeating null-guard blocks per method.

Certification plumbing matches the reference: actions are denormalized
before the safety filter sees them and renormalized after
(base_experiment.py:167-194), so filters always reason in physical units
regardless of the controller's action space convention.
"""

from __future__ import annotations

import time
from collections import defaultdict
from copy import deepcopy

import numpy as np

import gymnasium as gym

from safe_control_gym_tpu.math.metrics import compute_cvar
from safe_control_gym_tpu.utils.utils import is_wrapped, munchify

__all__ = ['BaseExperiment', 'RecordDataWrapper', 'MetricExtractor']


def _recorded(env):
    """Idempotently wrap an env in RecordDataWrapper (None passes through)."""
    if env is None or is_wrapped(env, RecordDataWrapper):
        return env
    return RecordDataWrapper(env)


def _print_metrics(metrics):
    """Round + print the standard metric dict (run_evaluation verbose mode)."""
    for name, value in metrics.items():
        if isinstance(value, (list, np.ndarray)):
            print(f'{name}: {[f"{v:.3f}" for v in np.atleast_1d(value)]}')
        else:
            print(f'{name}: {value:.3f}')
    print('Evaluation done.')


class _ResultsTape:
    """Collects per-run snapshots of the controller's (and optionally the
    safety filter's) ``results_dict``.

    One snapshot is taken at every episode boundary — and once more when a
    step budget runs out mid-episode — so each key in the tape holds a list
    with one numpy copy per run, matching the ``controller_data`` /
    ``safety_filter_data`` layout downstream analysis expects
    (reference base_experiment.py:159-163, 208-213).
    """

    def __init__(self, ctrl, safety_filter=None):
        self._sources = {'controller_data': ctrl}
        if safety_filter is not None:
            self._sources['safety_filter_data'] = safety_filter
        self._tapes = {name: defaultdict(list) for name in self._sources}
        self.enabled = False  # the very first reset precedes any run

    def snapshot(self):
        if not self.enabled:
            return
        for name, source in self._sources.items():
            tape = self._tapes[name]
            for key, val in source.results_dict.items():
                tape[key].append(np.array(deepcopy(val)))

    def attach(self, trajs_data):
        """Merge the recorded tapes into the trajectory-data dict."""
        for name, tape in self._tapes.items():
            trajs_data[name] = munchify(dict(tape))
        return munchify(trajs_data)


class BaseExperiment:
    """Generic experiment class running evaluations + collecting metrics."""

    def __init__(self, env, ctrl, train_env=None, safety_filter=None,
                 verbose: bool = False):
        self.env = _recorded(env)
        self.train_env = _recorded(train_env)
        self.ctrl = ctrl
        self.safety_filter = safety_filter
        self.verbose = verbose
        self.metric_extractor = MetricExtractor()
        self.MAX_STEPS = int(env.CTRL_FREQ * env.EPISODE_LEN_SEC)
        # Real-time pacing state for GUI evaluation
        # (reference base_experiment.py:57,185-192).
        self.visualization_time_multiplier = 1
        self._last_step_wall = None

    # -- component plumbing -------------------------------------------
    # Every lifecycle method acts on the same participant set; one table
    # replaces the reference's per-method null-guard blocks.

    def _parts(self):
        """(name, component) pairs present on this experiment, in the
        lifecycle order reset/close act on them."""
        for name in ('env', 'ctrl', 'safety_filter', 'train_env'):
            part = getattr(self, name)
            if part is not None:
                yield name, part

    def reset(self):
        for name, part in self._parts():
            part.reset()
            if name.endswith('env'):
                part.clear_data()

    def close(self):
        for _, part in self._parts():
            part.close()

    def load(self, ctrl_path=None, safety_filter_path=None):
        self._move_artifacts('load', ctrl_path, safety_filter_path)

    def save(self, ctrl_path=None, safety_filter_path=None):
        self._move_artifacts('save', ctrl_path, safety_filter_path)

    def _move_artifacts(self, direction, ctrl_path, safety_filter_path):
        for part, path in ((self.ctrl, ctrl_path),
                           (self.safety_filter, safety_filter_path)):
            if path is not None:
                getattr(part, direction)(path)

    # -- evaluation ----------------------------------------------------

    def run_evaluation(self, training=False, n_episodes=None, n_steps=None,
                       done_on_max_steps=None, log_freq=None, verbose=True,
                       visualization_time_multiplier=1, **kwargs):
        """Evaluate a trained controller (base_experiment.py:49-89).

        Args:
            visualization_time_multiplier (float): pacing for GUI runs — 1
                is realtime, 2 twice realtime, ...; None runs unpaced
                (reference base_experiment.py:57,64-66). Only applies when
                the env was built with ``gui=True``.
        """
        self.visualization_time_multiplier = visualization_time_multiplier
        self._last_step_wall = None
        if not training:
            self.reset()
        trajs_data = self._execute_evaluations(
            log_freq=log_freq, n_episodes=n_episodes, n_steps=n_steps,
            done_on_max_steps=done_on_max_steps, **kwargs)
        metrics = self.compute_metrics(trajs_data)
        if verbose:
            _print_metrics(metrics)
        return dict(trajs_data), metrics

    def _execute_evaluations(self, n_episodes=None, n_steps=None,
                             done_on_max_steps=None, log_freq=None, seeds=None):
        """Run rollouts until the episode or step budget is exhausted.

        Single unified loop over control steps; episode-boundary and
        budget-exhaustion bookkeeping live in the two ``_on_*`` handlers
        below, with all results_dict snapshotting delegated to one
        ``_ResultsTape``. Covers the role of reference
        base_experiment.py:90-165 (n_episodes XOR n_steps budgets, the
        log_freq sub-step loop, the reference's budget-counter reset on
        episode end) with a seed-plumbing fix: episode seeds are applied
        to every reset, not only the first.
        """
        if (n_episodes is None) == (n_steps is None):
            raise ValueError(
                'Exactly one of n_episodes or n_steps must be defined.')
        if seeds is not None:
            assert len(seeds) == n_episodes, \
                'Number of seeds must match the number of episodes'

        sim_steps = log_freq // self.env.CTRL_FREQ if log_freq else 1
        self._tape = _ResultsTape(self.ctrl, self.safety_filter)
        self._episode_steps = 0   # steps since the last reset/done
        self._episodes_done = 0
        self._seeds = seeds
        obs, info = self._evaluation_reset(
            seed=seeds[0] if seeds is not None else None)
        self._tape.enabled = True

        budget_left = ((lambda: self._episodes_done < n_episodes)
                       if n_episodes is not None
                       else (lambda: self._episode_steps < n_steps))
        while budget_left():
            action = self._select_action(obs=obs, info=info)
            # Sub-step loop: one logged control step per log_freq tick.
            for _ in range(sim_steps):
                self._episode_steps += 1
                obs, _, done, info = self.env.step(action)
                if n_steps is not None and self._episode_steps >= n_steps:
                    # Step budget exhausted mid-episode: close out the data
                    # without resetting (reference :146-152 semantics).
                    self.env.save_data()
                    self._tape.snapshot()
                    break
                if done_on_max_steps:
                    done = done and self._episode_steps >= self.MAX_STEPS
                if done:
                    obs, info = self._on_episode_end(n_episodes)
                    break

        return self._tape.attach(self.env.data)

    def _on_episode_end(self, n_episodes):
        """Roll the episode data, pick the next seed, reset everything."""
        self._episodes_done += 1
        self._episode_steps = 0
        self.env.save_data()
        next_seed = None
        if self._seeds is not None and n_episodes is not None \
                and self._episodes_done < n_episodes:
            next_seed = self._seeds[self._episodes_done]
        return self._evaluation_reset(seed=next_seed)

    def _select_action(self, obs, info):
        """Controller action, optionally certified by the safety filter
        (base_experiment.py:167-194): denormalize -> certify on obs[:nx] ->
        renormalize. GUI runs are paced to
        ``visualization_time_multiplier`` x realtime (reference :185-192)."""
        action = self.ctrl.select_action(obs, info)
        if self.safety_filter is not None:
            certified, ok = self.safety_filter.certify_action(
                np.asarray(obs)[:self.env.symbolic.nx],
                self.env.denormalize_action(action), info)
            if ok:
                action = self.env.normalize_action(certified)
        self._pace_visualization()
        return action

    def _pace_visualization(self):
        """Sleep so GUI evaluation advances at k-by-realtime; no-op for
        headless envs or ``visualization_time_multiplier=None``."""
        mult = self.visualization_time_multiplier
        now = time.time()
        if self._last_step_wall is not None \
                and getattr(self.env, 'GUI', False) is True and mult is not None:
            elapsed = now - self._last_step_wall
            time.sleep(max(0.0, 1.0 / self.env.CTRL_FREQ / mult - elapsed))
            now = time.time()
        self._last_step_wall = now

    def _evaluation_reset(self, seed=None):
        """Snapshot results, then reset env + controller + filter between
        runs (base_experiment.py:196-219)."""
        tape = getattr(self, '_tape', None)
        if tape is not None:
            tape.snapshot()
        obs, info = self.env.reset(seed=seed)
        self.ctrl.reset_before_run(obs, info, env=self.env)
        if self.safety_filter is not None:
            self.safety_filter.reset_before_run(env=self.env)
        return obs, info

    # -- training ------------------------------------------------------

    def launch_training(self, **kwargs):
        """Delegate training to the controller/filter learn()
        (base_experiment.py:221-239)."""
        self.reset()
        for _, part in self._parts():
            if hasattr(part, 'learn'):
                part.learn(env=self.train_env, **kwargs)
        print('Training done.')
        return dict(self.train_env.data if self.train_env is not None else {})

    def compute_metrics(self, trajs_data):
        return self.metric_extractor.compute_metrics(data=trajs_data,
                                                     verbose=self.verbose)


class RecordDataWrapper(gym.Wrapper):
    """Standardized per-step data logging (base_experiment.py:310-377).

    Each recorded channel is one row of the declarative tables below:
    the key it lands under in ``episode_data`` and a grabber over the
    transition. ``save_data`` rolls the open episode into ``data`` as
    per-episode numpy arrays (info dicts as object arrays).
    """

    #: reset-time channels: key -> grab(env, obs, info)
    RESET_CHANNELS = (
        ('obs', lambda env, obs, info: obs),
        ('info', lambda env, obs, info: info),
        ('state', lambda env, obs, info: env.state),
    )
    #: step-time channels: key -> grab(env, transition) where transition
    #: is the (obs, reward, done, info) tuple returned by env.step.
    STEP_CHANNELS = (
        ('obs', lambda env, t: t[0]),
        ('action', lambda env, t: env.current_raw_action),
        ('done', lambda env, t: float(t[2])),
        ('info', lambda env, t: t[3]),
        ('reward', lambda env, t: t[1]),
        ('length', lambda env, t: 1),
        ('state', lambda env, t: env.state),
        ('current_physical_action',
         lambda env, t: env.current_physical_action),
        ('current_noisy_physical_action',
         lambda env, t: env.current_noisy_physical_action),
        ('current_clipped_action',
         lambda env, t: env.current_clipped_action),
        ('timestamp', lambda env, t: time.time()),
    )

    def __init__(self, env):
        super().__init__(env)
        self.clear_data()

    def __getattr__(self, name):
        # Gymnasium >=1.0 wrappers no longer forward arbitrary attributes;
        # the reference relies on implicit forwarding (env.state,
        # env.denormalize_action, env.X_GOAL, ...), so restore it here.
        if name.startswith('_'):
            raise AttributeError(name)
        return getattr(self.env, name)

    def clear_data(self):
        self.data = defaultdict(list)
        self.episode_data = defaultdict(list)

    def save_data(self):
        """Roll the open episode's channels into the per-episode arrays."""
        if not self.episode_data:
            return
        episode, self.episode_data = self.episode_data, defaultdict(list)
        for key, steps in episode.items():
            as_array = np.array(deepcopy(steps),
                                dtype=object if key == 'info' else None)
            self.data[key].append(as_array)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        info.pop('symbolic_model', None)
        info.pop('symbolic_constraints', None)
        for key, grab in self.RESET_CHANNELS:
            self.episode_data[key].append(grab(self.env, obs, info))
        return obs, info

    def step(self, action):
        transition = self.env.step(action)
        for key, grab in self.STEP_CHANNELS:
            self.episode_data[key].append(grab(self.env, transition))
        return transition


class MetricExtractor:
    """Standard metrics from recorded trajectory data
    (base_experiment.py:380-493).

    Operates purely on the RecordDataWrapper's episode-major arrays: each
    key maps to a list of per-episode numpy arrays, and per-step scalars
    (``mse``, ``constraint_violation``) are pulled from either top-level
    keys or the per-step info dicts, whichever the wrapper recorded —
    identical lookup order to the reference so downstream analysis scripts
    see the same numbers from both frameworks.
    """

    def compute_metrics(self, data, verbose=False):
        self.data = data
        self.verbose = verbose
        lengths = self.get_episode_lengths()
        rmse = self.get_episode_rmse()
        violations = self.get_episode_constraint_violation_steps()

        def per_episode_or_scalar(seq):
            # Multi-episode runs report the vector; single-episode runs
            # report the bare value (reference metric-dict convention).
            return seq if len(seq) > 1 else seq[0]

        return {
            'average_length': np.asarray(lengths).mean(),
            'length': per_episode_or_scalar(lengths),
            'average_return': np.asarray(self.get_episode_returns()).mean(),
            'average_rmse': np.asarray(rmse).mean(),
            'rmse': per_episode_or_scalar(np.asarray(rmse)),
            'rmse_std': np.asarray(rmse).std(),
            'worst_case_rmse_at_0.5': compute_cvar(np.asarray(rmse), 0.5,
                                                   lower_range=False),
            'failure_rate':
                np.asarray(self.get_episode_constraint_violations()).mean(),
            'average_constraint_violation': np.asarray(violations).mean(),
            'constraint_violation_std': np.asarray(violations).std(),
            'constraint_violation':
                per_episode_or_scalar(np.asarray(violations)),
        }

    def get_episode_data(self, key, postprocess_func=lambda x: x):
        """Per-episode reduction of one recorded channel: top-level
        channels first, then per-step info-dict entries."""
        if key in self.data:
            return [postprocess_func(ep) for ep in self.data[key]]
        if key in self.data['info'][0][-1]:
            return [postprocess_func(self._from_infos(ep_info, key))
                    for ep_info in self.data['info']]
        raise KeyError(f"Given data key '{key}' does not exist in recorded trajectory data.")

    def _from_infos(self, ep_info, key):
        """One episode's per-step values of an info-dict channel."""
        values = []
        for info in ep_info:
            if key in info:
                values.append(info[key])
            elif self.verbose:
                print(f'[Warn] MetricExtractor.get_episode_data: '
                      f'key {key} not in info dict.')
        return values

    # Per-channel accessors (reference API): channel key + episode reducer.

    def get_episode_lengths(self):
        return self.get_episode_data('length', sum)

    def get_episode_returns(self):
        return self.get_episode_data('reward', sum)

    def get_episode_rmse(self):
        return self.get_episode_data(
            'mse', lambda steps: float(np.sqrt(np.mean(steps))))

    def get_episode_constraint_violations(self):
        return self.get_episode_data(
            'constraint_violation', lambda steps: float(any(steps)))

    def get_episode_constraint_violation_steps(self):
        return self.get_episode_data('constraint_violation', sum)
