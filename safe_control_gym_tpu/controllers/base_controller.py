"""Base controller ABC — parity with controllers/base_controller.py:8-196.

Differences from the reference: no torch device plumbing (controllers are
JAX; `use_gpu` is accepted for config parity and ignored — placement is
XLA's job), and `get_prior` randomization uses an explicit numpy Generator
seeded from the controller seed rather than env.np_random.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Any, Callable, Dict

import numpy as np

__all__ = ['BaseController']


class BaseController(ABC):
    """Template for controller/agent."""

    def __init__(self,
                 env_func: Callable,
                 training: bool = True,
                 checkpoint_path: str = 'temp/model_latest.pt',
                 output_dir: str = 'temp',
                 use_gpu: bool = False,
                 seed: int = 0,
                 **kwargs):
        self.env_func = env_func
        self.training = training
        # Bare filenames resolve under output_dir so end-of-training saves
        # never land in the caller's CWD.
        if checkpoint_path and not os.path.dirname(checkpoint_path):
            checkpoint_path = os.path.join(output_dir, checkpoint_path)
        self.checkpoint_path = checkpoint_path
        self.output_dir = output_dir
        self.use_gpu = use_gpu
        self.seed = seed if seed is not None else 0
        self.prior_info: Dict[str, Any] = {}
        # Algorithm-specific args splatted into attributes
        # (base_controller.py:40-42).
        for key, value in kwargs.items():
            self.__dict__[key] = value
        self.setup_results_dict()

    @abstractmethod
    def select_action(self, obs, info=None):
        raise NotImplementedError

    def extract_step(self, info=None) -> int:
        """Current step from the env info (base_controller.py:62-77)."""
        if info is not None:
            return info['current_step']
        return 0

    def learn(self, env=None, **kwargs):
        return

    @abstractmethod
    def reset(self):
        raise NotImplementedError

    def reset_before_run(self, obs=None, info=None, env=None):
        self.setup_results_dict()

    @abstractmethod
    def close(self):
        raise NotImplementedError

    def save(self, path):
        return

    def load(self, path):
        return

    def setup_results_dict(self):
        self.results_dict: Dict[str, Any] = {}

    def get_prior(self, env, prior_info={}):
        """Fetch (and optionally perturb) the prior model from the env
        (base_controller.py:134-196). ``prior_info`` keys: prior_prop,
        randomize_prior_prop, prior_prop_rand_info."""
        if not prior_info:
            prior_info = getattr(self, 'prior_info', {}) or {}
        prior_prop = dict(prior_info.get('prior_prop', {}) or {})
        randomize = prior_info.get('randomize_prior_prop', False)
        rand_info = prior_info.get('prior_prop_rand_info', {}) or {}
        if randomize and rand_info:
            for k in rand_info:
                assert k in prior_prop, \
                    'A prior param to randomize does not have a base value in prior_prop.'
            rng = np.random.default_rng(self.seed)
            for k, info in rand_info.items():
                info = dict(info)
                distrib = getattr(rng, info.pop('distrib'))
                args = info.pop('args', [])
                prior_prop[k] += distrib(*args, **info)
        if prior_prop:
            env._setup_symbolic(prior_prop=prior_prop)
        return env.symbolic
