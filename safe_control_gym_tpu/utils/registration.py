"""Registry of environments, controllers, and safety filters.

Rebuild of utils/registration.py:79-139: a global ``Registry`` of ``Spec``s
mapping an id to an ``entry_point`` ("module:Class") plus an optional
``config_entry_point`` ("module:file.yaml") holding the default config.
Module-level ``register/make/spec/get_config`` mirror the reference API.
"""

from __future__ import annotations

import importlib
import os
from typing import Any, Dict, Optional

import yaml

__all__ = ['Spec', 'Registry', 'register', 'make', 'spec', 'get_config',
           'registry']


def _load_entry_point(entry_point: str):
    mod_name, attr = entry_point.split(':')
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)


class Spec:
    """A specification for a particular instance of the environment/controller
    (registration.py:20-76)."""

    def __init__(self, idx: str, entry_point: str,
                 config_entry_point: Optional[str] = None):
        self.idx = idx
        self.entry_point = entry_point
        self.config_entry_point = config_entry_point

    def get_config(self) -> Dict[str, Any]:
        """Load the default YAML config for this spec
        (registration.py:43-59)."""
        if self.config_entry_point is None:
            return {}
        mod_name, fname = self.config_entry_point.split(':')
        mod = importlib.import_module(mod_name)
        path = os.path.join(os.path.dirname(mod.__file__), fname)
        with open(path, 'r') as f:
            return yaml.safe_load(f) or {}

    def make(self, *args, **kwargs):
        cls = _load_entry_point(self.entry_point)
        return cls(*args, **kwargs)

    def __repr__(self):
        return f'Spec({self.idx})'


class Registry:
    """Global id -> Spec registry (registration.py:79-115)."""

    def __init__(self):
        self.specs: Dict[str, Spec] = {}

    def register(self, idx: str, entry_point: str,
                 config_entry_point: Optional[str] = None):
        if idx in self.specs:
            # Idempotent re-registration with identical target is fine.
            existing = self.specs[idx]
            if (existing.entry_point == entry_point
                    and existing.config_entry_point == config_entry_point):
                return
            raise ValueError(f'Cannot re-register id: {idx}')
        self.specs[idx] = Spec(idx, entry_point, config_entry_point)

    def get(self, idx: str) -> Spec:
        if idx not in self.specs:
            raise KeyError(f'No registered spec with id: {idx}')
        return self.specs[idx]

    def all(self):
        return self.specs.values()


registry = Registry()


def register(idx: str, entry_point: str, config_entry_point: Optional[str] = None):
    """Register an id with the global registry (registration.py:118-124)."""
    registry.register(idx, entry_point, config_entry_point)


def make(idx: str, *args, **kwargs):
    """Instantiate the class registered under id (registration.py:127-130)."""
    return registry.get(idx).make(*args, **kwargs)


def spec(idx: str) -> Spec:
    return registry.get(idx)


def get_config(idx: str) -> Dict[str, Any]:
    """Default config dict for id (registration.py:133-135)."""
    return registry.get(idx).get_config()
