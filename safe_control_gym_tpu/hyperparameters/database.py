"""Study storage management — parity role of hyperparameters/database.py
(53 LoC reference: MySQL study-database create/drop helpers).

The TPU build persists studies as fcntl-locked JSON files (study.py):
multiple HPO worker processes can share one study — each optimize()
iteration merges the other workers' trials by uid under the lock before
sampling, the role the reference's MySQL server plays. These helpers
manage that storage with the same create/drop API surface.
"""

from __future__ import annotations

import os
import shutil

__all__ = ['create', 'drop']


def _study_dir(config_or_name) -> str:
    if isinstance(config_or_name, str):
        name = config_or_name
    else:
        name = getattr(config_or_name, 'tag', None) or \
            config_or_name.get('tag', 'study')
    return os.path.join('./hpo_storage', f'{name}_hpo')


def create(config_or_name) -> str:
    """Create the study storage directory; returns its path
    (database.py:10-30 role)."""
    path = _study_dir(config_or_name)
    os.makedirs(path, exist_ok=True)
    return path


def drop(config_or_name) -> None:
    """Remove the study storage (database.py:33-53 role)."""
    path = _study_dir(config_or_name)
    if os.path.isdir(path):
        shutil.rmtree(path)
