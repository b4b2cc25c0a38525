"""RARL/RAP helpers (reference controllers/rarl/rarl_utils.py:1-23)."""

from __future__ import annotations

import numpy as np

__all__ = ['split_obs_by_adversary']


def split_obs_by_adversary(obs, assignment, num_adversaries):
    """Group a batch of observations by assigned adversary index
    (rarl_utils.split_obs_by_adversary parity)."""
    obs = np.asarray(obs)
    assignment = np.asarray(assignment)
    return [obs[assignment == i] for i in range(num_adversaries)]
