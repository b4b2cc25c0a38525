"""Performance metrics (reference
math_and_models/metrics/performance_metrics.py:6-36)."""

from __future__ import annotations

import numpy as np

__all__ = ['compute_cvar']


def compute_cvar(data: np.ndarray, alpha: float, lower_range: bool = True) -> float:
    """Conditional value at risk of ``data`` at level ``alpha``.

    ``lower_range=True`` averages the worst (lowest) alpha-fraction;
    ``lower_range=False`` averages the upper tail (used for worst-case RMSE,
    base_experiment.py:417).
    """
    data = np.asarray(data, dtype=float)
    assert 0 < alpha <= 1
    sorted_data = np.sort(data)  # ascending
    n = len(sorted_data)
    k = int(np.ceil(n * alpha))
    if k == 0:
        return float('nan')
    if lower_range:
        return float(sorted_data[:k].mean())
    return float(sorted_data[-k:].mean())
