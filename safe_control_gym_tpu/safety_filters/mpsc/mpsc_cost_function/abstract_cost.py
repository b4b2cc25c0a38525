"""Abstract MPSC cost function
(safety_filters/mpsc/mpsc_cost_function/abstract_cost.py:8-45 parity)."""

from __future__ import annotations

from abc import ABC, abstractmethod

__all__ = ['MPSC_COST']


class MPSC_COST(ABC):
    """Abstract MPSC cost function class."""

    def __init__(self, env=None):
        self.env = env

    @abstractmethod
    def get_cost(self, opti_dict):
        """Return the cost terms for the MPSC optimization.

        In the TPU build this returns the quadratic data (H, f, const) of the
        cost in the first-step decision variables rather than a CasADi
        expression — consumed by the jitted QP assembly in linear_mpsc.
        """
        raise NotImplementedError

    def prepare_cost_variables(self, opti_dict, obs, iteration):
        """Hook to update cost parameters before solving."""
        return
