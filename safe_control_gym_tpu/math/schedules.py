"""Parameter schedules (math_and_models/schedule.py:8-44 parity)."""

from __future__ import annotations

__all__ = ['ConstantSchedule', 'LinearSchedule']


class ConstantSchedule:
    def __init__(self, val):
        self.val = val

    def __call__(self, steps=1):
        return self.val


class LinearSchedule:
    """Linear interpolation from start to end over n steps."""

    def __init__(self, start, end=None, steps=None):
        if end is None:
            end = start
            steps = 1
        self.inc = (end - start) / float(steps)
        self.current = start
        self.end = end
        self.bound = min if end > start else max

    def __call__(self, steps=1):
        val = self.current
        self.current = self.bound(self.current + self.inc * steps, self.end)
        return val
