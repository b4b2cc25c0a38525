"""Vec-env utilities — parity with
envs/env_wrappers/vectorized_env/vec_env_utils.py (98 LoC reference).
"""

from __future__ import annotations

import contextlib
import os
from collections import OrderedDict

import numpy as np

__all__ = ['CloudpickleWrapper', '_flatten_obs', '_unflatten_obs',
           'tile_images', 'clear_mpi_env_vars']


class CloudpickleWrapper:
    """Uses cloudpickle to serialize contents (for multiprocessing)."""

    def __init__(self, x):
        self.x = x

    def __getstate__(self):
        import cloudpickle
        return cloudpickle.dumps(self.x)

    def __setstate__(self, ob):
        import pickle
        self.x = pickle.loads(ob)


def _flatten_obs(obs, space):
    """Stack a list of observations (dict/tuple/array spaces)."""
    assert isinstance(obs, (list, tuple)), 'expected list or tuple of observations'
    assert len(obs) > 0, 'need observations from at least one environment'
    if isinstance(obs[0], dict):
        keys = obs[0].keys()
        return OrderedDict([(k, np.stack([o[k] for o in obs])) for k in keys])
    if isinstance(obs[0], tuple):
        obs_len = len(obs[0])
        return tuple(np.stack([o[i] for o in obs]) for i in range(obs_len))
    return np.stack(obs)


def _unflatten_obs(obs):
    """Inverse of _flatten_obs for array observations."""
    if isinstance(obs, dict):
        n = len(next(iter(obs.values())))
        return [{k: v[i] for k, v in obs.items()} for i in range(n)]
    if isinstance(obs, tuple):
        n = len(obs[0])
        return [tuple(o[i] for o in obs) for i in range(n)]
    return [o for o in obs]


def tile_images(img_nhwc):
    """Tile N images into a grid (for vec env rendering)."""
    img_nhwc = np.asarray(img_nhwc)
    n, h, w, c = img_nhwc.shape
    H = int(np.ceil(np.sqrt(n)))
    W = int(np.ceil(float(n) / H))
    img_nhwc = np.array(list(img_nhwc)
                        + [img_nhwc[0] * 0 for _ in range(n, H * W)])
    out = img_nhwc.reshape(H, W, h, w, c)
    out = out.transpose(0, 2, 1, 3, 4)
    return out.reshape(H * h, W * w, c)


@contextlib.contextmanager
def clear_mpi_env_vars():
    """Temporarily strip MPI_/PMI_ env vars so subprocess spawns don't
    confuse an inherited MPI context (vec_env_utils parity)."""
    removed = {}
    for k, v in list(os.environ.items()):
        for prefix in ('OMPI_', 'PMI_'):
            if k.startswith(prefix):
                removed[k] = v
                del os.environ[k]
    try:
        yield
    finally:
        os.environ.update(removed)
