"""Neural networks as pure JAX pytrees.

Replaces math_and_models/neural_networks.py (torch MLP/CNN/RNN) with
init/apply-style modules: parameters are plain dict pytrees, so they compose
directly with optax, vmap over agent populations (RAP), and pjit sharding.
MXU note: all dense layers use explicit f32 accumulation
(``preferred_element_type``) so XLA tiles them onto the systolic array
correctly even under bf16 params.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['mlp_init', 'mlp_apply', 'cnn_init', 'cnn_apply', 'ACTIVATIONS',
           'rnn_init', 'rnn_apply']

ACTIVATIONS = {
    'tanh': jnp.tanh,
    'relu': jax.nn.relu,
    'elu': jax.nn.elu,
    'gelu': jax.nn.gelu,
    'sigmoid': jax.nn.sigmoid,
    'identity': lambda x: x,
}


def _orthogonal(key, shape, gain=1.0, dtype=jnp.float32):
    """Orthogonal init (neural_networks.py:40-47 init_ semantics)."""
    n_rows, n_cols = shape
    mat = jax.random.normal(key, (max(n_rows, n_cols), min(n_rows, n_cols)))
    q, r = jnp.linalg.qr(mat)
    q = q * jnp.sign(jnp.diag(r))
    if n_rows < n_cols:
        q = q.T
    return (gain * q[:n_rows, :n_cols]).astype(dtype)


def mlp_init(key, in_dim: int, out_dim: int, hidden_dims: Sequence[int],
             init_std: float = np.sqrt(2), out_gain: float = 0.01,
             orthogonal: bool = True, dtype=jnp.float32):
    """Initialize MLP params: list of {'w', 'b'} dicts
    (MLP semantics, neural_networks.py:18-54)."""
    dims = [in_dim] + list(hidden_dims) + [out_dim]
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, k in enumerate(keys):
        shape = (dims[i], dims[i + 1])
        last = i == len(keys) - 1
        if orthogonal:
            gain = out_gain if last else init_std
            w = _orthogonal(k, shape, gain=gain, dtype=dtype)
        else:
            bound = 1.0 / np.sqrt(dims[i])
            w = jax.random.uniform(k, shape, minval=-bound, maxval=bound,
                                   dtype=dtype)
        params.append({'w': w, 'b': jnp.zeros(dims[i + 1], dtype=dtype)})
    return params


def mlp_apply(params, x, activation: str = 'tanh', out_activation: str = 'identity'):
    """Forward pass. Works on any leading batch shape."""
    act = ACTIVATIONS[activation]
    out_act = ACTIVATIONS[out_activation]
    h = x
    for layer in params[:-1]:
        h = act(jnp.dot(h, layer['w'], preferred_element_type=jnp.float32)
                + layer['b'])
    last = params[-1]
    return out_act(jnp.dot(h, last['w'], preferred_element_type=jnp.float32)
                   + last['b'])


def cnn_init(key, input_hwc, out_dim: int,
             channels=(32, 64), kernel_sizes=(8, 4), strides=(4, 2),
             dtype=jnp.float32):
    """Conv stack + dense head (CNN parity, neural_networks.py:57-84).

    ``input_hwc``: (H, W, C) of the input images — the flatten dim of the
    dense head is derived from it at init time.
    """
    H, W, c_in = input_hwc
    params = []
    keys = jax.random.split(key, len(channels) + 1)
    for k, c_out, ks, st in zip(keys[:-1], channels, kernel_sizes, strides):
        fan_in = c_in * ks * ks
        bound = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(k, (ks, ks, c_in, c_out), minval=-bound,
                               maxval=bound, dtype=dtype)
        params.append({'w': w, 'b': jnp.zeros(c_out, dtype=dtype)})
        c_in = c_out
        H = (H - ks) // st + 1
        W = (W - ks) // st + 1
    head = mlp_init(keys[-1], H * W * c_in, out_dim, [], orthogonal=False)
    return {'convs': params, 'head': head, 'strides': tuple(strides)}


def cnn_apply(params, x, activation: str = 'relu'):
    """Forward an NHWC image batch through convs + dense head."""
    act = ACTIVATIONS[activation]
    h = x
    for conv, stride in zip(params['convs'], params['strides']):
        h = jax.lax.conv_general_dilated(
            h, conv['w'], window_strides=(stride, stride), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        h = act(h + conv['b'])
    h = h.reshape(h.shape[0], -1)
    return mlp_apply(params['head'], h, activation='identity')


def rnn_init(key, in_dim: int, hidden_dim: int, dtype=jnp.float32):
    """GRU cell params (masked-segment RNN, neural_networks.py:87-138)."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / np.sqrt(hidden_dim)
    return {
        'wi': jax.random.uniform(k1, (in_dim, 3 * hidden_dim),
                                 minval=-scale, maxval=scale, dtype=dtype),
        'wh': jax.random.uniform(k2, (hidden_dim, 3 * hidden_dim),
                                 minval=-scale, maxval=scale, dtype=dtype),
        'b': jnp.zeros(3 * hidden_dim, dtype=dtype),
    }


def rnn_apply(params, x_seq, h0, masks=None):
    """Run a GRU over a (T, B, in_dim) sequence; ``masks`` (T, B, 1) resets
    hidden state at episode boundaries (masked-segment semantics)."""
    H = h0.shape[-1]

    def cell(h, inputs):
        x, m = inputs
        h = h * m  # reset hidden state at episode boundaries
        gx = x @ params['wi'] + params['b']
        gh = h @ params['wh']
        rx, zx, nx = jnp.split(gx, 3, axis=-1)
        rh, zh, nh = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(rx + rh)
        z = jax.nn.sigmoid(zx + zh)
        n = jnp.tanh(nx + r * nh)
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    if masks is None:
        masks = jnp.ones(x_seq.shape[:-1] + (1,), x_seq.dtype)
    h_last, h_seq = jax.lax.scan(cell, h0, (x_seq, masks))
    return h_seq, h_last
