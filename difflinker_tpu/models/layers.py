"""Parameter initialisation and primitive layers.

Parameters are plain nested dicts of jnp arrays ("param pytrees"); every model
in this package is a pure function ``apply(params, *inputs) -> outputs``. This
keeps the torch-checkpoint name map trivial (io/lightning_import.py) and makes
sharding/jit transparent.

Initialisers reproduce torch defaults so that randomly-initialised models are
statistically comparable with the reference:
  * nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ...)
    for weights, U(-1/sqrt(fan_in), ...) for bias.
  * the EquivariantUpdate output layer: xavier_uniform with gain 0.001 and no
    bias (src/egnn.py:90-91).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def init_linear(key, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.float32):
    """torch nn.Linear default init; weight stored (in, out)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {'w': jax.random.uniform(wkey, (in_features, out_features), dtype,
                                 -bound, bound)}
    if bias:
        p['b'] = jax.random.uniform(bkey, (out_features,), dtype, -bound, bound)
    return p


def init_xavier_linear(key, in_features: int, out_features: int,
                       gain: float = 1.0, dtype=jnp.float32):
    """xavier_uniform, no bias."""
    a = gain * math.sqrt(6.0 / (in_features + out_features))
    return {'w': jax.random.uniform(key, (in_features, out_features), dtype, -a, a)}


def init_batch_norm(num_features: int, dtype=jnp.float32):
    """Returns (trainable params, running state) for a BatchNorm1d."""
    params = {'scale': jnp.ones((num_features,), dtype),
              'bias': jnp.zeros((num_features,), dtype)}
    state = {'mean': jnp.zeros((num_features,), dtype),
             'var': jnp.ones((num_features,), dtype),
             'count': jnp.zeros((), jnp.int32)}
    return params, state


def linear(p, x):
    y = x @ p['w']
    if 'b' in p:
        y = y + p['b']
    return y


def batch_norm(p, state, x, row_mask: Optional[jnp.ndarray], train: bool,
               momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over all leading dims (torch BatchNorm1d semantics on (R, C)).

    NOTE: the reference applies BN over every (B·N) row *including padding*
    (node masking happens after the GCL, src/egnn.py:31-38,78-79). We replicate
    that — pass row_mask=None for exact parity; a masked variant is available
    for models trained natively in this framework.
    """
    if train:
        flat = x.reshape(-1, x.shape[-1])
        if row_mask is not None:
            m = row_mask.reshape(-1, 1)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(flat * m, axis=0) / count
            var = jnp.sum(((flat - mean) ** 2) * m, axis=0) / count
        else:
            count = jnp.asarray(flat.shape[0], x.dtype)
            mean = jnp.mean(flat, axis=0)
            var = jnp.var(flat, axis=0)
        # torch tracks *unbiased* variance in running stats.
        unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
        new_state = {
            'mean': (1 - momentum) * state['mean'] + momentum * mean,
            'var': (1 - momentum) * state['var'] + momentum * unbiased,
            'count': state['count'] + 1,
        }
    else:
        mean, var = state['mean'], state['var']
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']
    return y, new_state


def activation_fn(name: str):
    if name == 'silu':
        return jax.nn.silu
    if name == 'relu':
        return jax.nn.relu
    raise ValueError(f'unsupported activation {name!r}')


def sinusoidal_distance_embedding(d2: jnp.ndarray) -> jnp.ndarray:
    """Distance sinusoid features (reference SinusoidsEmbeddingNew,
    src/egnn.py:281-292): d = sqrt(d2 + 1e-8); emb = [sin(d f_k), cos(d f_k)]
    with f_k = 2π 4^k / 15, k = 0..5. Input (..., 1) -> output (..., 12)."""
    max_res, min_res, div = 15.0, 15.0 / 2000.0, 4.0
    n_freq = int(math.log(max_res / min_res, div)) + 1
    freqs = 2.0 * math.pi * (div ** jnp.arange(n_freq, dtype=d2.dtype)) / max_res
    d = jnp.sqrt(d2 + 1e-8)
    ang = d * freqs  # broadcast (..., 1) * (n_freq,) -> (..., n_freq)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
