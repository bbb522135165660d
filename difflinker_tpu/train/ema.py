"""Exponential moving average of parameters + adaptive gradient clipping.

Ports of the reference's training utilities (src/utils.py:30-43 EMA;
:212-249 Queue-based adaptive clipping — defined there but unused by the
Lightning loop; here they are first-class opt-ins on the Trainer).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ema_init(params) -> Dict:
    return jax.tree.map(jnp.copy, params)


def ema_update(ema_params, params, beta: float = 0.999):
    """ma = beta * ma + (1 - beta) * new (src/utils.py:40-43)."""
    return jax.tree.map(lambda m, p: m * beta + p * (1.0 - beta),
                        ema_params, params)


class GradNormQueue:
    """Rolling gradient-norm statistics for adaptive clipping
    (src/utils.py:214-249): allow 1.5x mean + 2 std of recent history."""

    def __init__(self, max_len: int = 50):
        self.items = []
        self.max_len = max_len

    def add(self, value: float):
        self.items.insert(0, float(value))
        if len(self.items) > self.max_len:
            self.items.pop()

    def threshold(self) -> float:
        if not self.items:
            return float('inf')
        return 1.5 * float(np.mean(self.items)) + 2.0 * float(np.std(self.items))

    def observe(self, grad_norm: float) -> Tuple[float, bool]:
        """Returns (clip threshold used, whether clipping fired) and updates
        the history the way the reference does (clipped values recorded at
        the threshold)."""
        thr = self.threshold()
        clipped = grad_norm > thr
        self.add(min(grad_norm, thr) if np.isfinite(thr) else grad_norm)
        return thr, clipped


def clip_by_norm(grads, max_norm):
    """Scale grads so their global norm is at most max_norm (jit-safe)."""
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree.leaves(grads)))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads), gnorm
