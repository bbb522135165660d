"""Optimizer construction.

Reference: AdamW(lr, amsgrad=True, weight_decay=1e-12)
(src/lightning.py:465-466, src/linker_size_lightning.py:167-168). In optax the
same update is amsgrad scaling + decoupled weight decay + lr.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


def build_lr(lr: float, schedule: str = 'constant',
             decay_steps: Optional[int] = None,
             warmup_steps: int = 0):
    """Learning-rate schedule. The reference uses a constant lr; cosine decay
    (with optional linear warmup) is a TPU-side extra for longer runs."""
    if schedule == 'constant':
        return lr
    if schedule == 'cosine':
        assert decay_steps, 'cosine schedule needs decay_steps'
        if warmup_steps:
            # warmup must leave room for the decay phase (short smoke runs)
            warmup_steps = min(warmup_steps, max(decay_steps - 1, 1))
            return optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup_steps, decay_steps, end_value=lr * 0.01)
        return optax.cosine_decay_schedule(lr, decay_steps, alpha=0.01)
    raise ValueError(schedule)


class _AmsgradState(NamedTuple):
    count: chex.Array
    mu: chex.Array
    nu: chex.Array
    nu_max: chex.Array


def scale_by_amsgrad_torch(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8):
    """AMSGrad with torch.optim.AdamW(amsgrad=True) semantics.

    optax.scale_by_amsgrad maxes over the *bias-corrected* second moment;
    torch maxes over the RAW exp_avg_sq and bias-corrects the max afterwards
    (torch/optim/adamw.py single-tensor path). Early in training the
    bias-corrected moment is inflated by 1/(1-b2^t), so optax's running max
    latches onto step-1 values and the two optimizers genuinely diverge
    (~1e-4 param drift in 10 steps at lr=2e-4, tests/test_parity_grad.py).
    The reference trained with torch (src/lightning.py:465-466), so parity
    requires the torch ordering:

        nu_max = max(nu_max, nu);  update = mu_hat / (sqrt(nu_max/bc2) + eps)
    """
    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return _AmsgradState(count=jnp.zeros([], jnp.int32),
                             mu=zeros(), nu=zeros(), nu_max=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g,
                          updates, state.mu)
        nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g,
                          updates, state.nu)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max)
        return out, _AmsgradState(count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_amsgrad(lr, weight_decay: float = 1e-12,
                  amsgrad: bool = True,
                  grad_clip_norm: Optional[float] = None):
    """lr may be a float or an optax schedule (see build_lr)."""
    scale = scale_by_amsgrad_torch() if amsgrad else optax.scale_by_adam()
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts += [scale,
              optax.add_decayed_weights(weight_decay),
              optax.scale_by_learning_rate(lr)]
    return optax.chain(*parts)
