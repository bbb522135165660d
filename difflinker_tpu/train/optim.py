"""Optimizer construction.

Reference: AdamW(lr, amsgrad=True, weight_decay=1e-12)
(src/lightning.py:465-466, src/linker_size_lightning.py:167-168). In optax the
same update is amsgrad scaling + decoupled weight decay + lr.
"""
from __future__ import annotations

from typing import Optional

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


def adamw_amsgrad(lr, weight_decay: float = 1e-12,
                  amsgrad: bool = True,
                  grad_clip_norm: Optional[float] = None):
    """lr may be a float or an optax schedule (see build_lr)."""
    scale = optax.scale_by_amsgrad() if amsgrad else optax.scale_by_adam()
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts += [scale,
              optax.add_decayed_weights(weight_decay),
              optax.scale_by_learning_rate(lr)]
    return optax.chain(*parts)
