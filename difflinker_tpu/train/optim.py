"""Optimizer construction.

Reference: AdamW(lr, amsgrad=True, weight_decay=1e-12)
(src/lightning.py:465-466, src/linker_size_lightning.py:167-168). In optax the
same update is amsgrad scaling + decoupled weight decay + lr.
"""
from __future__ import annotations

from typing import Optional

import optax


def adamw_amsgrad(lr: float, weight_decay: float = 1e-12,
                  amsgrad: bool = True,
                  grad_clip_norm: Optional[float] = None):
    scale = optax.scale_by_amsgrad() if amsgrad else optax.scale_by_adam()
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts += [scale,
              optax.add_decayed_weights(weight_decay),
              optax.scale_by_learning_rate(lr)]
    return optax.chain(*parts)
