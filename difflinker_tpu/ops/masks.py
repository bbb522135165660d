"""Runtime invariant checks (mask correctness, CoM-zero, NaN detection).

The reference embeds these as hard asserts executed every step
(src/utils.py:82-107, src/egnn.py:441-442). Under jit we cannot raise, so the
same family exists in two forms:

* `*_value` functions: return scalar violation magnitudes — usable inside jit
  (e.g. carried as a per-sample NaN flag through the sampling scan).
* `assert_*` functions: host-side asserts over concrete arrays — used in tests
  and eager debug mode (enable with ``difflinker_tpu.ops.masks.DEBUG = True``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DEBUG = False


def masked_violation(x, node_mask) -> jnp.ndarray:
    """Max |x| outside the mask (should be ~0)."""
    return jnp.max(jnp.abs(x * (1.0 - node_mask)))


def mean_violation(x, node_mask, eps=1e-10) -> jnp.ndarray:
    """Relative magnitude of the masked per-sample mean (should be ~0)."""
    largest = jnp.max(jnp.abs(x))
    err = jnp.max(jnp.abs(jnp.sum(x, axis=1, keepdims=True)))
    return err / (largest + eps)


def partial_mean_violation(x, com_mask, eps=1e-10) -> jnp.ndarray:
    xm = x * com_mask
    largest = jnp.max(jnp.abs(xm))
    err = jnp.max(jnp.abs(jnp.sum(xm, axis=1, keepdims=True)))
    return err / (largest + eps)


def nan_flags(*arrays) -> jnp.ndarray:
    """Per-sample NaN indicator over a list of (B, ...) arrays.

    Jit-safe replacement for FoundNaNException (src/utils.py:274-289): instead
    of raising, callers carry the flag and re-draw failed samples host-side.
    """
    flag = None
    for a in arrays:
        f = jnp.any(jnp.isnan(a.reshape(a.shape[0], -1)), axis=-1)
        flag = f if flag is None else (flag | f)
    return flag


# ---------------------------------------------------------------------------
# Host-side asserts (tests / eager debugging)
# ---------------------------------------------------------------------------

def assert_correctly_masked(x, node_mask, tol=1e-4):
    v = float(np.max(np.abs(np.asarray(x) * (1 - np.asarray(node_mask)))))
    assert v < tol, f'variables not masked properly: {v}'


def assert_mean_zero_with_mask(x, node_mask, tol=1e-2):
    assert_correctly_masked(x, node_mask)
    v = float(mean_violation(jnp.asarray(x), jnp.asarray(node_mask)))
    assert v < tol, f'mean is not zero, relative error {v}'


def assert_partial_mean_zero_with_mask(x, node_mask, com_mask, tol=1e-2):
    assert_correctly_masked(x, node_mask)
    v = float(partial_mean_violation(jnp.asarray(x), jnp.asarray(com_mask)))
    assert v < tol, f'partial mean is not zero, relative error {v}'


def check_mask_correct(variables, node_mask):
    for v in variables:
        if np.asarray(v).size:
            assert_correctly_masked(v, node_mask)
