"""Device-mesh construction and sharding helpers.

The reference trains single-device (`Trainer(devices=1)`,
train_difflinker.py:102-110); distribution is a new first-class subsystem
here. Design (SURVEY.md §2.7): the atom axis is tiny (N ≤ ~1000), so scale
comes from **batch data-parallelism** over a 1-D `data` mesh axis. XLA emits
the gradient all-reduce over ICI from a `psum` inside `shard_map`; DCN is only
for multi-host input pipelines and checkpoint IO.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = (DATA_AXIS,),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D (or user-shaped) device mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'requested a {n_devices}-device mesh but only '
                f'{len(devices)} device(s) are visible '
                f'({jax.default_backend()} backend); for virtual CPU devices '
                f'set XLA_FLAGS=--xla_force_host_platform_device_count='
                f'{n_devices} before any backend initialises')
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place every array in a batch dict with its leading dim sharded over
    `data`. Non-array entries pass through."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, 'ndim') and getattr(v, 'ndim', 0) >= 1:
            out[k] = jax.device_put(np.asarray(v), sh)
        else:
            out[k] = v
    return out


def replicate_params(mesh: Mesh, params):
    rep = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, rep), params)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, \
        f'global batch {global_batch} not divisible by data axis {n}'
    return global_batch // n
