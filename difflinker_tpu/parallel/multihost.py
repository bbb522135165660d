"""Multi-host utilities: distributed init, per-host data sharding, global
batch assembly over DCN.

The reference is single-process (SURVEY.md §2.7); this subsystem is new. The
design follows the standard JAX multi-host recipe: every host loads only its
shard of the dataset, builds process-local arrays, and
`jax.make_array_from_process_local_data` assembles the logically-global
batch; gradient all-reduce stays on ICI inside the jitted step, DCN carries
only input data and checkpoint IO.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np

from difflinker_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper.

    With all args None this performs the standard auto-detecting
    initialization (TPU pods); pass num_processes=1 to explicitly no-op for
    single-process runs."""
    if num_processes == 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_shard_indices(n_samples: int) -> np.ndarray:
    """Which dataset rows this host owns (strided by process index so class
    balance is preserved without a shuffle)."""
    return np.arange(jax.process_index(), n_samples, jax.process_count())


def shard_dataset(samples) -> list:
    idx = host_shard_indices(len(samples))
    return [samples[int(i)] for i in idx]


def global_batches(local_batches: Iterator[Dict], mesh) -> Iterator[Dict]:
    """Lift per-host padded batches into logically-global sharded arrays.

    Each host supplies its local slice of the global batch (local batch size
    = global / process_count); the result is addressable per-device and valid
    as input to a jitted step with batch sharding over `data`. On a 2-D
    data×atoms mesh the node axes additionally shard over `atoms` (the
    atoms axis must stay within each host's devices so the per-host slice
    covers all of its addressable shards); ragged node axes are zero-padded
    to the atoms multiple first.
    """
    for batch in local_batches:
        if 'positions' in batch:
            batch = mesh_lib.pad_nodes_to_multiple(
                batch, mesh_lib.atom_axis_size(mesh))
        shardings = mesh_lib.batch_shardings(mesh, batch)
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1:
                out[k] = jax.make_array_from_process_local_data(
                    shardings[k], v)
            else:
                out[k] = v
        yield out


def is_primary() -> bool:
    return jax.process_index() == 0
