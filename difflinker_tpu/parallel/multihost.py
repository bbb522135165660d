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
    covers all of its addressable shards). Hosts whose bucket padding
    produced different node counts for the same step would otherwise
    assemble divergent "global" shapes (and trace divergent programs), so
    every batch's node axis is agreed cross-host (max over processes) and
    zero-padded to that count rounded up to the atoms multiple.
    """
    for batch in local_batches:
        if 'positions' in batch:
            n_local = int(np.shape(batch['positions'])[1])
            n_global = _allreduce_max_nodes(n_local)
            batch = mesh_lib.pad_nodes_to_multiple(
                batch, mesh_lib.node_pad_multiple(mesh), min_nodes=n_global)
        shardings = mesh_lib.batch_shardings(mesh, batch)
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1:
                out[k] = jax.make_array_from_process_local_data(
                    shardings[k], v)
            else:
                out[k] = v
        yield out


def _allreduce_max_nodes(n_local: int) -> int:
    """Cross-process max of a host-local node count (no-op single-process).

    One tiny DCN collective per batch — negligible next to the batch
    transfer, and it is what lets ragged per-host bucket padding compose
    with a shared global shape (all hosts must call this the same number
    of times, which iterating the same dataloader recipe guarantees)."""
    if jax.process_count() == 1:
        return n_local
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.asarray([n_local], dtype=np.int32))
    return int(np.max(gathered))


def is_primary() -> bool:
    return jax.process_index() == 0
