"""Multi-host helpers exercised single-process (the degenerate but
API-complete case): host sharding, global batch assembly on a device mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from difflinker_tpu.data.datasets import synthetic_dataset
from difflinker_tpu.parallel import mesh as mesh_lib
from difflinker_tpu.parallel import multihost


def test_host_shard_indices_single_process():
    idx = multihost.host_shard_indices(10)
    np.testing.assert_array_equal(idx, np.arange(10))
    assert multihost.is_primary()


def test_shard_dataset():
    ds = synthetic_dataset(6, seed=0)
    local = multihost.shard_dataset(ds.samples)
    assert len(local) == 6  # one process owns everything


def test_global_batches_on_mesh():
    mesh = mesh_lib.make_mesh(8)
    ds = synthetic_dataset(16, seed=1)
    local = ds.iter_batches(8, group_by_bucket=False)
    got = list(multihost.global_batches(local, mesh))
    assert len(got) == 2
    batch = got[0]
    assert batch['positions'].shape[0] == 8
    # arrays are sharded over the data axis and usable in a jitted reduction
    total = jax.jit(lambda b: jnp.sum(b['atom_mask']))(
        {k: v for k, v in batch.items() if hasattr(v, 'ndim')})
    assert float(total) > 0
