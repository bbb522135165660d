"""Driver-artifact regression tests: `__graft_entry__.entry()` must stay
jittable on the flagship model, and the multichip dryrun helpers must keep
producing shardable batches. Trace-only (jax.eval_shape) so the suite stays
fast — the driver itself does the full compile."""
import jax
import numpy as np


def test_entry_traces():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, 'entry() returned no outputs'
    for leaf in leaves:
        assert all(isinstance(d, int) for d in leaf.shape), \
            'entry() output has non-static shape'


def test_dryrun_batch_divisible_by_mesh():
    """The dryrun's synthetic batch must shard over an 8-device data mesh
    (training DP and the sampling chain both rely on it)."""
    from __graft_entry__ import _synthetic_batch

    n_dev = 8
    batch = _synthetic_batch(2 * n_dev, 16, n_frag=5)
    for k, v in batch.items():
        arr = np.asarray(v)
        if arr.ndim:  # every leading axis must be the shardable batch dim
            assert arr.shape[0] == 2 * n_dev, (k, arr.shape)
    assert batch['positions'].shape[0] == 2 * n_dev
