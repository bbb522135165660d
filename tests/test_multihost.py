"""Multi-host data loading and training: a REAL 2-process jax.distributed
run (CPU/Gloo, 4 virtual devices per process -> one 8-device global mesh)
checked against the single-process step, plus the degenerate single-process
API cases."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from difflinker_tpu.data.datasets import synthetic_dataset
from difflinker_tpu.parallel import mesh as mesh_lib
from difflinker_tpu.parallel import multihost


def test_two_process_training_matches_single_process():
    """Spawn 2 coordinated processes (jax.distributed over localhost); each
    hosts 4 virtual CPU devices and supplies its local half of the global
    batch via multihost.global_batches. The distributed train step must
    produce the same loss/params as the same step on a single-process
    8-device mesh."""
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)  # disable TPU-plugin sitecustomize
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=4').strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo
    child = os.path.join(repo, 'tests', '_multihost_child.py')
    procs = [subprocess.Popen(
        [sys.executable, child, str(i), str(port)], env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    results = []
    for i, (out, err) in enumerate(outs):
        assert procs[i].returncode == 0, f'proc {i} failed:\n{err[-3000:]}'
        results.append(json.loads(out.strip().splitlines()[-1]))

    # the two controllers agree exactly (replicated state)
    assert results[0] == results[1], results

    # single-process reference on an 8-device mesh, same data/keys
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from difflinker_tpu.train.trainer import Trainer
    mesh = mesh_lib.make_mesh(8)
    trainer = Trainer(_flagship_cfg(tiny=True), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = trainer._device_batch(_synthetic_batch(8, 16, n_frag=5))
    state, metrics = trainer.compiled_train_step()(
        state, batch, jax.random.PRNGKey(1), jnp.inf)
    ref_loss = float(metrics['loss'])
    ref_checksum = float(sum(jnp.sum(jnp.abs(l))
                             for l in jax.tree.leaves(state['params'])))
    np.testing.assert_allclose(results[0]['loss'], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0]['checksum'], ref_checksum,
                               rtol=1e-5)
    assert results[0]['step'] == 1
    # the DP x SP (2 hosts x 4-way atom sharding) leg matches the same
    # numbers — multi-host input composes with sequence parallelism
    np.testing.assert_allclose(results[0]['loss_dpsp'], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0]['checksum_dpsp'], ref_checksum,
                               rtol=1e-5)
    # ...and the DP x SP x TP (2 hosts x atoms=2 x senders=2) leg too —
    # multi-host input composes with 2-D edge blocking (sender-axis TP)
    np.testing.assert_allclose(results[0]['loss_dpsptp'], ref_loss,
                               rtol=1e-5)
    np.testing.assert_allclose(results[0]['checksum_dpsptp'], ref_checksum,
                               rtol=1e-5)
    # ...and the DP x PP (data=4 over 2 hosts x stages=2 intra-host) leg —
    # multi-host input composes with pipeline parallelism
    np.testing.assert_allclose(results[0]['loss_dppp'], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0]['checksum_dppp'], ref_checksum,
                               rtol=1e-5)


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
