"""Child process for the 2-process multi-host test (test_multihost.py).

Run as: python tests/_multihost_child.py <process_id> <port>
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=4 so the
global topology is 2 processes x 4 virtual CPU devices = an 8-device mesh.

Prints one JSON line: {"loss": ..., "step": ..., "checksum": ...}.
"""
import json
import sys

import numpy as np


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]

    import jax
    from difflinker_tpu.parallel import multihost
    multihost.initialize(f'localhost:{port}', num_processes=2,
                         process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == proc_id
    assert len(jax.devices()) == 8, jax.devices()

    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from difflinker_tpu.parallel import mesh as mesh_lib
    from difflinker_tpu.train.trainer import Trainer

    # Every host can build the full deterministic batch; each keeps only the
    # rows its own devices host (global row r lives on global device r with
    # 1-row-per-device batch sharding).
    full = _synthetic_batch(8, 16, n_frag=5)
    local = {k: v[proc_id * 4:(proc_id + 1) * 4] for k, v in full.items()}

    # strided host_shard_indices sanity (the documented loading recipe)
    idx = multihost.host_shard_indices(8)
    assert len(idx) == 4 and (idx % 2 == proc_id).all()

    # One identical step body on four meshes: pure DP; DP x SP (2-D
    # (data=2 hosts) x (atoms=4 intra-host) — multi-host input over DCN
    # composed with sequence parallelism over the virtual ICI); DP x SP x TP
    # ((data=2 hosts) x (atoms=2) x (senders=2) — adding sender-axis tensor
    # parallelism over the pairwise graph op); and DP x PP ((data=4, two
    # shards per host) x (stages=2 intra-host) — pipeline parallelism with
    # the stage ppermute riding each host's own devices). The parent asserts
    # all legs' numerics match.
    out = {}
    for tag, mesh in (('', mesh_lib.make_mesh(8)),
                      ('_dpsp', mesh_lib.make_mesh_2d(2, 4)),
                      ('_dpsptp', mesh_lib.make_mesh_3d(2, 2, 2)),
                      ('_dppp', mesh_lib.make_mesh_pp(4, 2))):
        gb = next(multihost.global_batches(iter([local]), mesh))
        assert gb['positions'].shape[0] == 8  # logically global
        trainer = Trainer(_flagship_cfg(tiny=True), mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = trainer.compiled_train_step()(
            state, gb, jax.random.PRNGKey(1), jnp.inf)
        jax.block_until_ready(metrics['loss'])
        out['loss' + tag] = float(metrics['loss'])
        out['checksum' + tag] = float(sum(
            jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(state['params'])))
        out.setdefault('step', int(state['step']))

    print(json.dumps(out))
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
