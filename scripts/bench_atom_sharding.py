#!/usr/bin/env python
"""Memory-scaling evidence for atom-axis sequence parallelism.

DP shards the batch; it cannot help when a SINGLE sample's O(N²·H) edge
activations outgrow one chip's HBM (the measured bottleneck at pocket
scale, BASELINE.md). The 2-D data×atoms mesh shards node axes instead, so
the per-device footprint of one sample falls ~1/a with the atoms axis.

This script compiles the flagship EGNN denoiser forward for one
pocket-scale sample on a 1-device program and on 1×a atoms meshes, and
records XLA's own per-device temp-buffer accounting
(compiled.memory_analysis()) — compiler-reported, backend-agnostic numbers
(run here on the virtual CPU mesh; the sharding, and therefore the
accounting, is identical on a TPU slice).

`--grid a,s ...` additionally measures data×atoms×senders meshes (sender-
axis tensor parallelism, tests/test_sender_sharding.py): per-device edge
blocks are (N/a × N/s), so the footprint should fall ~1/(a·s) and the two
axes should be interchangeable levers.

    python scripts/bench_atom_sharding.py --n 512 --hidden 128 \
        --grid 2,1 1,2 2,2 4,2 2,4 --out docs/atom_sharding_memory.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=512, help='atoms in the sample')
    p.add_argument('--hidden', type=int, default=128)
    p.add_argument('--layers', type=int, default=2)
    p.add_argument('--axes', type=int, nargs='+', default=[2, 4, 8])
    p.add_argument('--grid', type=str, nargs='*', default=[],
                   help='atoms,senders combos for 3-D meshes (e.g. 2,2 4,2)')
    p.add_argument('--out', default=None)
    args = p.parse_args()

    grid = [tuple(int(v) for v in g.split(',')) for g in args.grid]
    n_dev = max(args.axes + [a * s for a, s in grid] + [1])
    os.environ['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={n_dev} '
        + os.environ.get('XLA_FLAGS', ''))
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from difflinker_tpu.config import DiffusionConfig, ModelConfig
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.models.dynamics import dynamics_apply
    from difflinker_tpu.ops.geometry import fc_edge_mask
    from difflinker_tpu.parallel import mesh as mesh_lib

    B, N = 1, args.n
    mcfg = ModelConfig(in_node_nf=8, context_node_nf=2,
                       hidden_nf=args.hidden, n_layers=args.layers,
                       norm_constant=1e-6)
    edm = make_edm(mcfg, DiffusionConfig(timesteps=10))
    params = edm.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3 + 8))
    nm = jnp.ones((B, N, 1))
    lk = jnp.zeros((B, N, 1)).at[:, N // 2:].set(1.0)
    em = fc_edge_mask(nm)
    ctx = jnp.concatenate([1 - lk, jnp.zeros((B, N, 1))], -1)
    t = jnp.full((B, 1), 0.4)

    def fwd(params, t, z, nm, lm, em, ctx):
        return dynamics_apply(params['dynamics'], t, z, nm, lm, em, ctx,
                              cfg=mcfg)

    def temp_mb(compiled):
        return round(compiled.memory_analysis().temp_size_in_bytes / 1e6, 1)

    rows = [{'atoms_axis': 1,
             'temp_mb_per_device': temp_mb(
                 jax.jit(fwd).lower(params, t, z, nm, lk, em, ctx).compile())}]
    for a in args.axes:
        mesh = mesh_lib.make_mesh_2d(1, a)
        nsh = mesh_lib.node_sharding(mesh)
        rep = mesh_lib.replicated(mesh)
        dsh = mesh_lib.batch_sharding(mesh)
        sh_args = (jax.device_put(params, rep), jax.device_put(t, dsh),
                   jax.device_put(z, nsh), jax.device_put(nm, nsh),
                   jax.device_put(lk, nsh), jax.device_put(em, nsh),
                   jax.device_put(ctx, nsh))
        rows.append({'atoms_axis': a,
                     'temp_mb_per_device': temp_mb(
                         jax.jit(fwd).lower(*sh_args).compile())})

    grid_rows = []
    for a, s in grid:
        mesh = mesh_lib.make_mesh_3d(1, a, s)
        nsh = mesh_lib.node_sharding(mesh)
        psh = mesh_lib.pair_sharding(mesh)
        rep = mesh_lib.replicated(mesh)
        dsh = mesh_lib.batch_sharding(mesh)
        sh_args = (jax.device_put(params, rep), jax.device_put(t, dsh),
                   jax.device_put(z, nsh), jax.device_put(nm, nsh),
                   jax.device_put(lk, nsh), jax.device_put(em, psh),
                   jax.device_put(ctx, nsh))
        with mesh_lib.sharding_hints(mesh):
            compiled = jax.jit(fwd).lower(*sh_args).compile()
        grid_rows.append({'atoms_axis': a, 'senders_axis': s,
                          'temp_mb_per_device': temp_mb(compiled)})

    report = {'sample': {'batch': B, 'atoms': N, 'hidden': args.hidden,
                         'layers': args.layers},
              'metric': 'XLA temp-buffer bytes per device '
                        '(compiled.memory_analysis)',
              'series': rows}
    if grid_rows:
        report['atoms_x_senders_series'] = grid_rows
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
