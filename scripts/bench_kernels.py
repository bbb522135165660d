#!/usr/bin/env python
"""EGNN implementation shoot-out on the real chip, at the shapes that matter
— the ZINC flagship (N=32) and the pocket distance-graph shapes (N=256..1024).

Implementations: 'xla' (dense masked (B,N,N) path, the default) and 'sparseK'
(K-nearest-neighbor-list layout for distance graphs). Two generations of
fused Pallas kernels were also measured through this harness and both lost
~2x to XLA at every shape; they were deleted — the full measured story is in
docs/ARCHITECTURE.md §5.

Per (shape, impl, dtype): median time per EGNN denoiser forward (K forwards
inside one lax.scan to amortise dispatch), achieved TFLOP/s from the analytic
model (ops/flops.py), and MFU vs the chip peak.

    python scripts/bench_kernels.py [--csv out.csv] [--steps K]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SHAPES = [
    # (label, B, N, n_layers, graph_type, context_nf, in_nf)
    ('zinc',        256, 32,   8, 'FC', 2, 8),
    ('zinc-N64',    128, 64,   8, 'FC', 2, 8),
    ('pocket-4A',    32, 256,  6, '4A', 3, 9),
    ('pocket-fc',    16, 256,  6, 'FC-10A-4A', 3, 9),
    ('pocket-N512',   8, 512,  6, '4A', 3, 9),
    ('pocket-N1024',  2, 1024, 6, '4A', 3, 9),
]


def build_inputs(B, N, in_nf, ctx_nf, graph_type, seed=0):
    import jax.numpy as jnp
    from difflinker_tpu.ops.geometry import fc_edge_mask

    rng = np.random.default_rng(seed)
    node_mask = np.ones((B, N, 1), np.float32)
    n_frag = max(N // 4, 2)
    frag = np.zeros((B, N, 1), np.float32)
    frag[:, :n_frag] = 1
    link = node_mask - frag
    # spread coords so distance graphs have realistic (sparse) degree
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * (N ** (1 / 3))
    if graph_type != 'FC':
        # Morton-order the pocket span, as the data layer provides
        # (LinkerDataset.spatially_sorted) — tile-coverage M depends on it
        from difflinker_tpu.data.spatial import morton_codes
        for b in range(B):
            rows = np.arange(n_frag, N)
            x[b, rows] = x[b, rows[np.argsort(morton_codes(x[b, rows]))]]
    h = np.eye(in_nf, dtype=np.float32)[rng.integers(0, in_nf, (B, N))]
    anchors = np.zeros((B, N, 1), np.float32)
    anchors[:, [1, n_frag - 1]] = 1
    if ctx_nf == 3:
        pocket = np.zeros((B, N, 1), np.float32)
        pocket[:, n_frag // 2:n_frag] = 1
        frag_only = frag - pocket
        ctx = np.concatenate([anchors, frag_only, pocket], -1)
    else:
        ctx = np.concatenate([anchors, frag], -1)
    xh = np.concatenate([x, h], -1)
    em = (np.asarray(fc_edge_mask(jnp.asarray(node_mask)))
          if graph_type == 'FC' else None)
    return xh, node_mask, link, em, ctx


def bench_forward(cfg, B, N, steps, seed=0):
    """Median seconds per dynamics_apply forward (K scanned forwards/jit)."""
    import jax
    import jax.numpy as jnp
    from difflinker_tpu.models.dynamics import dynamics_apply, init_dynamics

    xh, node_mask, link, em, ctx = build_inputs(
        B, N, cfg.in_node_nf, cfg.context_node_nf, cfg.graph_type.value, seed)
    params = {'dynamics': init_dynamics(jax.random.PRNGKey(0), cfg)}
    args = [jnp.asarray(a) if a is not None else None
            for a in (xh, node_mask, link, em, ctx)]

    def one(carry, t):
        xh_c = carry
        eps, _ = dynamics_apply(params['dynamics'], t, xh_c, args[1], args[2],
                                args[3], args[4], cfg=cfg)
        # feed the output back so steps can't be optimised away
        return xh_c + 1e-6 * eps, ()

    @jax.jit
    def run(xh0):
        ts = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1) * jnp.ones((1, B, 1))
        out, _ = jax.lax.scan(one, xh0, ts)
        return out

    out = run(args[0])
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(args[0]))
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--csv', type=str, default=None)
    ap.add_argument('--impls', type=str, default='xla',
                    help="comma list: 'xla' (dense), 'sparseK' (K-neighbor "
                         "lists) or 'tileT.M' (block-sparse tile pairs, e.g. "
                         'tile64.4) — sparse impls apply to distance graphs '
                         'only')
    ap.add_argument('--dtypes', type=str, default='float32,bfloat16')
    ap.add_argument('--shapes', type=str, default=None,
                    help='comma-separated labels (default: all)')
    args = ap.parse_args()

    import jax
    from difflinker_tpu.config import GraphType, ModelConfig
    from difflinker_tpu.ops import flops as flops_lib

    kind = jax.devices()[0].device_kind
    print(f'# device: {kind}; {args.steps} scanned forwards per timing')
    rows = []
    want = set(args.shapes.split(',')) if args.shapes else None
    for label, B, N, L, gt, ctx_nf, in_nf in SHAPES:
        if want and label not in want:
            continue
        for dtype in args.dtypes.split(','):
            for impl in args.impls.split(','):
                k = tile = tile_m = None
                if impl.startswith('sparse'):
                    if gt == 'FC':
                        continue  # neighbor lists apply to distance graphs
                    k = int(impl[len('sparse'):])
                elif impl.startswith('tile'):
                    if gt == 'FC':
                        continue
                    tile, tile_m = (int(v) for v in
                                    impl[len('tile'):].split('.'))
                cfg = ModelConfig(
                    in_node_nf=in_nf, context_node_nf=ctx_nf, hidden_nf=128,
                    n_layers=L, inv_sublayers=2, norm_constant=1e-6,
                    graph_type=GraphType(gt), dtype=dtype, neighbor_k=k,
                    tile_size=tile, tile_neighbors=tile_m)
                try:
                    dt = bench_forward(cfg, B, N, args.steps)
                except Exception as e:
                    print(f'{label:13s} {dtype:9s} {impl:7s} FAILED: '
                          f'{type(e).__name__}: {str(e)[:120]}')
                    continue
                fl = flops_lib.egnn_forward_flops(B, N, cfg)
                tflops = fl / dt / 1e12
                peak = flops_lib.peak_flops(kind, dtype)
                mfu = (fl / dt / peak) if peak else float('nan')
                rows.append(dict(shape=label, B=B, N=N, layers=L, graph=gt,
                                 dtype=dtype, impl=impl, t_fwd_ms=dt * 1e3,
                                 tflops=tflops, mfu=mfu))
                print(f'{label:13s} {dtype:9s} {impl:7s} '
                      f'{dt*1e3:9.3f} ms/fwd  {tflops:7.2f} TFLOP/s  '
                      f'MFU {mfu*100:5.1f}%')
    if args.csv:
        import csv
        with open(args.csv, 'w', newline='') as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f'# wrote {args.csv}')
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
