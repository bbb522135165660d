#!/usr/bin/env python
"""Edge-coverage analysis for the block-sparse tile-pair layout
(ModelConfig.tile_size) — the geometric half of the tile verdict recorded in
docs/ARCHITECTURE.md §5 (the timing half is scripts/bench_kernels.py with
tileT.M impls).

For each pocket shape and tile size, reports the fraction of admissible 4A
edges captured by keeping each row-tile's M most-connected neighbour tiles,
under two spatial orderings of the non-fragment rows:

  * morton — Z-order curve sort (data/spatial.py, what
    LinkerDataset.spatially_sorted provides);
  * rcb    — recursive coordinate bisection (balanced median splits, compact
    boxes; the upper bound a smarter tiling could reach).

Finding (2026-08-16): the two orderings are equivalent, and the limit is
physical, not algorithmic — at molecular scale the 4A neighbourhood diameter
is comparable to any T-atom tile's spatial extent, so EXACT coverage needs
M = nT at every shape, and ~95% coverage still needs M ≈ 0.75 nT. The tile
layout therefore cannot beat the dense path exactly; it is an opt-in
speed/fidelity dial (timings: exact M=nT is parity with dense, cost scales
linearly with M).

    python scripts/bench_tile_coverage.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def rcb_order(pts: np.ndarray) -> np.ndarray:
    """Recursive coordinate bisection: balanced median splits along the
    widest axis -> contiguous compact groups."""
    def rec(ids):
        if len(ids) <= 1:
            return list(ids)
        p = pts[ids]
        ax = int(np.argmax(p.max(0) - p.min(0)))
        order = ids[np.argsort(p[:, ax], kind='stable')]
        half = len(ids) // 2
        return rec(order[:half]) + rec(order[half:])
    return np.asarray(rec(np.arange(len(pts))))


def main():
    import jax.numpy as jnp
    from bench_kernels import build_inputs
    from difflinker_tpu.data.spatial import morton_codes
    from difflinker_tpu.ops.geometry import distance_edge_mask

    shapes = [('pocket-4A', 32, 256, '4A'), ('pocket-N512', 8, 512, '4A'),
              ('pocket-N1024', 2, 1024, '4A')]
    for label, B, N, gt in shapes:
        xh, nm, link, em, ctx = build_inputs(B, N, 9, 3, gt)
        n_frag = max(N // 4, 2)
        for ordering in ('morton', 'rcb'):
            x = np.asarray(xh[..., :3]).copy()
            for b in range(B):
                rows = np.arange(n_frag, N)
                if ordering == 'morton':
                    perm = np.argsort(morton_codes(x[b, rows]))
                else:
                    perm = rcb_order(x[b, rows])
                x[b, rows] = x[b, rows[perm]]
            adj = np.asarray(distance_edge_mask(
                jnp.asarray(x), jnp.asarray(nm), jnp.asarray(link),
                jnp.asarray(ctx[..., -2:-1]), jnp.asarray(ctx[..., -1:]),
                gt)[..., 0])
            total = adj.sum()
            for tile in (32, 64, 128):
                if N % tile:
                    continue
                nT = N // tile
                c = adj.reshape(B, nT, tile, nT, tile).sum((2, 4))
                cs = -np.sort(-c, axis=-1)
                cum = np.cumsum(cs, axis=-1)
                cov = cum.sum(axis=(0, 1)) / total          # coverage vs M
                wc = int((c > 0).sum(-1).max())
                marks = ' '.join(f'M={m + 1}:{cov[m]:.3f}'
                                 for m in range(nT))
                print(f'{label} {ordering:6s} tile={tile:3d} (nT={nT:2d}, '
                      f'exact needs M={wc}): {marks}')


if __name__ == '__main__':
    main()
