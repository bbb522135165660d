"""Spatial locality ordering for pocket atoms (host-side, numpy).

The block-sparse tile layout (ops/geometry.tile_neighbor_lists) is exact when
each row-tile's M selected neighbour tiles cover every admissible edge; how
small M can be depends on how spatially coherent the atom ordering is. PDB
pocket atoms arrive in residue order (decent locality); this module makes the
property explicit by sorting pocket rows along a Morton (Z-order) curve.

Reordering rows *within* the pocket block is safe: the EGNN is permutation-
equivariant and every per-atom attribute (masks, one-hot, anchors) is carried
through the same permutation, so the [fragment | pocket | linker] layout the
MOAD datasets use (reference src/datasets.py:175-177) is preserved.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from difflinker_tpu import constants

# Per-atom attributes that must ride along with a row permutation — derived
# from the data layer's padded-attribute set so a new per-row attribute can't
# silently desynchronise from positions (the shape[0]==len(pos) guard in
# sort_pocket_rows protects non-row entries).
_ROW_ATTRS = tuple(sorted(constants.DATA_ATTRS_TO_PAD))


def morton_codes(x: np.ndarray, bits: int = 10) -> np.ndarray:
    """Z-order curve codes for points x (n, 3) -> (n,) uint64.

    Coordinates are quantised to a 2^bits grid over the bounding box; the
    three bit-streams are interleaved so nearby points get nearby codes."""
    x = np.asarray(x, np.float64)
    lo = x.min(axis=0)
    span = np.maximum(x.max(axis=0) - lo, 1e-9)
    q = np.clip(((x - lo) / span * (2 ** bits - 1)).astype(np.uint64), 0,
                2 ** bits - 1)
    codes = np.zeros(len(x), np.uint64)
    for b in range(bits):
        for d in range(3):
            codes |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                3 * b + d)
    return codes


def sort_pocket_rows(sample: Dict) -> Dict:
    """Return a copy of a per-molecule sample dict with its pocket rows
    reordered along the Morton curve (all other rows untouched)."""
    pocket = sample.get('pocket_mask')
    if pocket is None:
        return sample
    pocket = np.asarray(pocket)
    if pocket.sum() == 0:
        return sample
    pocket = pocket.reshape(-1) > 0
    pos = np.asarray(sample['positions'])
    rows = np.where(pocket)[0]
    order = rows[np.argsort(morton_codes(pos[rows]))]
    perm = np.arange(len(pos))
    perm[rows] = order
    out = dict(sample)
    for k in _ROW_ATTRS:
        if k in out and np.asarray(out[k]).ndim >= 1 \
                and np.asarray(out[k]).shape[0] == len(pos):
            out[k] = np.asarray(out[k])[perm]
    return out
