"""Vectorised geometric bond perception.

Replaces the reference's per-pair nested dict lookups + O(N²) python loop
(src/molecule_builder.py:44-102) with a single dense table comparison over the
whole molecule: bond order o is assigned when the pair distance (in pm) is
under the order-o threshold table (bond length + margin, src/const.py:68-139,
175). Semantics are identical, including the pair-symmetrisation by sorted
type index (src/molecule_builder.py:66).
"""
from __future__ import annotations

import numpy as np

from difflinker_tpu.constants import (BOND1_THRESHOLD, BOND2_THRESHOLD,
                                      BOND3_THRESHOLD, MAX_VALENCE)


def bond_order_matrix(positions: np.ndarray, atom_types: np.ndarray) -> np.ndarray:
    """positions: (N, 3) Angstrom; atom_types: (N,) GEOM-vocab indices (the
    ZINC vocab is a prefix, so ZINC indices work unchanged).

    Returns (N, N) int8 bond orders (0-3), symmetric, zero diagonal.
    Dispatches to the C++ kernel (difflinker_tpu.native) when built; this
    numpy path is the fallback and correctness oracle.
    """
    from difflinker_tpu import native
    if native.available() and len(atom_types):
        return native.bond_orders(positions, atom_types)
    pos = np.asarray(positions, np.float64)
    t = np.asarray(atom_types, np.int64)
    diff = pos[:, None, :] - pos[None, :, :]
    dist_pm = 100.0 * np.sqrt((diff ** 2).sum(-1))  # pm, as the reference (x100)

    thr1 = BOND1_THRESHOLD[t[:, None], t[None, :]]
    thr2 = BOND2_THRESHOLD[t[:, None], t[None, :]]
    thr3 = BOND3_THRESHOLD[t[:, None], t[None, :]]

    order = np.zeros(dist_pm.shape, np.int8)
    # single: pair exists in BONDS_1 and within threshold
    order = np.where((thr1 > 0) & (dist_pm < thr1), 1, order)
    # double/triple only where the single-bond test already passed
    order = np.where((order >= 1) & (thr2 > 0) & (dist_pm < thr2), 2, order)
    order = np.where((order >= 2) & (thr3 > 0) & (dist_pm < thr3), 3, order)
    np.fill_diagonal(order, 0)
    return order


def repair_valences(bonds: np.ndarray, positions: np.ndarray,
                    atom_types: np.ndarray) -> np.ndarray:
    """Downgrade over-assigned multiple bonds until no atom exceeds its max
    valence (ALLOWED_BONDS, src/const.py:156-173).

    Pure distance thresholds cannot kekulize aromatic rings: every bond in
    e.g. an imidazole sits at 1.31-1.40 Å, under the order-2 threshold, so the
    raw table assigns adjacent doubles and nitrogens end up 4-valent — the
    reference never hits this because its published metric protocol re-derives
    bonds with openbabel (reformat_data_obabel.py:23), whose perception
    resolves conjugation before RDKit sanitization. This pass recovers that
    behaviour in the native tier: while any atom exceeds MAX_VALENCE, the
    incident order>=2 bond that sits *closest to its threshold* (largest
    dist/threshold ratio — the least confident multiple-bond call) is
    downgraded by one. Bond order only ever decreases, so connectivity is
    preserved and the loop terminates; molecules with no over-valent atoms
    are returned bit-identical.
    """
    bonds = np.array(bonds, np.int8, copy=True)
    n = bonds.shape[0]
    if n == 0:
        return bonds
    pos = np.asarray(positions, np.float64)
    t = np.asarray(atom_types, np.int64)
    diff = pos[:, None, :] - pos[None, :, :]
    dist_pm = 100.0 * np.sqrt((diff ** 2).sum(-1))
    thr = {2: BOND2_THRESHOLD[t[:, None], t[None, :]],
           3: BOND3_THRESHOLD[t[:, None], t[None, :]]}
    maxv = MAX_VALENCE[t]
    while True:
        excess = bonds.sum(1) - maxv
        over = np.where(excess > 0)[0]
        if len(over) == 0:
            return bonds
        progressed = False
        for i in over:
            if bonds[i].sum() <= maxv[i]:
                continue  # an earlier downgrade this sweep already fixed i
            multi = np.where(bonds[i] >= 2)[0]
            if len(multi) == 0:
                continue  # crowded all-single geometry: genuinely unrepairable
            ratios = [dist_pm[i, j] / max(thr[int(bonds[i, j])][i, j], 1e-9)
                      for j in multi]
            j = multi[int(np.argmax(ratios))]
            bonds[i, j] -= 1
            bonds[j, i] -= 1
            progressed = True
        if not progressed:
            return bonds


def connected_components(adj: np.ndarray) -> np.ndarray:
    """(N,) component labels from a boolean/integer adjacency matrix."""
    n = adj.shape[0]
    if n == 0:
        return np.zeros(0, np.int32)
    from difflinker_tpu import native
    if native.available():
        return native.connected_components(np.asarray(adj, np.int8))
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components as _cc
    _, labels = _cc(csr_matrix(adj > 0), directed=False)
    return labels.astype(np.int32)
