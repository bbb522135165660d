"""Geometrically realistic synthetic linker-design data.

`synthetic_dataset` (datasets.py) produces random point clouds — fine for
shape/throughput tests, but no model can learn chemistry from them. This
generator builds *valid* molecules under the framework's own bond-perception
tables: tree-structured molecules whose bonded pairs sit at tabulated single-
bond lengths and whose non-bonded pairs are kept outside the bond threshold.
Each sample is split [fragment_1 | fragment_2 | linker-chain] with anchors at
the junctions — a faithful miniature of the ZINC task, enabling end-to-end
learning demos (scripts/demo_learning.py) without the released datasets.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from difflinker_tpu import constants
from difflinker_tpu.chem.bonds import bond_order_matrix
from difflinker_tpu.data.datasets import LinkerDataset

# heavy-atom palette biased like drug-like molecules
_TYPES = np.asarray([0, 0, 0, 0, 1, 2])  # C, C, C, C, O, N
_MIN_NONBONDED = 1.80  # Angstrom, > any C/N/O single-bond threshold (+margin)


def _bond_length(t1: int, t2: int) -> float:
    a = constants.GEOM_IDX2ATOM[int(t1)]
    b = constants.GEOM_IDX2ATOM[int(t2)]
    return constants.BONDS_1[a][b] / 100.0  # pm -> Angstrom


def _place_atom(rng, positions, parent_idx, length, existing):
    """Random direction from the parent at the bond length, rejection-sampled
    so no non-bonded pair falls under the bond threshold."""
    for _ in range(64):
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        cand = positions[parent_idx] + d * length
        others = np.delete(np.asarray(existing), parent_idx, axis=0)
        if len(others) == 0 or np.linalg.norm(others - cand, axis=1).min() > _MIN_NONBONDED:
            return cand
    return None


def _grow_segment(rng, types, positions, parents, n_new, attach_idx):
    """Grow n_new atoms as a chain starting from attach_idx; returns index of
    the last grown atom or None on failure."""
    last = attach_idx
    for _ in range(n_new):
        t = int(_TYPES[rng.integers(len(_TYPES))])
        cand = _place_atom(rng, np.asarray(positions), last,
                           _bond_length(types[last], t), positions)
        if cand is None:
            return None
        types.append(t)
        positions.append(cand)
        parents.append(last)
        last = len(types) - 1
    return last


def make_molecule_sample(rng, n_frag1: int, n_frag2: int, n_linker: int,
                         uuid: int = 0, n_linker_fn=None,
                         n_types: Optional[int] = None) -> Optional[Dict]:
    """One sample in the canonical dict layout, or None if placement failed.

    Topology: frag1-chain — linker-chain — frag2-chain, atoms ordered
    [frag1 | frag2 | linker] (fragments first, as the reference datasets).
    `n_linker_fn(frag1_types) -> int` (optional) overrides n_linker once the
    first fragment's atom types exist — lets the dataset couple linker size
    to node-local fragment chemistry (see synthetic_molecule_dataset)."""
    # grow the whole molecule as one chain: frag1, linker, frag2
    types: List[int] = [int(_TYPES[rng.integers(len(_TYPES))])]
    positions: List[np.ndarray] = [np.zeros(3)]
    parents: List[int] = [-1]

    last = _grow_segment(rng, types, positions, parents, n_frag1 - 1, 0)
    if last is None:
        return None
    anchor1 = last
    if n_linker_fn is not None:
        n_linker = int(n_linker_fn(list(types)))
    last = _grow_segment(rng, types, positions, parents, n_linker, last)
    if last is None:
        return None
    linker_end = last
    last = _grow_segment(rng, types, positions, parents, n_frag2, last)
    if last is None:
        return None
    anchor2 = linker_end + 1  # first frag2 atom (bonded to the linker end)

    n = len(types)
    types_arr = np.asarray(types)
    pos_arr = np.asarray(positions, np.float32)

    # sanity: bond perception must recover a connected, valence-valid graph
    orders = bond_order_matrix(pos_arr, types_arr)
    valence = orders.sum(1)
    if (valence > constants.MAX_VALENCE[types_arr]).any():
        return None

    # reorder to [frag1 | frag2 | linker]
    frag1_idx = list(range(0, n_frag1))
    linker_idx = list(range(n_frag1, n_frag1 + n_linker))
    frag2_idx = list(range(n_frag1 + n_linker, n))
    order = frag1_idx + frag2_idx + linker_idx
    inv = np.empty(n, int)
    inv[order] = np.arange(n)

    n_types = n_types or constants.NUMBER_OF_ATOM_TYPES
    one_hot = np.eye(n_types, dtype=np.float32)[
        np.clip(types_arr[order], 0, n_types - 1)]
    charges = np.asarray(
        [list(constants.CHARGES.values())[min(t, 7)] for t in types_arr[order]],
        np.float32)
    n_frag = n_frag1 + len(frag2_idx)
    frag_mask = np.zeros(n, np.float32)
    frag_mask[:n_frag] = 1
    link_mask = 1 - frag_mask
    anchors = np.zeros(n, np.float32)
    anchors[inv[anchor1]] = 1
    anchors[inv[anchor2]] = 1

    pos_out = pos_arr[order]
    pos_out = pos_out - pos_out.mean(0, keepdims=True)
    return {
        'uuid': uuid, 'name': f'synthmol_{uuid}',
        'positions': pos_out.astype(np.float32),
        'one_hot': one_hot, 'charges': charges, 'anchors': anchors,
        'fragment_mask': frag_mask, 'linker_mask': link_mask,
        'num_atoms': n,
    }


def make_multifrag_sample(rng, frag_sizes: List[int], linker_sizes: List[int],
                          uuid: int = 0, topology: str = 'chain',
                          n_types: Optional[int] = None) -> Optional[Dict]:
    """One k-fragment sample (k = len(frag_sizes)), or None on placement
    failure. Miniature of the GEOM multifrag task (reference
    data/geom/generate_geom_multifrag.py:58-110: molecules MMPA/BRICS-cut into
    3-7 fragments joined by 1..k-1 linker segments).

      topology='chain':  f0 —l0— f1 —l1— f2 … (k-1 coupled linker segments)
      topology='star':   every outer fragment links to fragment 0

    Atom layout [frag_0 | … | frag_{k-1} | all linker atoms] — fragments
    first, as the reference datasets require for template creation
    (src/datasets.py:476-512). Anchors flag every fragment atom bonded to a
    linker segment (the multifrag `anchors` "i-j-k" convention of
    data/geom/prepare_geom_dataset.py:291-297 resolved to per-atom flags, as
    data/datasets.py:273-279 parses it). `linker_sizes` must have k-1 entries;
    a segment may be size 0 only in chain topology (fragments fused
    directly — not generated by default ranges).
    """
    k = len(frag_sizes)
    assert k >= 2 and len(linker_sizes) == k - 1, (frag_sizes, linker_sizes)
    types: List[int] = [int(_TYPES[rng.integers(len(_TYPES))])]
    positions: List[np.ndarray] = [np.zeros(3)]
    parents: List[int] = [-1]

    last = _grow_segment(rng, types, positions, parents, frag_sizes[0] - 1, 0)
    if last is None:
        return None
    frag_ranges = [(0, frag_sizes[0])]
    linker_ranges = []
    anchor_idx = []
    for i in range(1, k):
        if topology == 'chain':
            attach = last  # chain: link from the end of the previous fragment
        elif topology == 'star':
            attach = int(rng.integers(0, frag_sizes[0]))  # link from frag_0
        else:
            raise ValueError(topology)
        anchor_idx.append(attach)
        lstart = len(types)
        seg_last = _grow_segment(rng, types, positions, parents,
                                 linker_sizes[i - 1], attach)
        if seg_last is None:
            return None
        linker_ranges.append((lstart, len(types)))
        fstart = len(types)
        anchor_idx.append(fstart)  # first atom of frag_i, bonded to seg end
        last = _grow_segment(rng, types, positions, parents, frag_sizes[i],
                             seg_last)
        if last is None:
            return None
        frag_ranges.append((fstart, len(types)))

    n = len(types)
    types_arr = np.asarray(types)
    pos_arr = np.asarray(positions, np.float32)

    orders = bond_order_matrix(pos_arr, types_arr)
    if (orders.sum(1) > constants.MAX_VALENCE[types_arr]).any():
        return None

    order = [j for lo, hi in frag_ranges for j in range(lo, hi)]
    n_frag = len(order)
    order += [j for lo, hi in linker_ranges for j in range(lo, hi)]
    inv = np.empty(n, int)
    inv[order] = np.arange(n)

    n_types = n_types or constants.NUMBER_OF_ATOM_TYPES
    one_hot = np.eye(n_types, dtype=np.float32)[
        np.clip(types_arr[order], 0, n_types - 1)]
    charges = np.asarray(
        [list(constants.CHARGES.values())[min(t, 7)] for t in types_arr[order]],
        np.float32)
    frag_mask = np.zeros(n, np.float32)
    frag_mask[:n_frag] = 1
    anchors = np.zeros(n, np.float32)
    anchors[inv[anchor_idx]] = 1

    pos_out = pos_arr[order]
    pos_out = pos_out - pos_out.mean(0, keepdims=True)
    return {
        'uuid': uuid, 'name': f'synthmf{k}_{uuid}',
        'positions': pos_out.astype(np.float32),
        'one_hot': one_hot, 'charges': charges, 'anchors': anchors,
        'fragment_mask': frag_mask, 'linker_mask': 1 - frag_mask,
        'num_atoms': n,
    }


def synthetic_multifrag_dataset(n_samples: int, *, seed: int = 0,
                                n_fragments=(3, 5), frag_range=(4, 7),
                                linker_seg_range=(2, 5),
                                topology: str = 'mixed',
                                is_geom: bool = True) -> LinkerDataset:
    """k-fragment dataset, k ~ U[n_fragments] per sample (GEOM multifrag
    miniature; is_geom widens one-hot to the 9-type GEOM vocabulary the geom
    configs train with)."""
    rng = np.random.default_rng(seed)
    n_types = (constants.GEOM_NUMBER_OF_ATOM_TYPES if is_geom
               else constants.NUMBER_OF_ATOM_TYPES)
    samples = []
    attempts = 0
    while len(samples) < n_samples and attempts < n_samples * 40:
        attempts += 1
        k = int(rng.integers(n_fragments[0], n_fragments[1] + 1))
        topo = topology
        if topology == 'mixed':
            topo = 'chain' if rng.random() < 0.5 else 'star'
        s = make_multifrag_sample(
            rng,
            frag_sizes=[int(rng.integers(*frag_range)) for _ in range(k)],
            linker_sizes=[int(rng.integers(*linker_seg_range))
                          for _ in range(k - 1)],
            uuid=len(samples), topology=topo, n_types=n_types)
        if s is not None:
            samples.append(s)
    if len(samples) < n_samples:
        raise RuntimeError(f'only generated {len(samples)}/{n_samples}')
    return LinkerDataset(samples)


def _linker_shell_positions(rng, sample: Dict, n_pocket: int):
    """Atoms on a thin shell 4-6 A from the linker centroid (outside bonding
    range of everything). Capacity is physically limited to ~40 atoms; use
    pocket_style='residues' for realistic pocket sizes."""
    pos = sample['positions']
    center = pos[sample['linker_mask'].astype(bool)].mean(0)
    shell = []
    for _ in range(n_pocket * 8):
        if len(shell) == n_pocket:
            break
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        cand = center + d * rng.uniform(4.0, 6.0)
        others = np.concatenate([pos] + ([np.asarray(shell)] if shell else []))
        if np.linalg.norm(others - cand, axis=1).min() > _MIN_NONBONDED:
            shell.append(cand)
    if len(shell) < n_pocket:
        return None
    return np.asarray(shell, np.float32)


def _residue_pocket_positions(rng, sample: Dict, n_pocket: int):
    """Residue-like bonded clusters in contact range of the whole ligand —
    the geometry the pocket CLIs actually produce from a real protein
    (generate_with_protein.py 6A-contact residues: dense 4-9-atom clusters
    of covalently spaced atoms surrounding fragments AND linker, 100-200
    atoms total). Each cluster grows as a short random walk at bonded
    spacing (1.40-1.55 A), seeded 4-7 A off a random ligand atom, clearing
    the ligand by >=3.2 A and other clusters by >=2.2 A."""
    ligand = sample['positions']
    clusters: List[List[np.ndarray]] = []

    def clear(cand, cluster):
        if np.linalg.norm(ligand - cand, axis=1).min() < 3.2:
            return False
        for other in clusters:
            if np.linalg.norm(np.asarray(other) - cand, axis=1).min() < 2.2:
                return False
        # a random walk may curl back on itself: keep non-bonded intra-
        # cluster pairs apart too
        return all(np.linalg.norm(cand - c) >= 1.2 for c in cluster)

    total = 0
    attempts = 0
    while total < n_pocket and attempts < n_pocket * 30:
        attempts += 1
        a = ligand[int(rng.integers(len(ligand)))]
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        seed_pos = a + d * rng.uniform(4.0, 7.0)
        if not clear(seed_pos, []):
            continue
        cluster = [seed_pos]
        cur = seed_pos
        for _ in range(int(rng.integers(3, 9))):
            for _try in range(10):
                d = rng.standard_normal(3)
                d /= np.linalg.norm(d)
                cand = cur + d * rng.uniform(1.40, 1.55)
                if clear(cand, cluster[:-1]):
                    cluster.append(cand)
                    cur = cand
                    break
            else:
                break
        if len(cluster) >= 3:  # no lone atoms: residues are bonded groups
            clusters.append(cluster)
            total += len(cluster)
    if total < n_pocket:
        return None
    # trim the overshoot from cluster tails (walk ends), never below 2 atoms
    # per cluster, so every kept atom retains a covalent-range neighbor
    excess = total - n_pocket
    for cluster in reversed(clusters):
        cut = min(excess, len(cluster) - 2)
        if cut > 0:
            del cluster[len(cluster) - cut:]
            excess -= cut
        if excess == 0:
            break
    if excess > 0:
        return None
    placed = [c for cluster in clusters for c in cluster]
    return np.asarray(placed, np.float32)


def _add_pocket_shell(rng, sample: Dict, n_pocket: int,
                      style: str = 'linker-shell') -> Optional[Dict]:
    """Append a synthetic 'pocket'. Layout becomes
    [fragments | pocket | linker] with the MOAD mask conventions."""
    pos = sample['positions']
    link = sample['linker_mask'].astype(bool)
    placer = {'linker-shell': _linker_shell_positions,
              'residues': _residue_pocket_positions}[style]
    shell = placer(rng, sample, n_pocket)
    if shell is None:
        return None
    n_frag = int(sample['fragment_mask'].sum())
    n_link = int(link.sum())
    n = n_frag + n_pocket + n_link

    pk_types = rng.integers(0, 3, n_pocket)  # C/O/N
    pk_oh = np.eye(sample['one_hot'].shape[-1], dtype=np.float32)[pk_types]
    order_pos = np.concatenate([pos[:n_frag], shell, pos[n_frag:]])
    order_oh = np.concatenate([sample['one_hot'][:n_frag], pk_oh,
                               sample['one_hot'][n_frag:]])
    charges = np.concatenate([
        sample['charges'][:n_frag],
        np.asarray([list(constants.CHARGES.values())[t] for t in pk_types],
                   np.float32),
        sample['charges'][n_frag:]])

    def seg(lo, hi):
        m = np.zeros(n, np.float32)
        m[lo:hi] = 1
        return m

    anchors = np.zeros(n, np.float32)
    anchors[np.where(sample['anchors'][:n_frag] > 0)[0]] = 1
    return {
        'uuid': sample['uuid'], 'name': sample['name'],
        'positions': (order_pos - order_pos.mean(0)).astype(np.float32),
        'one_hot': order_oh.astype(np.float32), 'charges': charges,
        'anchors': anchors,
        'fragment_only_mask': seg(0, n_frag),
        'pocket_mask': seg(n_frag, n_frag + n_pocket),
        'fragment_mask': seg(0, n_frag + n_pocket),
        'linker_mask': seg(n_frag + n_pocket, n),
        'num_atoms': n,
    }


def synthetic_molecule_dataset(n_samples: int, *, seed: int = 0,
                               frag_range=(4, 8), linker_range=(3, 8),
                               pocket_range=None,
                               pocket_style: str = 'linker-shell',
                               coupled_linker_size=False,
                               n_types: Optional[int] = None) -> LinkerDataset:
    """coupled_linker_size: make the linker size a function of the fragments
    instead of independent noise (independent sizes are unlearnable by
    construction — Bayes accuracy = the prior's). Two coupling rules:

      True / 'count': monotone in the total fragment atom count. A GLOBAL
        magnitude signal: every node contributes equally, only the pooled sum
        carries information (measured round 2/3: the reference architecture's
        batch-statistics pathway learns it in train mode but it does not
        survive eval-mode BatchNorm — scripts/demo_size_conditioned.py).
      'types': monotone in frag1's heteroatom (N+O) count — a NODE-LOCAL
        signal (each node's own one-hot decides its contribution), the kind
        real ZINC fragments carry and the reference SizeGNN provably learns
        (src/linker_size_lightning.py:14-172).
    """
    rng = np.random.default_rng(seed)
    lo, hi = linker_range
    samples = []
    attempts = 0
    while len(samples) < n_samples and attempts < n_samples * 20:
        attempts += 1
        n_frag1 = int(rng.integers(*frag_range))
        n_frag2 = int(rng.integers(*frag_range))
        n_linker_fn = None
        if coupled_linker_size == 'types':
            def n_linker_fn(frag1_types, _n1=n_frag1):
                # heteroatoms are _TYPES indices 1 (O) and 2 (N); frag1 has
                # _n1 atoms so the count spans 0.._n1 -> normalise by size
                n_het = sum(1 for t in frag1_types[:_n1] if t in (1, 2))
                frac = n_het / max(_n1 - 1, 1)
                return lo + int(round(min(frac, 1.0) * (hi - 1 - lo)))
            n_linker = lo  # placeholder, overridden after frag1 grows
        elif coupled_linker_size:
            # monotone in the total fragment atom count (a pooled GNN can
            # count atoms; a modular rule would be parity-like noise to it)
            span = (frag_range[1] - 1) * 2 - frag_range[0] * 2 + 1
            frac = (n_frag1 + n_frag2 - frag_range[0] * 2) / max(span - 1, 1)
            n_linker = lo + int(round(frac * (hi - 1 - lo)))
        else:
            n_linker = int(rng.integers(lo, hi))
        s = make_molecule_sample(
            rng,
            n_frag1=n_frag1,
            n_frag2=n_frag2,
            n_linker=n_linker,
            uuid=len(samples),
            n_linker_fn=n_linker_fn,
            n_types=n_types)
        if s is not None and pocket_range is not None:
            s = _add_pocket_shell(rng, s, int(rng.integers(*pocket_range)),
                                  style=pocket_style)
        if s is not None:
            samples.append(s)
    if len(samples) < n_samples:
        raise RuntimeError(f'only generated {len(samples)}/{n_samples}')
    return LinkerDataset(samples)
