"""Pure graph/array logic for dataset preparation (no RDKit).

The GEOM multi-fragment pipeline enumerates which BRICS/MMPA fragments can act
as linkers by walking the fragment-adjacency graph
(data/geom/generate_geom_multifrag.py:58-110): a linker set of order k is a
set of k internal fragments whose removal leaves every remaining fragment
connected to the linker subgraph properly. Also hosts the stratified
train/val/test split (data/geom/train_test_split.py:42-55).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

import numpy as np


def connected_linkers_order1(neighbors: np.ndarray) -> Set[Tuple[int, ...]]:
    """Single-fragment linkers: internal fragments with >2 neighbours...
    the reference uses `sum > 2` on an adjacency WITH self-loops? No — plain
    adjacency; a fragment joining >2 others, or exactly 2 (a middle piece).
    Reference: candidates = neighbors.sum(0) > 2 for 1st-order multi-frag
    linkers (generate_geom_multifrag.py:58-64)."""
    candidates = np.where(neighbors.sum(0) > 2)[0]
    return {(int(c),) for c in candidates}


def linkers_order2(neighbors: np.ndarray) -> Set[Tuple[int, ...]]:
    """Pairs of internal fragments that are 2nd-order neighbours forming a
    path fragment—L1—L2—fragment (generate_geom_multifrag.py:66-84)."""
    initial = np.where(neighbors.sum(0) > 1)[0]
    sub = neighbors[np.ix_(initial, initial)]
    n = sub.shape[0]
    if n == 0:
        return set()
    second = ((sub @ sub) > 0).astype(int) * (1 - sub) - np.eye(n)
    candidates = set(np.where(np.diag(second @ second))[0])
    pairs = set()
    for a in candidates:
        for b in set(np.where(second[a] > 0)[0]) & candidates:
            la, lb = int(initial[a]), int(initial[b])
            if la != lb:
                pairs.add(tuple(sorted((la, lb))))
    return pairs


def linkers_order3(neighbors: np.ndarray) -> Set[Tuple[int, ...]]:
    """Triples of fragments that are pairwise 3rd-order neighbours
    (generate_geom_multifrag.py:86-110)."""
    initial = np.where(neighbors.sum(0) > 1)[0]
    sub = neighbors[np.ix_(initial, initial)]
    n = sub.shape[0]
    if n == 0:
        return set()
    third = ((sub @ sub @ sub) > 0).astype(int) * (1 - sub) - np.eye(n)
    candidates = set(np.where(np.diag(third @ third @ third))[0])
    triples = set()
    for a in candidates:
        rest = candidates - {a}
        rest_a = set(np.where(third[a] > 0)[0]) & rest
        for b in rest_a:
            for c in rest_a - {b}:
                la, lb, lc = int(initial[a]), int(initial[b]), int(initial[c])
                if len({la, lb, lc}) == 3:
                    triples.add(tuple(sorted((la, lb, lc))))
    return triples


def enumerate_linker_sets(neighbors: np.ndarray, max_order: int = 3
                          ) -> List[Tuple[int, ...]]:
    out: Set[Tuple[int, ...]] = set()
    out |= connected_linkers_order1(neighbors)
    if max_order >= 2:
        out |= linkers_order2(neighbors)
    if max_order >= 3:
        out |= linkers_order3(neighbors)
    return sorted(out)


def fragment_adjacency(n_frags: int,
                       bonds_between: Sequence[Tuple[int, int]]) -> np.ndarray:
    adj = np.zeros((n_frags, n_frags), int)
    for a, b in bonds_between:
        if a != b:
            adj[a, b] = adj[b, a] = 1
    return adj


def stratified_split(keys: Sequence[Tuple], n_val: int, n_test: int,
                     seed: int = 0) -> Dict[str, np.ndarray]:
    """Stratified by key (e.g. (linker_size, num_linkers)): proportional
    sampling per stratum into val/test, remainder train
    (data/geom/train_test_split.py:42-55)."""
    keys = list(keys)
    n = len(keys)
    assert n_val + n_test <= n, 'not enough samples for the requested split'
    rng = np.random.default_rng(seed)
    by_key: Dict[Tuple, list] = {}
    for i, k in enumerate(keys):
        by_key.setdefault(k, []).append(i)
    strata = sorted(by_key.items())
    for _, idxs in strata:
        rng.shuffle(idxs)

    def allocate(total: int) -> list:
        """Largest-remainder apportionment of `total` picks across strata —
        hits the exact requested size while staying proportional."""
        quotas = [len(idxs) / n * total for _, idxs in strata]
        counts = [int(q) for q in quotas]
        short = total - sum(counts)
        order = np.argsort([c - q for q, c in zip(quotas, counts)])
        for j in order[:short]:
            counts[j] += 1
        return counts

    val_counts = allocate(n_val)
    test_counts = allocate(n_test)
    val, test = [], []
    for (k, idxs), kv, kt in zip(strata, val_counts, test_counts):
        kv = min(kv, len(idxs))
        kt = min(kt, len(idxs) - kv)
        val.extend(idxs[:kv])
        test.extend(idxs[kv:kv + kt])
    # tiny strata can undershoot; top up from the largest remaining strata
    remaining = [i for _, idxs in strata for i in idxs
                 if i not in set(val) and i not in set(test)]
    val.extend(remaining[:max(0, n_val - len(val))])
    taken = set(val) | set(test)
    remaining = [i for i in remaining if i not in taken]
    test.extend(remaining[:max(0, n_test - len(test))])
    train = [i for i in range(n) if i not in set(val) and i not in set(test)]
    return {'train': np.asarray(sorted(train)),
            'val': np.asarray(sorted(val)),
            'test': np.asarray(sorted(test))}
