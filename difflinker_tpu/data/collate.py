"""Padded, bucketed batch assembly (numpy, host-side).

TPU-first replacement for the reference collate functions
(src/datasets.py:332-469): instead of padding each batch to its own max size
(a new XLA program per max-N), samples are padded to a fixed *size bucket* so
every (batch_size, bucket) pair compiles exactly once. The dense edge mask is
the (B, N, N, 1) FC-minus-diagonal formulation the reference already uses for
ZINC (src/datasets.py:366-369); pocket models ignore it and rebuild distance
graphs in-model.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from difflinker_tpu import constants

PAD_KEYS = constants.DATA_ATTRS_TO_PAD
LIST_KEYS = constants.DATA_LIST_ATTRS
LAST_DIM_KEYS = constants.DATA_ATTRS_TO_ADD_LAST_DIM


def pick_bucket(n: int, buckets: Optional[Sequence[int]] = None) -> int:
    buckets = buckets or constants.DEFAULT_SIZE_BUCKETS
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f'molecule with {n} atoms exceeds the largest bucket '
                     f'{buckets[-1]}')


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    pad = n - arr.shape[0]
    if pad < 0:
        raise ValueError(f'sample with {arr.shape[0]} atoms does not fit N={n}')
    if pad == 0:
        return np.asarray(arr, np.float32)
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr, np.float32), widths)


def collate(samples: List[Dict], n_nodes: Optional[int] = None,
            buckets: Optional[Sequence[int]] = None,
            fragment_edges_only: bool = False,
            without_pocket_edges: bool = False) -> Dict[str, np.ndarray]:
    """Assemble a list of per-molecule dicts into one padded batch.

    Args:
      samples: dicts with at least positions/one_hot/fragment_mask/linker_mask
        (+ charges/anchors/pocket_mask/fragment_only_mask when present).
      n_nodes: fixed padded size; default = bucket of the largest sample.
      fragment_edges_only: edge mask spans fragment atoms only — the SizeGNN
        collate variant (src/datasets.py:378-422).
      without_pocket_edges: like the above but keyed on fragment_only_mask —
        size prediction ignores the pocket (src/datasets.py:425-469).

    Returns a dict of float32 arrays: padded per-atom attrs (B, N, ...),
    `atom_mask` (B, N, 1), dense `edge_mask` (B, N, N, 1), plus passthrough
    list attrs (uuid/name/...).
    """
    assert samples, 'empty batch'
    max_atoms = max(int(np.asarray(s['positions']).shape[0]) for s in samples)
    if n_nodes is None:
        n_nodes = pick_bucket(max_atoms, buckets)

    out: Dict[str, list] = {}
    for s in samples:
        for k, v in s.items():
            out.setdefault(k, []).append(v)

    batch: Dict[str, np.ndarray] = {}
    for k, vals in out.items():
        if k in LIST_KEYS:
            batch[k] = (np.asarray(vals) if k in ('uuid', 'num_atoms')
                        else vals)
            continue
        if k in PAD_KEYS:
            batch[k] = np.stack([_pad_rows(np.asarray(v), n_nodes) for v in vals])
            continue
        raise KeyError(f'unknown batch key: {k}')

    for k in LAST_DIM_KEYS:
        if k in batch and batch[k].ndim == 2:
            batch[k] = batch[k][..., None]

    atom_mask = ((batch['fragment_mask'][..., 0] > 0)
                 | (batch['linker_mask'][..., 0] > 0)).astype(np.float32)
    batch['atom_mask'] = atom_mask[..., None]

    if fragment_edges_only:
        em_src = batch['fragment_mask'][..., 0]
    elif without_pocket_edges:
        em_src = batch['fragment_only_mask'][..., 0]
    else:
        em_src = atom_mask
    batch['edge_mask'] = reference_edge_mask(em_src)
    return batch


def reference_edge_mask(node_vec: np.ndarray) -> np.ndarray:
    """Dense FC edge mask with the reference's exact (quirky) values.

    The reference computes `edge_mask *= ~torch.eye(N, dtype=int8)`
    (src/datasets.py:366-369) — on an int8 tensor `~` is BITWISE not, so the
    "mask" is -1 for real off-diagonal pairs, -2 on real self-loops and 0 on
    padding. The released checkpoints were trained with messages multiplied by
    these values (GCL: `out = out * edge_mask`, src/egnn.py:58-59), so
    checkpoint fidelity requires reproducing them; natively-trained models
    simply learn around the constant -1 scale. node_vec: (B, N) 0/1 →
    (B, N, N, 1) float32 in {0, -1, -2}.
    """
    base = node_vec[:, :, None] * node_vec[:, None, :]
    n = base.shape[-1]
    bitwise_not_eye = -(1.0 + np.eye(n, dtype=np.float32))  # ~eye over int8
    return (base * bitwise_not_eye)[..., None].astype(np.float32)


def create_template(arr: np.ndarray, fragment_size: int, linker_size: int,
                    fill: float = 0.0) -> np.ndarray:
    """Keep the first fragment_size rows, append linker_size constant rows
    (src/datasets.py:476-481)."""
    arr = np.asarray(arr, np.float32)
    keep = arr[:fragment_size]
    add = np.full((linker_size,) + arr.shape[1:], fill, np.float32)
    return np.concatenate([keep, add], axis=0)


def create_templates_for_linker_generation(
        batch: Dict[str, np.ndarray], linker_sizes: Sequence[int],
        n_nodes: Optional[int] = None,
        buckets: Optional[Sequence[int]] = None) -> Dict[str, np.ndarray]:
    """Sampling-time re-batching (src/datasets.py:483-512): keep each sample's
    fragment rows, append `linker_size` zero rows (linker_mask filled with 1),
    then re-collate padded to a bucket so downstream programs stay fixed-shape.
    """
    decoupled = []
    for i, linker_size in enumerate(linker_sizes):
        linker_size = int(linker_size)
        fragment_size = int(np.asarray(batch['fragment_mask'][i]).sum())
        d = {}
        for k, v in batch.items():
            if k in ('atom_mask', 'edge_mask'):
                continue
            if k == 'num_atoms':
                d[k] = fragment_size + linker_size
                continue
            if k in LIST_KEYS:
                d[k] = v[i]
                continue
            if k in PAD_KEYS:
                fill = 1.0 if k == 'linker_mask' else 0.0
                arr = np.asarray(v[i])
                # drop padded rows: fragment atoms occupy the first rows by
                # dataset construction ([fragment | (pocket) | linker])
                template = create_template(arr, fragment_size, linker_size, fill)
                d[k] = template[..., 0] if k in LAST_DIM_KEYS and template.ndim == 2 else template
                continue
        decoupled.append(d)
    return collate(decoupled, n_nodes=n_nodes, buckets=buckets)
