"""Dataset loading: reference `.pt` artifacts, npz caches, CSV+SDF
preprocessing, and a synthetic generator for tests/benchmarks.

The reference stores preprocessed datasets as torch pickles of per-molecule
dicts (src/datasets.py:40-222). We read those once (torch CPU, import-gated),
convert to numpy and cache as a compressed `.npz` bundle; training never
touches torch. Layout convention is preserved: atoms ordered
[fragment | (pocket) | linker], masks as float vectors.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from difflinker_tpu import constants
from difflinker_tpu.data.collate import collate

ARRAY_KEYS = ('positions', 'one_hot', 'charges', 'anchors', 'fragment_mask',
              'linker_mask', 'pocket_mask', 'fragment_only_mask')


def _to_numpy_sample(d: Dict) -> Dict:
    out = {}
    for k, v in d.items():
        if k in ARRAY_KEYS:
            arr = v.detach().cpu().numpy() if hasattr(v, 'detach') else np.asarray(v)
            out[k] = arr.astype(np.float32)
        else:
            out[k] = v
    return out


def load_pt_dataset(path: str) -> List[Dict]:
    """Load a reference `{prefix}.pt` torch pickle into numpy sample dicts."""
    import torch
    data = torch.load(path, map_location='cpu', weights_only=False)
    return [_to_numpy_sample(d) for d in data]


def _npz_cache_path(path: str) -> str:
    return os.path.splitext(path)[0] + '.cache.npz'


def save_npz_dataset(samples: List[Dict], path: str) -> None:
    """Flatten the list-of-dicts into one npz: arrays concatenated with
    per-sample offsets (fast mmap-able reload without torch)."""
    flat = {}
    n = len(samples)
    lengths = np.asarray([s['positions'].shape[0] for s in samples], np.int64)
    flat['__lengths__'] = lengths
    flat['__uuid__'] = np.asarray([s.get('uuid', i) for i, s in enumerate(samples)])
    names = [str(s.get('name', '')) for s in samples]
    flat['__name__'] = np.asarray(names)
    for k in ARRAY_KEYS:
        if k in samples[0]:
            flat[k] = np.concatenate([np.asarray(s[k], np.float32).reshape(
                s[k].shape[0], -1) for s in samples], axis=0)
    np.savez_compressed(path, **flat)


def load_npz_dataset(path: str) -> List[Dict]:
    z = np.load(path, allow_pickle=False)
    lengths = z['__lengths__']
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    samples = []
    keys = [k for k in ARRAY_KEYS if k in z]
    for i in range(len(lengths)):
        s: Dict = {'uuid': z['__uuid__'][i].item() if z['__uuid__'].dtype.kind in 'iu'
                   else str(z['__uuid__'][i]),
                   'name': str(z['__name__'][i]),
                   'num_atoms': int(lengths[i])}
        for k in keys:
            arr = z[k][offsets[i]:offsets[i + 1]]
            if k == 'positions':
                arr = arr.reshape(-1, 3)
            elif k == 'one_hot':
                arr = arr.reshape(lengths[i], -1)
            else:
                arr = arr.reshape(-1)
            s[k] = arr.astype(np.float32)
        samples.append(s)
    return samples


class LinkerDataset:
    """In-memory dataset of per-molecule dicts with bucketed batch iteration.

    Equivalent role to ZincDataset/MOADDataset + DataLoader
    (src/datasets.py:40-222,472-473), redesigned for fixed shapes: batches are
    grouped by size bucket so each (batch, bucket) shape compiles once.
    """

    def __init__(self, samples: List[Dict],
                 buckets: Optional[Sequence[int]] = None):
        self.samples = samples
        self.buckets = tuple(buckets or constants.DEFAULT_SIZE_BUCKETS)

    def spatially_sorted(self) -> 'LinkerDataset':
        """Copy with pocket rows Morton-ordered (data/spatial.py) — improves
        the exact-coverage M of the block-sparse tile layout
        (ModelConfig.tile_size). No-op for pocket-free samples."""
        from difflinker_tpu.data.spatial import sort_pocket_rows
        return LinkerDataset([sort_pocket_rows(s) for s in self.samples],
                             self.buckets)

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_pt(cls, data_path: str, prefix: str, use_cache: bool = True,
                buckets=None) -> 'LinkerDataset':
        pocket_mode = None
        if '.' in prefix:
            # MOAD convention: 'MOAD_train.full' is stored as
            # 'MOAD_train_full.pt' (src/datasets.py:110-117)
            prefix, pocket_mode = prefix.split('.')
            pt_path = os.path.join(data_path, f'{prefix}_{pocket_mode}.pt')
        else:
            pt_path = os.path.join(data_path, f'{prefix}.pt')
        cache = _npz_cache_path(pt_path)
        if use_cache and os.path.exists(cache):
            return cls(load_npz_dataset(cache), buckets)
        if os.path.exists(pt_path):
            samples = load_pt_dataset(pt_path)
        else:
            samples = preprocess_sdf_tables(data_path, prefix,
                                            pocket_mode=pocket_mode)
        if use_cache:
            try:
                save_npz_dataset(samples, cache)
            except OSError:
                pass
        return cls(samples, buckets)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    # -- iteration -----------------------------------------------------------

    def iter_batches(self, batch_size: int, *, shuffle: bool = False,
                     seed: int = 0, drop_last: bool = False,
                     group_by_bucket: bool = True,
                     **collate_kwargs) -> Iterator[Dict[str, np.ndarray]]:
        """Yield padded batches. With `group_by_bucket`, samples are grouped so
        each batch pads to its own bucket (minimal padding waste, bounded
        program count)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)

        if group_by_bucket:
            by_bucket: Dict[int, list] = {}
            for idx in order:
                b = _bucket_of(self[idx], self.buckets)
                by_bucket.setdefault(b, []).append(idx)
            groups = [(b, idxs) for b, idxs in sorted(by_bucket.items())]
        else:
            n = max(_bucket_of(self[i], self.buckets) for i in order)
            groups = [(n, list(order))]

        for bucket, idxs in groups:
            for i in range(0, len(idxs), batch_size):
                chunk = idxs[i:i + batch_size]
                if drop_last and len(chunk) < batch_size:
                    continue
                yield collate([self[j] for j in chunk],
                              n_nodes=bucket, **collate_kwargs)


class DeduplicatedPocketDataset(LinkerDataset):
    """Storage-deduplicated pocket dataset: per-fragmentation masks reference
    shared per-protein tensors (reference OptimisedMOADDataset,
    src/datasets.py:225-329 — many fragmentations of one ligand share the same
    positions/one-hot/pocket arrays)."""

    MASK_KEYS = ('anchors', 'fragment_only_mask', 'pocket_mask',
                 'fragment_mask', 'linker_mask')
    SHARED_KEYS = ('positions', 'one_hot', 'charges')

    def __init__(self, fragmentations: List[Dict], proteins: Dict[str, Dict],
                 buckets=None):
        self.fragmentations = fragmentations
        self.proteins = proteins
        self.buckets = tuple(buckets or constants.DEFAULT_SIZE_BUCKETS)

    @classmethod
    def from_samples(cls, samples: List[Dict], buckets=None):
        """Split flat samples into fragmentation-level + protein-level parts,
        deduplicating by molecule name."""
        proteins: Dict[str, Dict] = {}
        frags = []
        for s in samples:
            name = str(s['name'])
            proteins.setdefault(name, {k: s[k] for k in cls.SHARED_KEYS
                                       if k in s} | {'num_atoms': s['num_atoms']})
            frags.append({'uuid': s['uuid'], 'name': name,
                          **{k: s[k] for k in cls.MASK_KEYS if k in s}})
        return cls(frags, proteins, buckets)

    @property
    def samples(self):
        return [self[i] for i in range(len(self))]

    def __len__(self):
        return len(self.fragmentations)

    def __getitem__(self, i):
        f = self.fragmentations[i]
        return {**f, **self.proteins[f['name']]}


def _bucket_of(sample: Dict, buckets) -> int:
    n = int(np.asarray(sample['positions']).shape[0])
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f'sample with {n} atoms exceeds largest bucket')


# ---------------------------------------------------------------------------
# CSV + SDF preprocessing (reference ZincDataset.preprocess,
# src/datasets.py:56-100; MOAD variant :131-222). Requires rdkit for SDF
# parsing — import-gated; the released .pt artifacts don't need it.
# ---------------------------------------------------------------------------

def preprocess_sdf_tables(data_path: str, prefix: str,
                          pocket_mode: Optional[str] = None) -> List[Dict]:
    import pandas as pd
    from difflinker_tpu.chem.io_rdkit import read_sdf, parse_molecule

    is_geom = ('geom' in prefix) or ('MOAD' in prefix) or pocket_mode is not None
    is_multifrag = 'multifrag' in prefix

    table = pd.read_csv(os.path.join(data_path, f'{prefix}_table.csv'))
    frag_iter = read_sdf(os.path.join(data_path, f'{prefix}_frag.sdf'))
    link_iter = read_sdf(os.path.join(data_path, f'{prefix}_link.sdf'))

    pockets = None
    if pocket_mode is not None:
        with open(os.path.join(data_path, f'{prefix}_pockets.pkl'), 'rb') as f:
            pockets = pickle.load(f)

    samples = []
    for row_idx, ((_, row), fragments, linker) in enumerate(
            zip(table.iterrows(), frag_iter, link_iter)):
        frag_pos, frag_oh, frag_q = parse_molecule(fragments, is_geom=is_geom)
        link_pos, link_oh, link_q = parse_molecule(linker, is_geom=is_geom)

        parts_pos, parts_oh, parts_q = [frag_pos], [frag_oh], [frag_q]
        n_pocket = 0
        if pockets is not None:
            pk = pockets[row_idx]
            a2i, _, charges = constants.vocab_for(True)
            types = pk[f'{pocket_mode}_types']
            pk_oh = np.eye(len(a2i), dtype=np.float32)[[a2i[t] for t in types]]
            pk_q = np.asarray([charges[t] for t in types], np.float32)
            parts_pos.insert(1, np.asarray(pk[f'{pocket_mode}_coord'], np.float32))
            parts_oh.insert(1, pk_oh)
            parts_q.insert(1, pk_q)
            n_pocket = len(pk_q)

        positions = np.concatenate(parts_pos + [link_pos], axis=0)
        one_hot = np.concatenate(parts_oh + [link_oh], axis=0)
        charges_arr = np.concatenate(parts_q + [link_q], axis=0)

        n_frag, n_link = len(frag_q), len(link_q)
        n_total = n_frag + n_pocket + n_link
        anchors = np.zeros(n_total, np.float32)
        if is_multifrag:
            for a in map(int, str(row['anchors']).split('-')):
                anchors[a] = 1
        else:
            anchors[int(row['anchor_1'])] = 1
            anchors[int(row['anchor_2'])] = 1

        def seg(lo, hi):
            m = np.zeros(n_total, np.float32)
            m[lo:hi] = 1
            return m

        sample = {
            'uuid': row['uuid'], 'name': row['molecule'],
            'positions': positions.astype(np.float32),
            'one_hot': one_hot.astype(np.float32),
            'charges': charges_arr.astype(np.float32),
            'anchors': anchors,
            'fragment_mask': seg(0, n_frag + n_pocket),
            'linker_mask': seg(n_frag + n_pocket, n_total),
            'num_atoms': n_total,
        }
        if pockets is not None:
            sample['fragment_only_mask'] = seg(0, n_frag)
            sample['pocket_mask'] = seg(n_frag, n_frag + n_pocket)
        samples.append(sample)
    return samples


# ---------------------------------------------------------------------------
# Synthetic data (tests, benchmarks, demos — no dataset download needed)
# ---------------------------------------------------------------------------

def synthetic_dataset(n_samples: int, *, seed: int = 0, is_geom: bool = False,
                      n_frag_range=(8, 16), n_link_range=(3, 12),
                      pocket_range=None) -> LinkerDataset:
    """Random geometrically-plausible fragment/linker point clouds in the
    canonical sample-dict layout."""
    rng = np.random.default_rng(seed)
    nf = (constants.GEOM_NUMBER_OF_ATOM_TYPES if is_geom
          else constants.NUMBER_OF_ATOM_TYPES)
    samples = []
    for i in range(n_samples):
        n_frag = int(rng.integers(*n_frag_range))
        n_link = int(rng.integers(*n_link_range))
        n_pocket = int(rng.integers(*pocket_range)) if pocket_range else 0
        n = n_frag + n_pocket + n_link
        pos = rng.standard_normal((n, 3)).astype(np.float32) * 2.5
        types = rng.integers(0, nf, n)
        one_hot = np.eye(nf, dtype=np.float32)[types]
        charges = np.asarray(
            [list(constants.vocab_for(is_geom)[2].values())[t] for t in types],
            np.float32)
        anchors = np.zeros(n, np.float32)
        anchors[rng.integers(0, n_frag)] = 1
        anchors[rng.integers(0, n_frag)] = 1

        def seg(lo, hi):
            m = np.zeros(n, np.float32)
            m[lo:hi] = 1
            return m

        s = {
            'uuid': i, 'name': f'synthetic_{i}',
            'positions': pos, 'one_hot': one_hot, 'charges': charges,
            'anchors': anchors,
            'fragment_mask': seg(0, n_frag + n_pocket),
            'linker_mask': seg(n_frag + n_pocket, n),
            'num_atoms': n,
        }
        if pocket_range:
            s['fragment_only_mask'] = seg(0, n_frag)
            s['pocket_mask'] = seg(n_frag, n_frag + n_pocket)
        samples.append(s)
    return LinkerDataset(samples)
