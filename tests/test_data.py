"""Data layer: collate padding/bucketing, template creation, npz round-trip,
and compatibility with the reference collate on the same samples."""
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

# The reference src/datasets.py and src/const.py import rdkit at module level
# (unavailable in this image); only its SDF parser and bond enums are touched,
# neither of which these tests exercise — stub just enough to import.
if 'rdkit' not in sys.modules:
    rdkit = types.ModuleType('rdkit')
    chem = types.ModuleType('rdkit.Chem')
    rdchem = types.SimpleNamespace(BondType=types.SimpleNamespace(
        SINGLE=1, DOUBLE=2, TRIPLE=3, AROMATIC=4))
    chem.rdchem = rdchem
    chem.SDMolSupplier = None
    rdkit.Chem = chem
    sys.modules['rdkit'] = rdkit
    sys.modules['rdkit.Chem'] = chem

from difflinker_tpu.data import collate as collate_lib
from difflinker_tpu.data.datasets import (load_npz_dataset, save_npz_dataset,
                                          synthetic_dataset)


def test_collate_shapes_and_masks():
    ds = synthetic_dataset(7, seed=1)
    batch = collate_lib.collate(ds.samples, n_nodes=32)
    B = 7
    assert batch['positions'].shape == (B, 32, 3)
    assert batch['one_hot'].shape == (B, 32, 8)
    assert batch['atom_mask'].shape == (B, 32, 1)
    assert batch['edge_mask'].shape == (B, 32, 32, 1)
    # reference value convention: -1 real pairs, -2 real self-loops, 0 padding
    em = batch['edge_mask'][..., 0]
    nm = batch['atom_mask'][..., 0]
    diag = np.diagonal(em, axis1=1, axis2=2)
    assert set(np.unique(diag)) <= {0.0, -2.0}
    assert set(np.unique(em)) <= {0.0, -1.0, -2.0}
    assert ((em != 0) <= (nm[:, :, None] * nm[:, None, :]).astype(bool)).all()
    # atom_mask == fragment | linker
    assert np.array_equal(
        nm, ((batch['fragment_mask'][..., 0] > 0)
             | (batch['linker_mask'][..., 0] > 0)).astype(np.float32))


def test_collate_matches_reference(rng):
    """Our dense collate == reference collate (torch) on identical samples."""
    import torch
    from src.datasets import collate as ref_collate

    ds = synthetic_dataset(5, seed=2)
    # the reference pads to the batch max; force our bucket to match
    max_n = max(s['num_atoms'] for s in ds.samples)
    ours = collate_lib.collate(ds.samples, n_nodes=max_n)

    tbatch = [{k: (torch.tensor(v) if isinstance(v, np.ndarray) else v)
               for k, v in s.items()} for s in ds.samples]
    theirs = ref_collate(tbatch)

    np.testing.assert_array_equal(ours['positions'], theirs['positions'].numpy())
    np.testing.assert_array_equal(ours['one_hot'], theirs['one_hot'].numpy())
    np.testing.assert_array_equal(
        ours['atom_mask'], theirs['atom_mask'].numpy().astype(np.float32))
    B, N = ours['positions'].shape[:2]
    np.testing.assert_array_equal(
        ours['edge_mask'].reshape(B * N * N, 1),
        theirs['edge_mask'].numpy().astype(np.float32))
    np.testing.assert_array_equal(
        ours['fragment_mask'], theirs['fragment_mask'].numpy())


def test_templates_match_reference(rng):
    import torch
    from src.datasets import (collate as ref_collate,
                              create_templates_for_linker_generation as ref_templates)

    ds = synthetic_dataset(4, seed=3)
    max_n = max(s['num_atoms'] for s in ds.samples)
    batch = collate_lib.collate(ds.samples, n_nodes=max_n)
    sizes = [5, 8, 3, 11]

    tbatch = [{k: (torch.tensor(v) if isinstance(v, np.ndarray) else v)
               for k, v in s.items()} for s in ds.samples]
    ref = ref_templates(ref_collate(tbatch), torch.tensor(sizes))
    ref_n = ref['positions'].shape[1]

    ours = collate_lib.create_templates_for_linker_generation(
        batch, sizes, n_nodes=ref_n)
    for k in ('positions', 'one_hot', 'fragment_mask', 'linker_mask', 'anchors'):
        np.testing.assert_array_equal(
            ours[k], ref[k].numpy().astype(np.float32), err_msg=k)
    np.testing.assert_array_equal(
        ours['atom_mask'], ref['atom_mask'].numpy().astype(np.float32))


def test_bucket_iteration():
    ds = synthetic_dataset(40, seed=4, n_frag_range=(4, 30),
                           n_link_range=(3, 12))
    seen = 0
    for batch in ds.iter_batches(8):
        B, N = batch['positions'].shape[:2]
        assert N in ds.buckets
        assert batch['positions'][..., 0].shape == (B, N)
        # every sample fits its bucket with the smallest bucket chosen
        n_max = int(batch['atom_mask'].sum(axis=(1, 2)).max())
        assert n_max <= N
        seen += B
    assert seen == 40


def test_npz_roundtrip(tmp_path):
    ds = synthetic_dataset(6, seed=5, pocket_range=(3, 6), is_geom=True)
    p = str(tmp_path / 'ds.npz')
    save_npz_dataset(ds.samples, p)
    back = load_npz_dataset(p)
    assert len(back) == 6
    for a, b in zip(ds.samples, back):
        np.testing.assert_array_equal(a['positions'], b['positions'])
        np.testing.assert_array_equal(a['pocket_mask'], b['pocket_mask'])
        assert a['num_atoms'] == b['num_atoms']


def test_bucket_overflow_raises():
    ds = synthetic_dataset(2, seed=6)
    with pytest.raises(ValueError):
        collate_lib.collate(ds.samples, n_nodes=4)


def test_edge_mask_helpers_agree(rng):
    """collate.reference_edge_mask (numpy) and ops.geometry.fc_edge_mask
    (jnp) implement the same checkpoint-critical {0,-1,-2} convention."""
    import jax.numpy as jnp
    from difflinker_tpu.ops.geometry import fc_edge_mask
    nm = (rng.random((3, 9)) < 0.7).astype(np.float32)
    a = collate_lib.reference_edge_mask(nm)
    b = np.asarray(fc_edge_mask(jnp.asarray(nm)[..., None]))
    np.testing.assert_array_equal(a, b)


def test_fragment_edges_collate_matches_reference(rng):
    """fragment_edges_only collate == reference collate_with_fragment_edges
    (src/datasets.py:378-422) for the padded arrays + edge mask."""
    import torch
    from src.datasets import collate_with_fragment_edges as ref_collate

    ds = synthetic_dataset(4, seed=7)
    max_n = max(s['num_atoms'] for s in ds.samples)
    ours = collate_lib.collate(ds.samples, n_nodes=max_n,
                               fragment_edges_only=True)

    tbatch = [{k: (torch.tensor(v) if isinstance(v, np.ndarray) else v)
               for k, v in s.items()} for s in ds.samples]
    theirs = ref_collate(tbatch)

    B, N = ours['positions'].shape[:2]
    np.testing.assert_array_equal(
        ours['edge_mask'].reshape(B * N * N, 1),
        theirs['edge_mask'].numpy().astype(np.float32))
    np.testing.assert_array_equal(
        ours['atom_mask'], theirs['atom_mask'].numpy().astype(np.float32))
    np.testing.assert_array_equal(ours['positions'],
                                  theirs['positions'].numpy())


def test_packed_dataset_matches_collate():
    """PackedDataset batches == per-batch collate on the same samples."""
    from difflinker_tpu.data.packed import PackedDataset
    ds = synthetic_dataset(20, seed=9)
    packed = PackedDataset(ds.samples)
    assert len(packed) == 20

    ref_batches = {}
    for b in ds.iter_batches(4):
        for u, i in zip(np.asarray(b['uuid']).tolist(),
                        range(b['positions'].shape[0])):
            ref_batches[u] = {k: b[k][i] for k in
                              ('positions', 'one_hot', 'atom_mask',
                               'fragment_mask', 'linker_mask', 'anchors')}
    seen = 0
    for b in packed.iter_batches(4):
        B, N = b['positions'].shape[:2]
        assert b['edge_mask'].shape == (B, N, N, 1)
        for i, u in enumerate(np.asarray(b['uuid']).tolist()):
            for k, ref in ref_batches[u].items():
                np.testing.assert_array_equal(b[k][i], ref, err_msg=k)
            seen += 1
    assert seen == 20


def test_packed_dataset_speed_shape():
    """Packing gives identical edge-mask values to the canonical collate."""
    from difflinker_tpu.data.packed import PackedDataset
    ds = synthetic_dataset(8, seed=10)
    packed = PackedDataset(ds.samples)
    b = next(packed.iter_batches(8))
    em = b['edge_mask'][..., 0]
    assert set(np.unique(em)) <= {0.0, -1.0, -2.0}
