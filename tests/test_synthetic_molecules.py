"""Geometrically realistic synthetic molecules: validity under the
framework's own bond perception, layout invariants."""
import numpy as np

from difflinker_tpu.chem import metrics
from difflinker_tpu.chem.molgraph import build_molecule
from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset


def test_generated_molecules_are_valid():
    ds = synthetic_molecule_dataset(20, seed=3)
    for s in ds.samples:
        mol = build_molecule(s['positions'], s['one_hot'].argmax(-1),
                             is_geom=False)
        assert metrics.is_valid(mol)
        assert metrics.is_connected(mol)


def test_sample_layout():
    ds = synthetic_molecule_dataset(10, seed=4)
    for s in ds.samples:
        n = s['num_atoms']
        fm, lm = s['fragment_mask'], s['linker_mask']
        assert fm.shape == (n,)
        # fragments first, linker last; masks partition the atoms
        np.testing.assert_array_equal(fm + lm, np.ones(n))
        n_frag = int(fm.sum())
        assert (fm[:n_frag] == 1).all() and (lm[n_frag:] == 1).all()
        # two anchors, both fragment atoms
        assert s['anchors'].sum() == 2
        assert (s['anchors'] * fm == s['anchors']).all()
        # centred
        assert np.abs(s['positions'].mean(0)).max() < 1e-4


def test_linker_connects_fragments():
    """Removing the linker atoms must disconnect the two fragments."""
    ds = synthetic_molecule_dataset(10, seed=5)
    for s in ds.samples:
        mol = build_molecule(s['positions'], s['one_hot'].argmax(-1),
                             is_geom=False)
        frag_idx = np.where(s['fragment_mask'] > 0)[0]
        frags_only = mol.subgraph(frag_idx)
        assert not frags_only.is_connected()


def test_pocket_shell_generation():
    ds = synthetic_molecule_dataset(5, seed=7, pocket_range=(6, 10))
    from difflinker_tpu.chem.bonds import bond_order_matrix
    for s in ds.samples:
        pk = s['pocket_mask'].astype(bool)
        assert pk.sum() >= 6
        # MOAD mask conventions
        np.testing.assert_array_equal(
            s['fragment_mask'], s['fragment_only_mask'] + s['pocket_mask'])
        total = s['fragment_only_mask'] + s['pocket_mask'] + s['linker_mask']
        np.testing.assert_array_equal(total, np.ones(s['num_atoms']))
        # pocket atoms never bond to the ligand
        orders = bond_order_matrix(s['positions'], s['one_hot'].argmax(-1))
        assert orders[pk][:, ~pk].sum() == 0


def test_coupled_linker_size_rule():
    """coupled_linker_size makes the linker size a deterministic monotone
    function of the total fragment atom count (the only signal a
    fragment-only size model can read from this generator)."""
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset

    ds = synthetic_molecule_dataset(60, seed=3, coupled_linker_size=True)
    seen = {}
    for s in ds.samples:
        n_frag = int(np.asarray(s['fragment_mask']).sum())
        n_link = int(np.asarray(s['linker_mask']).sum())
        assert 3 <= n_link <= 7
        if n_frag in seen:
            assert seen[n_frag] == n_link  # deterministic in the count
        seen[n_frag] = n_link
    counts = sorted(seen)
    sizes = [seen[c] for c in counts]
    assert sizes == sorted(sizes)  # monotone
    assert len(set(sizes)) >= 3    # spans several classes
