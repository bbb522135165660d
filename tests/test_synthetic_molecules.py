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


def test_generator_vocab_width():
    """n_types widens the one-hot to the GEOM vocab (9) — needed when a demo
    model must consume files parsed with is_geom (cli.generate_with_pocket);
    pocket-shell atoms inherit the sample's width."""
    ds = synthetic_molecule_dataset(3, seed=2, pocket_range=(6, 8),
                                    coupled_linker_size='types', n_types=9)
    for s in ds.samples:
        assert s['one_hot'].shape[-1] == 9
        assert (s['one_hot'].sum(-1) == 1).all()
    # default stays the ZINC vocab
    assert synthetic_molecule_dataset(1, seed=2).samples[0]['one_hot'].shape[-1] == 8


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


def test_multifrag_generator_properties():
    """k-fragment samples: k disconnected fragment components, one connected
    molecule, GEOM vocab, >=2 anchors all on fragment atoms (the GEOM
    multifrag semantics, reference data/geom/generate_geom_multifrag.py)."""
    import numpy as np
    from difflinker_tpu.chem.bonds import bond_order_matrix
    from difflinker_tpu.data.synthetic_molecules import synthetic_multifrag_dataset

    def n_components(adj):
        n = adj.shape[0]
        seen = np.zeros(n, bool)
        comp = 0
        for start in range(n):
            if seen[start]:
                continue
            comp += 1
            stack = [start]
            seen[start] = True
            while stack:
                i = stack.pop()
                for j in np.where(adj[i])[0]:
                    if not seen[j]:
                        seen[j] = True
                        stack.append(j)
        return comp

    for topology in ('chain', 'star'):
        ds = synthetic_multifrag_dataset(
            8, seed=3, n_fragments=(3, 4), topology=topology)
        for s in ds.samples:
            assert s['one_hot'].shape[1] == 9  # GEOM vocabulary
            types = s['one_hot'].argmax(1)
            adj = bond_order_matrix(s['positions'], types) > 0
            assert n_components(adj) == 1  # whole molecule connected
            fidx = np.where(s['fragment_mask'] > 0)[0]
            k = n_components(adj[np.ix_(fidx, fidx)])
            assert 3 <= k <= 4  # fragments are k disconnected pieces
            # fragments-first layout; anchors on fragment atoms only
            assert (np.diff(fidx) == 1).all() and fidx[0] == 0
            assert s['anchors'].sum() >= 2 * (k - 1)
            assert (s['anchors'] * s['fragment_mask'] == s['anchors']).all()
            # linker segments: k-1 pieces for chains/stars
            lidx = np.where(s['linker_mask'] > 0)[0]
            assert n_components(adj[np.ix_(lidx, lidx)]) == k - 1


def test_multifrag_templates_and_sampler():
    """create_templates_for_linker_generation + LinkerSampler handle k>2
    fragments with multi-segment linker masks (VERDICT r2 next-round #1)."""
    import jax
    import numpy as np
    from difflinker_tpu.config import (DataConfig, DatasetFamily,
                                       DiffusionConfig, ExperimentConfig,
                                       ModelConfig, TrainConfig)
    from difflinker_tpu.data.collate import (
        collate, create_templates_for_linker_generation)
    from difflinker_tpu.data.synthetic_molecules import synthetic_multifrag_dataset
    from difflinker_tpu.sample.sampler import LinkerSampler

    ds = synthetic_multifrag_dataset(4, seed=5, n_fragments=(3, 5))
    batch = collate(ds.samples)
    sizes = batch['linker_mask'][..., 0].sum(-1).astype(int)

    tmpl = create_templates_for_linker_generation(batch, sizes)
    n_frag = batch['fragment_mask'][..., 0].sum(-1)
    # fragment rows survive in order; linker rows re-initialised at the end
    np.testing.assert_array_equal(
        tmpl['fragment_mask'][..., 0].sum(-1), n_frag)
    np.testing.assert_array_equal(tmpl['linker_mask'][..., 0].sum(-1), sizes)
    for i in range(4):
        nf = int(n_frag[i])
        np.testing.assert_array_equal(tmpl['one_hot'][i, :nf],
                                      batch['one_hot'][i, :nf])
        np.testing.assert_array_equal(tmpl['anchors'][i, :nf],
                                      batch['anchors'][i, :nf])

    # the GEOM recipe: 9-type vocab, no anchors context, CoM = fragments
    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=9, context_node_nf=1, hidden_nf=16,
                          n_layers=1, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=4),
        data=DataConfig(family=DatasetFamily.GEOM),
        train=TrainConfig(anchors_context=False))
    edm_params = __import__('difflinker_tpu.diffusion.edm',
                            fromlist=['make_edm']).make_edm(
        cfg.model, cfg.diffusion).init_params(jax.random.PRNGKey(0))
    sampler = LinkerSampler(cfg, edm_params)
    out = sampler.sample(batch, jax.random.PRNGKey(1),
                         size_spec='ground_truth')
    assert not out['nan_flag'].any()
    np.testing.assert_array_equal(
        out['linker_mask'][..., 0].sum(-1), sizes)
    # all k fragments' identities and coordinates pass through frozen
    fm = out['fragment_mask'][..., 0].astype(bool)
    np.testing.assert_array_equal(
        out['one_hot'][fm],
        batch['one_hot'][batch['fragment_mask'][..., 0].astype(bool)])


def test_residue_style_pocket_generation():
    """pocket_style='residues' reaches real 6A-contact-pocket scale (the
    published case studies carry 129-187 pocket atoms; the thin linker shell
    physically caps out near 40) with residue-like bonded clusters."""
    ds = synthetic_molecule_dataset(4, seed=11, frag_range=(8, 16),
                                    linker_range=(5, 10),
                                    pocket_range=(100, 190),
                                    pocket_style='residues')
    for s in ds.samples:
        pk = s['pocket_mask'].astype(bool)
        assert pk.sum() >= 100
        np.testing.assert_array_equal(
            s['fragment_mask'], s['fragment_only_mask'] + s['pocket_mask'])
        total = s['fragment_only_mask'] + s['pocket_mask'] + s['linker_mask']
        np.testing.assert_array_equal(total, np.ones(s['num_atoms']))
        pos = s['positions']
        lig = pos[~pk]
        d_lp = np.linalg.norm(lig[:, None] - pos[pk][None], axis=-1)
        assert d_lp.min() >= 3.2  # pocket clears the ligand (no covalent link)
        # residue texture: every pocket atom has a covalent-range neighbor
        d_pp = np.linalg.norm(pos[pk][:, None] - pos[pk][None], axis=-1)
        np.fill_diagonal(d_pp, np.inf)
        assert (d_pp.min(1) < 1.6).all()
