"""Native SMILES parser (chem/smiles.py) and rdkit-free fragment/linker
preparation (dataprep/fragmentation_native.py) — the tier that lets
cli.prepare_data run without RDKit (reference pipeline:
/root/reference/data/zinc/prepare_dataset.py:107-169)."""
import numpy as np
import pytest

from difflinker_tpu.chem.molgraph import MolGraph
from difflinker_tpu.chem.smiles import SmilesError, parse_smiles
from difflinker_tpu.constants import GEOM_ATOM2IDX
from difflinker_tpu.dataprep.fragmentation_native import (
    MatchError, prepare_fragments_and_linker_native, strip_exit,
    subgraph_matches)


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

@pytest.mark.parametrize('smi,n_atoms,n_bonds,n_arom', [
    ('CCO', 3, 2, 0),
    ('c1ccccc1', 6, 6, 6),                 # benzene: ring closure + aromatic
    ('C1CC1', 3, 3, 0),                    # cyclopropane
    ('CC(=O)N', 4, 3, 0),                  # branch + double bond
    ('[*]CCN[*]', 5, 4, 0),                # DeLinker exits
    ('Clc1ccc(Br)cc1', 8, 8, 6),           # two-letter elements
    ('c1ccc2ccccc2c1', 10, 11, 10),        # fused rings (naphthalene)
    ('[nH]1cccc1', 5, 5, 5),               # bracket aromatic with H-count
    ('C%10CCCCC%10', 6, 6, 0),             # %nn ring closure
    ('C/C=C\\C', 4, 3, 0),                 # stereo bonds parsed as plain
    ('CC(C)(C)OC(=O)N1CCC1', 11, 11, 0),
])
def test_parse_smiles_structures(smi, n_atoms, n_bonds, n_arom):
    g = parse_smiles(smi)
    assert g.n_atoms == n_atoms
    assert int(g.bonds.astype(bool).sum()) // 2 == n_bonds
    assert int(g.aromatic.sum()) == n_arom


def test_parse_smiles_orders_charges_components():
    g = parse_smiles('C=C#C')
    assert g.bonds[0, 1] == 2 and g.bonds[1, 2] == 3
    g = parse_smiles('[N+](=O)[O-]')
    assert list(g.charges) == [1, 0, -1]
    g = parse_smiles('CC.OC')
    assert list(g.components) == [0, 0, 1, 1]
    assert g.bonds[1, 2] == 0  # dot means NO bond


def test_parse_smiles_errors():
    with pytest.raises(SmilesError):
        parse_smiles('C1CC')       # unclosed ring
    with pytest.raises(SmilesError):
        parse_smiles('C(C')        # unbalanced branch
    with pytest.raises(SmilesError):
        parse_smiles('C[Qq]C')     # nonsense bracket
    with pytest.raises(SmilesError):
        parse_smiles('1CC1')       # ring digit before any atom: previously
    with pytest.raises(SmilesError):  # bonded index -1 (the LAST atom)
        parse_smiles('C.1CC1')     # ... same after a dot reset
    with pytest.raises(SmilesError):
        parse_smiles('C$C')        # '$' (order 4) would alias the
        #                            MOL-V2000 aromatic code — rejected


# --------------------------------------------------------------------------
# matching
# --------------------------------------------------------------------------

def _chain_mol(syms):
    n = len(syms)
    types = np.asarray([GEOM_ATOM2IDX[s] for s in syms])
    pos = np.stack([np.arange(n, dtype=np.float32) * 1.5,
                    np.zeros(n, np.float32), np.zeros(n, np.float32)], 1)
    bonds = np.zeros((n, n), np.int8)
    for i in range(n - 1):
        bonds[i, i + 1] = bonds[i + 1, i] = 1
    return MolGraph(types, pos, bonds)


def test_strip_exit_identifies_anchor():
    stripped, anchor = strip_exit(parse_smiles('OCC[*]'))
    assert stripped.symbols == ['O', 'C', 'C'] and anchor == 2
    stripped, anchor = strip_exit(parse_smiles('[*]CO'))
    assert stripped.symbols == ['C', 'O'] and anchor == 0
    with pytest.raises(MatchError):
        strip_exit(parse_smiles('[*]C[*]'))  # two exits: a linker, not a frag


def test_subgraph_matches_element_labeled():
    mol = _chain_mol(['O', 'C', 'C', 'C', 'N'])
    m = subgraph_matches(parse_smiles('OC'), mol)
    assert m == [(0, 1)]
    m = subgraph_matches(parse_smiles('CC'), mol)
    assert set(m) == {(1, 2), (2, 1), (2, 3), (3, 2)}
    assert subgraph_matches(parse_smiles('S'), mol) == []


def test_prepare_fragments_and_linker_native_roundtrip():
    # O-C-C | C-C | C-N with frag1=OCC[*], linker=[*]CC[*], frag2=NC[*]
    mol = _chain_mol(['O', 'C', 'C', 'C', 'C', 'C', 'N'])
    combined, linker, anchors = prepare_fragments_and_linker_native(
        'OCC[*].NC[*]', '[*]CC[*]', mol)
    assert combined.symbols == ['O', 'C', 'C', 'N', 'C']
    assert linker.symbols == ['C', 'C']
    # coordinates transferred from the conformer
    np.testing.assert_allclose(combined.positions[:, 0],
                               [0.0, 1.5, 3.0, 9.0, 7.5])
    np.testing.assert_allclose(linker.positions[:, 0], [4.5, 6.0])
    # anchors are the atoms bonded to the linker in the molecule
    assert anchors == [2, 4]
    assert combined.symbols[2] == 'C' and combined.symbols[4] == 'C'


def test_prepare_native_rejects_wrong_linker():
    mol = _chain_mol(['O', 'C', 'C', 'C', 'C', 'C', 'N'])
    with pytest.raises(MatchError):
        # linker claims 3 atoms; the leftover is 2 — no consistent split
        prepare_fragments_and_linker_native('OCC[*].NC[*]', '[*]CCC[*]', mol)


def test_prepare_native_disambiguates_by_linker_in_middle():
    """Two C2 fragments in a C8 chain: many element matches, but only the
    end placements leave the middle atoms AS the linker with both anchors
    bonded to it (the reference's matches_with_linker_in_middle,
    prepare_dataset.py:144-169)."""
    mol = _chain_mol(['C'] * 8)
    combined, linker, anchors = prepare_fragments_and_linker_native(
        'CC[*].CC[*]', '[*]CCCC[*]', mol)
    got = sorted(np.asarray(combined.positions)[:, 0].tolist())
    assert got == [0.0, 1.5, 9.0, 10.5]      # the two chain ends
    assert sorted(np.asarray(linker.positions)[:, 0].tolist()) == \
        [3.0, 4.5, 6.0, 7.5]
    for a in anchors:  # each anchor is an inner end atom (x=1.5 or 9.0)
        assert combined.positions[a, 0] in (1.5, 9.0)
