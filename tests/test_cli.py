"""CLI smoke tests: every entry point parses --help (catches import/arg
errors), the rdkit gate exits cleanly, and the real HSP90 case-study inputs
parse through the native SDF/PDB readers."""
import os
import subprocess
import sys

import numpy as np
import pytest

CLIS = ['train', 'sample', 'generate', 'generate_with_protein',
        'generate_with_pocket', 'sample_trajectories', 'train_size_gnn',
        'compute_metrics', 'reformat', 'run_obabel', 'prepare_data']


@pytest.mark.parametrize('name', CLIS)
def test_cli_help(name):
    res = subprocess.run(
        [sys.executable, '-m', f'difflinker_tpu.cli.{name}', '--help'],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-800:]
    assert 'usage' in res.stdout.lower()


def test_compute_metrics_requires_rdkit(tmp_path):
    from difflinker_tpu.chem.molgraph import HAS_RDKIT
    if HAS_RDKIT:
        pytest.skip('rdkit installed; gate not reachable')
    smi = tmp_path / 's.smi'
    smi.write_text('CC CCO CCO C\n')
    linkers = tmp_path / 'l.smi'
    linkers.write_text('C\n')
    from difflinker_tpu.cli.compute_metrics import main
    rc = main(['--smi', str(smi), '--train-linkers', str(linkers)])
    assert rc == 2


HSP90 = '/root/reference/case_studies/hsp90'


@pytest.mark.skipif(not os.path.isdir(HSP90), reason='reference not mounted')
def test_case_study_inputs_parse():
    """Real-world inputs: OpenBabel-written SDF fragments + a 1.6k-atom
    protein PDB through the native readers and pocket extraction."""
    from difflinker_tpu.chem.io_rdkit import parse_molecule, read_molecule
    from difflinker_tpu.chem.pdb import extract_pocket, parse_pdb

    mol = read_molecule(os.path.join(HSP90, '3hz1_modified_fragments_obabel.sdf'))
    pos, one_hot, charges = parse_molecule(mol, is_geom=True)
    assert pos.shape == (23, 3)
    assert one_hot.shape == (23, 9)
    assert set(one_hot.argmax(-1)) <= set(range(9))

    atoms = parse_pdb(os.path.join(HSP90, '3hz1_protein.pdb'))
    assert len(atoms) > 1500

    pk_pos, pk_oh, pk_q = extract_pocket(pos, os.path.join(HSP90, '3hz1_protein.pdb'))
    assert 50 < len(pk_q) < 500
    # every pocket atom within ~6A+residue-extent of the fragments
    d = np.linalg.norm(pk_pos[:, None] - pos[None], axis=-1).min(1)
    assert d.min() <= 6.0
    # backbone-only is a subset
    bb_pos, _, _ = extract_pocket(pos, os.path.join(HSP90, '3hz1_protein.pdb'),
                                  backbone_atoms_only=True)
    assert len(bb_pos) < len(pk_pos)
