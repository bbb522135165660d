"""Ertl–Schuffenhauer synthetic-accessibility (SA) score.

Original implementation of the published algorithm (Ertl & Schuffenhauer,
J. Cheminf. 2009) as used by the reference's DeLinker filters
(src/delinker_utils/sascorer.py, itself RDKit-contrib code): fragment-score
lookup over Morgan(r=2) fragments plus size/stereo/macrocycle complexity
penalties, rescaled to [1, 10]. RDKit-only; the fragment-score table is the
public RDKit contrib `fpscores.pkl.gz` — located via $DIFFLINKER_FPSCORES, the
package resources dir, or the RDKit installation itself.
"""
from __future__ import annotations

import gzip
import math
import os
import pickle
from typing import Optional

_FSCORES = None


def _candidate_paths():
    env = os.environ.get('DIFFLINKER_FPSCORES')
    if env:
        yield env
    here = os.path.dirname(os.path.abspath(__file__))
    yield os.path.join(here, '..', 'resources', 'fpscores.pkl.gz')
    try:
        from rdkit.Chem import RDConfig
        yield os.path.join(RDConfig.RDContribDir, 'SA_Score', 'fpscores.pkl.gz')
    except ImportError:
        pass


def read_fragment_scores(path: Optional[str] = None) -> dict:
    global _FSCORES
    if _FSCORES is not None and path is None:
        return _FSCORES
    if path is None:
        for cand in _candidate_paths():
            if os.path.exists(cand):
                path = cand
                break
    if path is None:
        raise FileNotFoundError(
            'fpscores.pkl.gz not found — set $DIFFLINKER_FPSCORES or install '
            'RDKit (ships it under Contrib/SA_Score)')
    with gzip.open(path, 'rb') as f:
        data = pickle.load(f)
    scores = {}
    for row in data:
        for frag_id in row[1:]:
            scores[frag_id] = float(row[0])
    _FSCORES = scores
    return scores


def num_bridgeheads_and_spiro(mol):
    from rdkit.Chem import rdMolDescriptors
    return (rdMolDescriptors.CalcNumBridgeheadAtoms(mol),
            rdMolDescriptors.CalcNumSpiroAtoms(mol))


def calculate_score(mol) -> float:
    """SA score in [1 (easy) .. 10 (hard)]."""
    from rdkit.Chem import rdMolDescriptors
    from rdkit import Chem

    fscores = read_fragment_scores()
    fp = rdMolDescriptors.GetMorganFingerprint(mol, 2)
    fps = fp.GetNonzeroElements()
    score1 = 0.0
    nf = 0
    for bit_id, count in fps.items():
        nf += count
        score1 += fscores.get(bit_id, -4.0) * count
    score1 /= nf

    # feature penalties
    n_atoms = mol.GetNumAtoms()
    n_chiral = len(Chem.FindMolChiralCenters(mol, includeUnassigned=True))
    ri = mol.GetRingInfo()
    n_bridge, n_spiro = num_bridgeheads_and_spiro(mol)
    n_macro = sum(1 for ring in ri.AtomRings() if len(ring) > 8)

    size_penalty = n_atoms ** 1.005 - n_atoms
    stereo_penalty = math.log10(n_chiral + 1)
    spiro_penalty = math.log10(n_spiro + 1)
    bridge_penalty = math.log10(n_bridge + 1)
    macro_penalty = math.log10(2) if n_macro > 0 else 0.0
    score2 = (-size_penalty - stereo_penalty - spiro_penalty - bridge_penalty
              - macro_penalty)

    # symmetry correction: many repeated fragments → slightly easier
    score3 = 0.0
    if n_atoms > len(fps):
        score3 = math.log(float(n_atoms) / len(fps)) * 0.5

    sascore = score1 + score2 + score3

    # rescale from raw range to 1..10
    smin, smax = -4.0, 2.5
    sascore = 11.0 - (sascore - smin + 1) / (smax - smin) * 9.0
    if sascore > 8.0:
        sascore = 8.0 + math.log(sascore + 1.0 - 9.0)
    sascore = min(max(sascore, 1.0), 10.0)
    return sascore


calculateScore = calculate_score  # reference-compatible alias
