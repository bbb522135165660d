"""In-training sampling metrics (validity, connectivity, uniqueness, novelty,
energy Wasserstein distance).

Mirrors src/metrics.py:12-125. Two grades of fidelity:
  * RDKit present → exact reference semantics (SanitizeMol validity,
    GetMolFrags connectivity, canonical-SMILES uniqueness, MMFF energies).
  * RDKit absent → native MolGraph fallbacks (valence validity, component
    connectivity, WL-hash uniqueness); energy metric reported as 0 with
    matching aggregate keys, so training dashboards keep their schema.
"""
from __future__ import annotations

from typing import List, Union

from difflinker_tpu.chem.molgraph import HAS_RDKIT, MolGraph

MolLike = Union[MolGraph, 'Chem.Mol']

if HAS_RDKIT:
    from rdkit import Chem
    from rdkit.Chem import AllChem


def _as_rdkit(mol: MolLike):
    return mol.to_rdkit() if isinstance(mol, MolGraph) else mol


def is_valid(mol: MolLike) -> bool:
    if HAS_RDKIT:
        try:
            Chem.SanitizeMol(_as_rdkit(mol))
        except Exception:
            return False
        return True
    return mol.is_valid()


def is_connected(mol: MolLike) -> bool:
    if HAS_RDKIT:
        try:
            frags = Chem.GetMolFrags(_as_rdkit(mol), asMols=True)
        except Exception:
            return False
        return len(frags) == 1
    return mol.is_connected()


def canonical_key(mol: MolLike) -> str:
    if HAS_RDKIT:
        return Chem.MolToSmiles(_as_rdkit(mol))
    return mol.canonical_key()


def get_valid_molecules(mols):
    return [m for m in mols if is_valid(m)]


def get_connected_molecules(mols):
    return [m for m in mols if is_connected(m)]


def get_unique_keys(mols):
    return list({canonical_key(m) for m in mols})


def get_novel_keys(unique_true, unique_pred):
    return list(set(unique_pred).difference(set(unique_true)))


def compute_energy(mol: MolLike) -> float:
    """MMFF94 single-point energy (src/metrics.py:57-60); RDKit-only."""
    if not HAS_RDKIT:
        raise RuntimeError('MMFF energies require RDKit')
    m = _as_rdkit(mol)
    props = AllChem.MMFFGetMoleculeProperties(m)
    return AllChem.MMFFGetMoleculeForceField(m, props, confId=0).CalcEnergy()


def wasserstein_distance_between_energies(true_mols, pred_mols) -> float:
    if not HAS_RDKIT:
        return 0.0
    from scipy.stats import wasserstein_distance

    def energies(mols):
        out = []
        for m in mols:
            try:
                out.append(compute_energy(m))
            except Exception:
                continue
        return out

    te, pe = energies(true_mols), energies(pred_mols)
    if te and pe:
        return float(wasserstein_distance(te, pe))
    return 0.0


def compute_metrics(pred_molecules: List[MolLike],
                    true_molecules: List[MolLike]) -> dict:
    """Aggregate block identical to src/metrics.py:86-125."""
    if len(pred_molecules) == 0:
        return {'validity': 0, 'validity_and_connectivity': 0,
                'uniqueness': 0, 'novelty': 0, 'energies': 0}

    true_valid = get_valid_molecules(true_molecules)
    pred_valid = get_valid_molecules(pred_molecules)
    validity = len(pred_valid) / len(pred_molecules)

    true_vc = get_connected_molecules(true_valid)
    pred_vc = get_connected_molecules(pred_valid)
    validity_and_connectivity = len(pred_vc) / len(pred_molecules)

    true_unique = get_unique_keys(true_vc)
    pred_unique = get_unique_keys(pred_vc)
    uniqueness = len(pred_unique) / len(pred_vc) if pred_vc else 0

    pred_novel = get_novel_keys(true_unique, pred_unique)
    novelty = len(pred_novel) / len(pred_unique) if pred_unique else 0

    energies = wasserstein_distance_between_energies(true_vc, pred_vc)
    return {
        'validity': validity,
        'validity_and_connectivity': validity_and_connectivity,
        'uniqueness': uniqueness,
        'novelty': novelty,
        'energies': energies,
    }
