"""DeLinker-protocol evaluation battery.

Mirrors src/delinker.py:13-278: validity (largest fragment contains the input
fragments), linker extraction by substructure removal, uniqueness keyed on
(true molecule, fragments), novelty of linkers, recovery rate, 2D filters
(SA improvement, ring double-bond filter, PAINS) and the SC_RDKit 3D score.

This battery is inherently RDKit-bound (substructure matching, sanitization,
SMARTS). When RDKit is unavailable, `get_delinker_metrics` degrades to the
subset computable on native MolGraphs — validity-by-components + uniqueness/
novelty via WL hashes with index-based linker extraction — and marks the
RDKit-only entries as 0, keeping the reference's key schema.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from difflinker_tpu.chem.molgraph import HAS_RDKIT, MolGraph

DEFAULT_KEYS = (
    'DeLinker/validity', 'DeLinker/uniqueness', 'DeLinker/novelty',
    'DeLinker/recovery', 'DeLinker/2D_filters', 'DeLinker/2D_filters_SA',
    'DeLinker/2D_filters_RA', 'DeLinker/2D_filters_PAINS', 'DeLinker/SC_RDKit',
)


def _default_values() -> Dict[str, float]:
    return {k: 0 for k in DEFAULT_KEYS}


# ---------------------------------------------------------------------------
# RDKit implementation (exact reference semantics)
# ---------------------------------------------------------------------------

def get_valid_as_in_delinker(data: List[dict]) -> List[dict]:
    """Keep samples whose largest fragment sanitizes and contains the input
    fragments as a substructure (src/delinker.py:13-40)."""
    from rdkit import Chem
    valid = []
    for m in data:
        pred = Chem.MolFromSmiles(m['pred_mol_smi'], sanitize=False)
        true = Chem.MolFromSmiles(m['true_mol_smi'], sanitize=False)
        frag = Chem.MolFromSmiles(m['frag_smi'], sanitize=False)
        frags = Chem.GetMolFrags(pred, asMols=True, sanitizeFrags=False)
        biggest = max(frags, default=pred, key=lambda x: x.GetNumAtoms())
        try:
            Chem.SanitizeMol(biggest)
            Chem.SanitizeMol(true)
            Chem.SanitizeMol(frag)
        except Exception:
            continue
        if len(biggest.GetSubstructMatch(frag)) > 0:
            valid.append({
                'pred_mol': m['pred_mol'], 'true_mol': m['true_mol'],
                'pred_mol_smi': Chem.MolToSmiles(biggest),
                'true_mol_smi': Chem.MolToSmiles(true),
                'frag_smi': Chem.MolToSmiles(frag),
            })
    return valid


def extract_linker_smiles(molecule, fragments) -> str:
    """Delete the fragment substructure match; canonicalize the remainder
    (src/delinker.py:43-54)."""
    from rdkit import Chem
    match = molecule.GetSubstructMatch(fragments)
    editable = Chem.EditableMol(molecule)
    for atom_id in sorted(match, reverse=True):
        editable.RemoveAtom(atom_id)
    linker = editable.GetMol()
    Chem.RemoveStereochemistry(linker)
    try:
        from rdkit.Chem import MolStandardize
        return MolStandardize.canonicalize_tautomer_smiles(
            Chem.MolToSmiles(linker))
    except Exception:
        return Chem.MolToSmiles(linker)


def compute_and_add_linker_smiles(data: List[dict]) -> List[dict]:
    from rdkit import Chem
    out = []
    for m in data:
        pred = Chem.MolFromSmiles(m['pred_mol_smi'], sanitize=True)
        true = Chem.MolFromSmiles(m['true_mol_smi'], sanitize=True)
        frag = Chem.MolFromSmiles(m['frag_smi'], sanitize=True)
        out.append({**m,
                    'pred_linker': extract_linker_smiles(pred, frag),
                    'true_linker': extract_linker_smiles(true, frag)})
    return out


def compute_uniqueness(data: List[dict]) -> float:
    """Unique predictions per (true molecule, fragments) group
    (src/delinker.py:76-93)."""
    groups: Dict[str, list] = {}
    for m in data:
        groups.setdefault(f"{m['true_mol_smi']}.{m['frag_smi']}", []).append(
            m['pred_mol_smi'])
    total = sum(len(v) for v in groups.values())
    unique = sum(len(set(v)) for v in groups.values())
    return unique / total


def compute_novelty(data: List[dict]) -> float:
    true_linkers = {m['true_linker'] for m in data}
    novel = sum(1 for m in data if m['pred_linker'] not in true_linkers)
    return novel / len(data)


def compute_recovery_rate(data: List[dict]) -> float:
    from rdkit import Chem
    total, recovered = set(), set()
    for m in data:
        pred = Chem.MolFromSmiles(m['pred_mol_smi'], sanitize=True)
        Chem.RemoveStereochemistry(pred)
        pred = Chem.MolToSmiles(Chem.RemoveHs(pred))
        true = Chem.MolFromSmiles(m['true_mol_smi'], sanitize=True)
        Chem.RemoveStereochemistry(true)
        true = Chem.MolToSmiles(Chem.RemoveHs(true))
        key = f"{true}.{m['true_linker']}"
        total.add(key)
        if pred == true:
            recovered.add(key)
    return len(recovered) / len(total)


def check_ring_filter(linker) -> bool:
    """No double bonds inside linker rings (src/delinker.py:137-147)."""
    from rdkit import Chem
    for ring in Chem.GetSymmSSSR(linker):
        ring = set(ring)
        for atom_idx in ring:
            for bond in linker.GetAtomWithIdx(atom_idx).GetBonds():
                if (bond.GetBondType() == Chem.BondType.DOUBLE
                        and bond.GetBeginAtomIdx() in ring
                        and bond.GetEndAtomIdx() in ring):
                    return False
    return True


def check_pains(mol, pains_smarts) -> bool:
    """pains_smarts: list of SMARTS query mols, or an rdkit FilterCatalog
    (the built-in PAINS fallback)."""
    if hasattr(pains_smarts, 'HasMatch'):
        return not pains_smarts.HasMatch(mol)
    return not any(mol.HasSubstructMatch(p) for p in pains_smarts)


_PAINS_WARNED = False


def load_pains_smarts(path: Optional[str] = None):
    """WEHI PAINS SMARTS list (reference resources/wehi_pains.csv; point
    $DIFFLINKER_PAINS at such a file). When no file exists, falls back to
    RDKit's built-in PAINS FilterCatalog SMARTS so the filter never silently
    becomes a pass-everything no-op."""
    global _PAINS_WARNED
    from rdkit import Chem
    if path is None:
        path = os.environ.get('DIFFLINKER_PAINS')
    if path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        cand = os.path.join(here, '..', 'resources', 'wehi_pains.csv')
        path = cand if os.path.exists(cand) else None
    if path is not None and os.path.exists(path):
        with open(path) as f:
            return [Chem.MolFromSmarts(row[0], mergeHs=True)
                    for row in csv.reader(f)]
    # fallback: RDKit's bundled PAINS catalog (A+B+C)
    try:
        from rdkit.Chem import FilterCatalog
        params = FilterCatalog.FilterCatalogParams()
        params.AddCatalog(FilterCatalog.FilterCatalogParams.FilterCatalogs.PAINS)
        catalog = FilterCatalog.FilterCatalog(params)
        if not _PAINS_WARNED:
            import sys
            print('[difflinker_tpu.chem] wehi_pains.csv not found — using '
                  "RDKit's built-in PAINS FilterCatalog (set "
                  '$DIFFLINKER_PAINS for the exact reference list)',
                  file=sys.stderr)
            _PAINS_WARNED = True
        return catalog  # check_pains dispatches on the catalog type
    except Exception:
        if not _PAINS_WARNED:
            import sys
            print('[difflinker_tpu.chem] WARNING: no PAINS definitions '
                  'available — the PAINS filter will pass everything; set '
                  '$DIFFLINKER_PAINS to a wehi_pains.csv', file=sys.stderr)
            _PAINS_WARNED = True
        return []


def calc_2d_filters(entry: dict, pains_smarts) -> List[bool]:
    from rdkit import Chem
    from difflinker_tpu.chem import sascorer
    pred = Chem.MolFromSmiles(entry['pred_mol_smi'])
    frag = Chem.MolFromSmiles(entry['frag_smi'])
    linker = Chem.MolFromSmiles(entry['pred_linker'])
    result = [False, False, False]
    if len(pred.GetSubstructMatch(frag)) > 0:
        sa = ra = pains = False
        try:
            sa = sascorer.calculate_score(pred) < sascorer.calculate_score(frag)
        except Exception:
            pass
        try:
            ra = check_ring_filter(linker)
        except Exception:
            pass
        try:
            pains = check_pains(pred, pains_smarts)
        except Exception:
            pass
        result = [sa, ra, pains]
    return result


def calc_filters_2d_dataset(data: List[dict]):
    pains_smarts = load_pains_smarts()
    pass_all = pass_sa = pass_ra = pass_pains = 0
    for m in data:
        sa, ra, pains = calc_2d_filters(m, pains_smarts)
        pass_all += sa & ra & pains
        pass_sa += sa
        pass_ra += ra
        pass_pains += pains
    n = len(data)
    return pass_all / n, pass_sa / n, pass_ra / n, pass_pains / n


def sc_rdkit_mean(data: List[dict]) -> float:
    from difflinker_tpu.chem.sc_score import sc_rdkit_score_safe
    return float(np.mean([sc_rdkit_score_safe(m['pred_mol'], m['true_mol'])
                          for m in data]))


# ---------------------------------------------------------------------------
# native fallback (no RDKit): index-based linker identity over MolGraphs
# ---------------------------------------------------------------------------

def _native_metrics(pred_molecules: Sequence[MolGraph],
                    true_molecules: Sequence[MolGraph],
                    true_fragments: Sequence[MolGraph]) -> Dict[str, float]:
    valid, entries = 0, []
    for pred, true, frag in zip(pred_molecules, true_molecules, true_fragments):
        big = pred.largest_component()
        # native proxy for "contains the fragments": all fragment atom types
        # present with at least the fragment's multiset count
        ok = big.is_valid() and _contains_type_multiset(big, frag)
        if ok:
            valid += 1
            entries.append({
                'group': true.canonical_key() + '.' + frag.canonical_key(),
                'pred_key': big.canonical_key(),
                'true_key': true.canonical_key(),
            })
    n = len(pred_molecules)
    out = _default_values()
    out['DeLinker/validity'] = valid / n if n else 0
    if not entries:
        return out
    groups: Dict[str, list] = {}
    for e in entries:
        groups.setdefault(e['group'], []).append(e['pred_key'])
    out['DeLinker/uniqueness'] = (sum(len(set(v)) for v in groups.values())
                                  / sum(len(v) for v in groups.values()))
    recovered = {e['true_key'] for e in entries if e['pred_key'] == e['true_key']}
    total = {e['true_key'] for e in entries}
    out['DeLinker/recovery'] = len(recovered) / len(total)
    return out


def _contains_type_multiset(mol: MolGraph, frag: MolGraph) -> bool:
    mc = np.bincount(mol.atom_types, minlength=16)
    fc = np.bincount(frag.atom_types, minlength=16)
    return bool((mc >= fc).all())


# ---------------------------------------------------------------------------
# aggregate (reference get_delinker_metrics, src/delinker.py:218-278)
# ---------------------------------------------------------------------------

def get_delinker_metrics(pred_molecules, true_molecules, true_fragments
                         ) -> Dict[str, float]:
    if len(pred_molecules) == 0:
        return _default_values()

    if not HAS_RDKIT:
        return _native_metrics(pred_molecules, true_molecules, true_fragments)

    from rdkit import Chem

    def _rd(m):
        return m.to_rdkit() if isinstance(m, MolGraph) else m

    data = []
    for pred, true, frag in zip(pred_molecules, true_molecules, true_fragments):
        pred, true, frag = _rd(pred), _rd(true), _rd(frag)
        data.append({'pred_mol': pred, 'true_mol': true,
                     'pred_mol_smi': Chem.MolToSmiles(pred),
                     'true_mol_smi': Chem.MolToSmiles(true),
                     'frag_smi': Chem.MolToSmiles(frag)})

    valid_data = get_valid_as_in_delinker(data)
    validity = len(valid_data) / len(data)
    if not valid_data:
        return _default_values()

    valid_data = compute_and_add_linker_smiles(valid_data)
    pass_all, pass_sa, pass_ra, pass_pains = calc_filters_2d_dataset(valid_data)
    return {
        'DeLinker/validity': validity,
        'DeLinker/uniqueness': compute_uniqueness(valid_data),
        'DeLinker/novelty': compute_novelty(valid_data),
        'DeLinker/recovery': compute_recovery_rate(valid_data),
        'DeLinker/2D_filters': pass_all,
        'DeLinker/2D_filters_SA': pass_sa,
        'DeLinker/2D_filters_RA': pass_ra,
        'DeLinker/2D_filters_PAINS': pass_pains,
        'DeLinker/SC_RDKit': sc_rdkit_mean(valid_data),
    }
