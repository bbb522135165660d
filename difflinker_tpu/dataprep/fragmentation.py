"""Shared RDKit fragmentation utilities for dataset preparation.

Exit-atom ('*') handling, anchor flagging, conformer transfer by substructure
match, and match disambiguation — the core of the reference's
data/zinc/prepare_dataset.py:12-211 and the GEOM/MOAD variants. RDKit-bound;
import-gated at call time.
"""
from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np

ANCHOR_PROP = '_Anchor'


def get_exits(mol):
    return [a for a in mol.GetAtoms() if a.GetSymbol() == '*']


def set_anchor_flags(mol, anchor_idx: int) -> None:
    for atom in mol.GetAtoms():
        atom.SetProp(ANCHOR_PROP, '1' if atom.GetIdx() == anchor_idx else '0')


def get_anchors_idx(mol) -> List[int]:
    return [a.GetIdx() for a in mol.GetAtoms()
            if a.HasProp(ANCHOR_PROP) and a.GetProp(ANCHOR_PROP) == '1']


def strip_exit_from_fragment(frag):
    """Remove the single '*' exit atom + bond; flag its neighbour as the
    anchor (prepare_dataset.py:44-68)."""
    from rdkit import Chem
    exits = get_exits(frag)
    if len(exits) != 1:
        raise ValueError(f'fragment must have exactly one exit, got {len(exits)}')
    exit_atom = exits[0]
    bonds = exit_atom.GetBonds()
    if len(bonds) != 1:
        raise ValueError('exit atom must have exactly one bond')
    bond = bonds[0]
    exit_idx = exit_atom.GetIdx()
    src, dst = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
    set_anchor_flags(frag, src if dst == exit_idx else dst)
    editable = Chem.EditableMol(frag)
    editable.RemoveBond(src, dst)
    editable.RemoveAtom(exit_idx)
    return editable.GetMol()


def strip_exits_from_linker(linker, max_exits: int = 2):
    """Remove up to `max_exits` exit atoms + bonds (prepare_dataset.py:71-97)."""
    from rdkit import Chem
    exits = get_exits(linker)
    if len(exits) > max_exits:
        raise ValueError(f'linker has more than {max_exits} exits')
    exits = sorted(exits, key=lambda e: e.GetIdx(), reverse=True)
    editable = Chem.EditableMol(linker)
    for e in exits:
        bonds = e.GetBonds()
        if len(bonds) != 1:
            raise ValueError('exit atom must have exactly one bond')
        editable.RemoveBond(bonds[0].GetBeginAtomIdx(), bonds[0].GetEndAtomIdx())
    for e in exits:
        editable.RemoveAtom(e.GetIdx())
    return editable.GetMol()


def create_conformer(coords: np.ndarray):
    from rdkit import Chem, Geometry
    conf = Chem.Conformer()
    for i, (x, y, z) in enumerate(np.asarray(coords, np.float64)):
        conf.SetAtomPosition(i, Geometry.Point3D(x, y, z))
    return conf


def transfer_conformers(frag, mol) -> Dict[Tuple[int, ...], object]:
    """All substructure matches of `frag` in `mol` → per-match conformers
    sliced from the molecule conformer (prepare_dataset.py:107-122)."""
    matches = mol.GetSubstructMatches(frag)
    if len(matches) < 1:
        raise ValueError('no fragment/linker substructure match')
    mol_coords = mol.GetConformer().GetPositions()
    return {m: create_conformer(mol_coords[np.asarray(m)]) for m in matches}


def find_non_intersecting_matches(match_lists: Sequence[Sequence[Tuple]]
                                  ) -> List[Tuple]:
    """All combinations of one match per part with pairwise-disjoint atom
    sets (prepare_dataset.py:125-137, generalised to k parts)."""
    out = set()
    for combo in itertools.product(*match_lists):
        sets = [set(m) for m in combo]
        union = set().union(*sets)
        if len(union) == sum(len(s) for s in sets):
            out.add(tuple(combo))
    return list(out)


def matches_with_linker_in_middle(candidates: List[Tuple], mol,
                                  n_fragments: int) -> List[Tuple]:
    """Keep combos where the linker touches each fragment through exactly one
    atom (prepare_dataset.py:140-158; fragments first, linker last)."""
    kept = []
    for combo in candidates:
        frag_matches, linker_match = combo[:n_fragments], combo[-1]
        neighbors = set()
        for atom_idx in linker_match:
            for nb in mol.GetAtomWithIdx(atom_idx).GetNeighbors():
                neighbors.add(nb.GetIdx())
        if all(len(set(fm) & neighbors) == 1 for fm in frag_matches):
            kept.append(combo)
    return kept


def find_correct_matches(match_lists: Sequence[Sequence[Tuple]], mol
                         ) -> List[Tuple]:
    """Disjoint matches, disambiguated by the linker-in-the-middle criterion
    when several remain (prepare_dataset.py:161-169)."""
    non_intersecting = find_non_intersecting_matches(match_lists)
    if len(non_intersecting) == 1:
        return non_intersecting
    return matches_with_linker_in_middle(non_intersecting, mol,
                                         n_fragments=len(match_lists) - 1)


def prepare_fragments_and_linker(frags_smi: str, linker_smi: str, mol):
    """Reference prepare_fragments_and_linker (prepare_dataset.py:172-211):
    strip exits, transfer conformers, resolve matches. Returns
    (fragment mols with anchors + conformers, linker mol with conformer)."""
    from rdkit import Chem
    frag_smis = frags_smi.split('.')
    frags = [strip_exit_from_fragment(Chem.MolFromSmiles(s)) for s in frag_smis]
    linker = strip_exits_from_linker(Chem.MolFromSmiles(linker_smi),
                                     max_exits=len(frag_smis))

    frag_m2c = [transfer_conformers(f, mol) for f in frags]
    linker_m2c = transfer_conformers(linker, mol)

    correct = find_correct_matches(
        [list(m.keys()) for m in frag_m2c] + [list(linker_m2c.keys())], mol)
    if len(correct) > 2:
        # >2 surviving matches is ambiguous beyond molecular symmetry
        raise ValueError('found more than two valid fragment/linker matches')
    if not correct:
        raise ValueError('no valid fragment/linker match combination')

    chosen = correct[0]
    for f, m2c, match in zip(frags, frag_m2c, chosen[:-1]):
        f.AddConformer(m2c[match])
    linker.AddConformer(linker_m2c[chosen[-1]])
    return frags, linker


def combine_fragments(frags):
    from rdkit import Chem
    combined = frags[0]
    for f in frags[1:]:
        combined = Chem.CombineMols(combined, f)
    return combined
