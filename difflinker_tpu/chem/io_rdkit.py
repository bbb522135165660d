"""Molecule file parsing for dataset prep and the generate CLIs.

Reference: read_sdf/parse_molecule (src/datasets.py:16-37) and the multi-format
reader in generate.py:50-59. RDKit-gated with a native SDF/XYZ fallback parser
sufficient for the canonical dataset artifacts (which carry explicit
coordinates and element symbols).
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from difflinker_tpu import constants
from difflinker_tpu.chem.molgraph import HAS_RDKIT, MolGraph


def read_sdf(path: str) -> Iterator:
    if HAS_RDKIT:
        from rdkit import Chem
        with Chem.SDMolSupplier(path, sanitize=False) as supplier:
            for mol in supplier:
                yield mol
    else:
        yield from _read_sdf_native(path)


def parse_molecule(mol, is_geom: bool) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """mol (rdkit Mol or MolGraph) → (positions, one_hot, charges)."""
    atom2idx, _, charges_map = constants.vocab_for(is_geom)
    if isinstance(mol, MolGraph):
        types = mol.atom_types
        one_hot = np.eye(len(atom2idx), dtype=np.float32)[
            np.clip(types, 0, len(atom2idx) - 1)]
        charges = np.asarray([charges_map[s] for s in mol.symbols], np.float32)
        return np.asarray(mol.positions, np.float32), one_hot, charges
    one_hot, charges = [], []
    for atom in mol.GetAtoms():
        sym = atom.GetSymbol()
        row = np.zeros(len(atom2idx), np.float32)
        row[atom2idx[sym]] = 1
        one_hot.append(row)
        charges.append(charges_map[sym])
    positions = mol.GetConformer().GetPositions()
    return (np.asarray(positions, np.float32), np.asarray(one_hot, np.float32),
            np.asarray(charges, np.float32))


def read_molecule(path: str):
    """Multi-format single-molecule reader (generate.py:50-59)."""
    if path.endswith('.xyz'):
        from difflinker_tpu.io.xyz import load_xyz
        pos, symbols = load_xyz(path)
        types = np.asarray([constants.GEOM_ATOM2IDX[s] for s in symbols])
        from difflinker_tpu.chem.molgraph import build_molecule
        return build_molecule(pos, types)
    if HAS_RDKIT:
        from rdkit import Chem
        if path.endswith('.pdb'):
            return Chem.MolFromPDBFile(path, sanitize=False, removeHs=True)
        if path.endswith('.mol'):
            return Chem.MolFromMolFile(path, sanitize=False, removeHs=True)
        if path.endswith('.mol2'):
            return Chem.MolFromMol2File(path, sanitize=False, removeHs=True)
        if path.endswith('.sdf'):
            return next(iter(read_sdf(path)))
        raise ValueError(f'unsupported format: {path}')
    if path.endswith('.sdf') or path.endswith('.mol'):
        mols = list(_read_sdf_native(path))
        return mols[0]
    raise ValueError(
        f'parsing {path} requires RDKit (native fallback supports .sdf/.mol/.xyz)')


# ---------------------------------------------------------------------------
# native MOL V2000 parser
# ---------------------------------------------------------------------------

def _read_sdf_native(path: str) -> Iterator[MolGraph]:
    for _, mg in read_sdf_named_native(path):
        yield mg


def read_sdf_named_native(path: str) -> Iterator[tuple]:
    """(title-line name, MolGraph) pairs — the join key the data-prep
    pipelines match against their tables (dataprep/zinc.process_sdf)."""
    with open(path) as f:
        content = f.read()
    for block in content.split('$$$$'):
        lines = block.strip('\n').split('\n')
        if len(lines) < 4:
            continue
        counts = lines[3]
        try:
            n_atoms = int(counts[0:3])
            n_bonds = int(counts[3:6])
        except ValueError:
            continue
        pos, types = [], []
        for ln in lines[4:4 + n_atoms]:
            x, y, z = float(ln[0:10]), float(ln[10:20]), float(ln[20:30])
            sym = ln[30:34].strip()
            if sym == 'H':
                sym = None  # heavy-atom datasets carry no H; skip defensively
            pos.append((x, y, z))
            types.append(constants.GEOM_ATOM2IDX.get(sym, 0) if sym else -1)
        bonds = np.zeros((n_atoms, n_atoms), np.int8)
        for ln in lines[4 + n_atoms:4 + n_atoms + n_bonds]:
            i, j, order = int(ln[0:3]) - 1, int(ln[3:6]) - 1, int(ln[6:9])
            bonds[i, j] = bonds[j, i] = order
        keep = np.asarray([t >= 0 for t in types])
        mg = MolGraph(np.asarray(types, np.int64), np.asarray(pos, np.float32),
                      bonds)
        name = lines[0].strip()
        yield name, (mg.subgraph(np.where(keep)[0]) if not keep.all() else mg)
