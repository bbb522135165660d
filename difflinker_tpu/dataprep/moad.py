"""Binding MOAD (pocket) dataset preparation.

Ports of data/pocket/clean_and_split.py (.bio1 → protein.pdb + per-ligand
.mol, natively — the reference shells out to pdb-tools; our fixed-column PDB
parser replaces that), generate_fragmentation_and_conformers.py (MMPA 2-cut
ligand fragmentation), prepare_dataset.py (ZINC-style prep + 6A pocket
extraction into `{prefix}_pockets.pkl` with full+bb modes) and
filter_and_train_test_split.py. RDKit-bound where molecules are parsed.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Tuple

import numpy as np

from difflinker_tpu.chem.pdb import BACKBONE_ATOMS, parse_pdb

ALLOWED_TYPES = {'C', 'O', 'N', 'F', 'S', 'Cl', 'Br', 'I', 'P'}
MIN_LIGAND_ATOMS, MAX_LIGAND_ATOMS = 11, 40  # 10 < n <= 40 (clean_and_split.py:17)


# ---------------------------------------------------------------------------
# .bio1 cleaning and protein/ligand splitting (clean_and_split.py:22-67)
# ---------------------------------------------------------------------------

def split_bio_assembly(bio_path: str, out_protein_pdb: str):
    """Model 1 only, drop hydrogens; ATOM records → protein pdb, HETATM
    (minus waters) → ligand atom list. Native replacement for the
    pdb_selmodel/pdb_delelem/pdb_delhetatm subprocess chain."""
    protein_lines, het_lines = [], []
    model_seen = 0
    with open(bio_path) as f:
        for line in f:
            rec = line[:6].strip()
            if rec == 'MODEL':
                model_seen += 1
                if model_seen > 1:
                    break
                continue
            if rec == 'ENDMDL':
                break
            if rec not in ('ATOM', 'HETATM'):
                continue
            element = line[76:78].strip().upper()
            if element == 'H':
                continue
            resname = line[17:20].strip()
            if rec == 'ATOM':
                protein_lines.append(line.rstrip('\n'))
            elif resname not in ('HOH', 'WAT', 'DOD'):
                het_lines.append(line.rstrip('\n'))
    with open(out_protein_pdb, 'w') as f:
        f.write('\n'.join(protein_lines) + '\nEND\n')
    return het_lines


def extract_ligands(het_lines: List[str]):
    """Group HETATM records into ligands by (chain, resname, resid); keep
    10 < n <= 40 heavy atoms (clean_and_split.py:13-19). Returns MolGraphs
    with perceived bonds (or RDKit mols when available)."""
    from difflinker_tpu import constants
    from difflinker_tpu.chem.molgraph import build_molecule

    groups: Dict[Tuple, list] = {}
    for line in het_lines:
        key = (line[21], line[17:20].strip(), int(line[22:26]))
        groups.setdefault(key, []).append(line)

    ligands = []
    for key, lines in groups.items():
        symbols, coords = [], []
        for ln in lines:
            el = ln[76:78].strip().upper()
            el = el.capitalize() if len(el) == 2 else el
            if el not in constants.GEOM_ATOM2IDX:
                continue
            symbols.append(el)
            coords.append([float(ln[30:38]), float(ln[38:46]), float(ln[46:54])])
        n = len(symbols)
        if not (MIN_LIGAND_ATOMS <= n <= MAX_LIGAND_ATOMS):
            continue
        types = np.asarray([constants.GEOM_ATOM2IDX[s] for s in symbols])
        ligands.append((key, build_molecule(np.asarray(coords, np.float32),
                                            types)))
    return ligands


def clean_and_split(input_dir: str, proteins_dir: str, ligands_dir: str):
    """Walk `*.bio1` assemblies → `{pdb}_protein.pdb` + `{pdb}_{i}.mol`
    (clean_and_split.py:22-67, without pdb-tools)."""
    from difflinker_tpu.io.xyz import molgraph_to_molblock

    os.makedirs(proteins_dir, exist_ok=True)
    os.makedirs(ligands_dir, exist_ok=True)
    n_prot = n_lig = 0
    for fname in sorted(os.listdir(input_dir)):
        if not fname.endswith('.bio1'):
            continue
        pdb_code = fname.split('.')[0]
        het = split_bio_assembly(os.path.join(input_dir, fname),
                                 os.path.join(proteins_dir,
                                              f'{pdb_code}_protein.pdb'))
        n_prot += 1
        for i, (_, lig) in enumerate(extract_ligands(het)):
            with open(os.path.join(ligands_dir, f'{pdb_code}_{i}.mol'), 'w') as f:
                f.write(molgraph_to_molblock(lig, f'{pdb_code}_{i}'))
            n_lig += 1
    return n_prot, n_lig


# ---------------------------------------------------------------------------
# Ligand fragmentation (generate_fragmentation_and_conformers.py:16-50)
# ---------------------------------------------------------------------------

def fragment_ligands(ligands_dir: str, output_table: str,
                     output_conformers: str, min_frag_size: int = 5,
                     min_link_size: int = 3, min_rings: int = 2):
    """MMPA 2-cut fragmentation of MOAD ligands (≤40 atoms, ≥min_rings rings)."""
    from rdkit import Chem
    from rdkit.Chem.rdMMPA import FragmentMol
    import pandas as pd
    from difflinker_tpu.dataprep.geom import MMPA_PATTERN, _mmpa_size_ok

    rows, conformers = [], []
    for fname in sorted(os.listdir(ligands_dir)):
        if not fname.endswith('.mol') or fname.startswith('._'):
            continue
        mol_name = fname.split('.')[0]
        try:
            mol = Chem.MolFromMolFile(os.path.join(ligands_dir, fname))
            mol = Chem.RemoveAllHs(mol)
            Chem.SanitizeMol(mol)
        except Exception:
            continue
        if mol is None or mol.GetRingInfo().NumRings() < min_rings:
            continue
        mol_smiles = Chem.MolToSmiles(mol)
        try:
            results = FragmentMol(mol, minCuts=2, maxCuts=2, maxCutBonds=100,
                                  pattern=MMPA_PATTERN, resultsAsMols=False)
        except Exception:
            continue
        kept = False
        for linker_smi, frags_smi in results:
            if (_mmpa_size_ok(linker_smi, min_link_size)
                    and all(_mmpa_size_ok(s, min_frag_size)
                            for s in frags_smi.split('.'))):
                rows.append([mol_name, mol_smiles, linker_smi, frags_smi,
                             'mmpa'])
                kept = True
        if kept:
            mol.SetProp('_Name', mol_name)
            conformers.append(mol)

    pd.DataFrame(rows, columns=['molecule_name', 'molecule', 'linker',
                                'fragments', 'method']).to_csv(
        output_table, index=False)
    with Chem.SDWriter(open(output_conformers, 'w')) as writer:
        for m in conformers:
            writer.write(m)
    return len(rows)


# ---------------------------------------------------------------------------
# Pocket dataset preparation (prepare_dataset.py:217-263)
# ---------------------------------------------------------------------------

def get_pocket(mol_coords: np.ndarray, pdb_path: str, cutoff: float = 6.0
               ) -> Dict[str, list]:
    """Full + backbone pocket dicts for one protein/ligand pair — the pkl
    schema consumed by MOADDataset (src/datasets.py:166-171)."""
    atoms = parse_pdb(pdb_path)
    coords = np.stack([a.coord for a in atoms])
    res_keys = np.asarray([hash((a.chain, a.res_id)) for a in atoms])
    d = np.linalg.norm(coords[:, None, :] - mol_coords[None, :, :], axis=-1)
    contact = set(res_keys[np.where(d.min(1) <= cutoff)[0]].tolist())

    out = {'full_coord': [], 'full_types': [], 'bb_coord': [], 'bb_types': []}
    for a, key in zip(atoms, res_keys):
        if key not in contact:
            continue
        if a.element == 'H':
            # the reference strips H before pocket extraction (pdb_delelem in
            # clean_and_split.py:39); downstream vocab lookup requires it
            continue
        out['full_coord'].append(a.coord.tolist())
        out['full_types'].append(a.element)
        if a.name in BACKBONE_ATOMS:
            out['bb_coord'].append(a.coord.tolist())
            out['bb_types'].append(a.element)
    return out


def prepare_moad_dataset(table_path: str, sdf_path: str, proteins_dir: str,
                         out_dir: str, prefix: str = 'MOAD'):
    """ZINC-style prep over the fragmented MOAD ligands + pocket pkl
    (prepare_dataset.py). Emits `{prefix}_table.csv`, `{prefix}_frag.sdf`,
    `{prefix}_link.sdf`, `{prefix}_pockets.pkl`."""
    import pandas as pd
    from rdkit import Chem
    from difflinker_tpu.dataprep.zinc import process_sdf, _write_sdf

    table = pd.read_csv(table_path)
    # MOAD conformers are named '1abc_0' (ligand ids), not SMILES — join on
    # molecule_name (reference data/pocket/prepare_dataset.py); the column is
    # carried into the output rows for protein lookup and the pdb split
    molecules, fragments, linkers, out_table = process_sdf(
        sdf_path, table, progress=True, join_col='molecule_name')

    pockets = []
    for mol, name in zip(molecules, out_table.molecule_name.values):
        pdb_code = str(name).split('_')[0]
        pdb_path = os.path.join(proteins_dir, f'{pdb_code}_protein.pdb')
        coords = mol.GetConformer().GetPositions()
        pockets.append(get_pocket(np.asarray(coords), pdb_path))

    out_table['pocket_full_size'] = [len(p['full_coord']) for p in pockets]
    out_table['molecule_size'] = [m.GetNumAtoms() for m in molecules]

    os.makedirs(out_dir, exist_ok=True)
    out_table.to_csv(os.path.join(out_dir, f'{prefix}_table.csv'), index=False)
    _write_sdf(fragments, os.path.join(out_dir, f'{prefix}_frag.sdf'),
               kekulize=False)
    _write_sdf(linkers, os.path.join(out_dir, f'{prefix}_link.sdf'),
               kekulize=False)
    with open(os.path.join(out_dir, f'{prefix}_pockets.pkl'), 'wb') as f:
        pickle.dump(pockets, f)


# ---------------------------------------------------------------------------
# Filtering + split (filter_and_train_test_split.py:15-58)
# ---------------------------------------------------------------------------

def filter_and_split(table_path: str, pockets_path: str,
                     test_pdbs_path: str = None, val_pdbs_path: str = None,
                     out_dir: str = '.', prefix: str = 'MOAD',
                     max_total_atoms: int = 1000,
                     frag_sdf_path: str = None, link_sdf_path: str = None):
    """Filter + pdb-based split. When the fragment/linker SDFs are given,
    writes fully ALIGNED per-split artifacts — `{prefix}_{split}_table.csv`,
    `_frag.sdf`, `_link.sdf`, `_pockets.pkl`, row i of each referring to the
    same complex — exactly what LinkerDataset.from_pt('{prefix}_{split}.full')
    expects to preprocess (positional pairing, data/datasets.py).

    The published split lists (reference resources/moad_{test,val}_pdbs.txt,
    used at data/pocket/filter_and_train_test_split.py:56-58) are vendored in
    difflinker_tpu/resources/ and used when no paths are given."""
    if test_pdbs_path is None or val_pdbs_path is None:
        res = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           '..', 'resources')
        test_pdbs_path = test_pdbs_path or os.path.join(
            res, 'moad_test_pdbs.txt')
        val_pdbs_path = val_pdbs_path or os.path.join(
            res, 'moad_val_pdbs.txt')
    import pandas as pd

    table = pd.read_csv(table_path)
    with open(pockets_path, 'rb') as f:
        pockets = pickle.load(f)

    discard = np.zeros(len(table), bool)
    discard |= (table.pocket_full_size.values
                + table.molecule_size.values) >= max_total_atoms
    for i, p in enumerate(pockets):
        types = set(p['full_types'])
        if types - ALLOWED_TYPES or len(p['full_coord']) == 0:
            discard[i] = True

    test_pdbs = set(np.loadtxt(test_pdbs_path, dtype=str, ndmin=1).tolist())
    val_pdbs = set(np.loadtxt(val_pdbs_path, dtype=str, ndmin=1).tolist())

    def assign(name):
        pdb = str(name).split('_')[0]
        if pdb in test_pdbs:
            return 'test'
        if pdb in val_pdbs:
            return 'val'
        return 'train'

    table['discard'] = discard
    table['dataset'] = [assign(n) for n in table.molecule_name.values]
    os.makedirs(out_dir, exist_ok=True)

    frag_mols = link_mols = None
    if frag_sdf_path and link_sdf_path:
        from difflinker_tpu.chem.io_rdkit import read_sdf
        frag_mols = list(read_sdf(frag_sdf_path))
        link_mols = list(read_sdf(link_sdf_path))

    counts = {}
    for name in ('train', 'val', 'test'):
        keep = (~table.discard) & (table.dataset == name)
        sub = table[keep]
        idxs = np.where(keep.values)[0]
        sub.to_csv(os.path.join(out_dir, f'{prefix}_{name}_table.csv'),
                   index=False)
        with open(os.path.join(out_dir, f'{prefix}_{name}_pockets.pkl'),
                  'wb') as f:
            pickle.dump([pockets[i] for i in idxs], f)
        if frag_mols is not None:
            from difflinker_tpu.dataprep.zinc import _write_sdf
            _write_sdf([frag_mols[i] for i in idxs],
                       os.path.join(out_dir, f'{prefix}_{name}_frag.sdf'),
                       kekulize=False)
            _write_sdf([link_mols[i] for i in idxs],
                       os.path.join(out_dir, f'{prefix}_{name}_link.sdf'),
                       kekulize=False)
        counts[name] = len(sub)
    return counts
