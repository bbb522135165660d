"""GEOM multi-fragment dataset preparation.

Ports of data/geom/generate_geom_multifrag.py (MMPA 3-5-cut + BRICS 4-7-way
fragmentation with 1st/2nd/3rd-order linker enumeration over the fragment
adjacency), generate_geom_conformers.py (lowest-energy conformer from GEOM
pickles), train_test_split.py (stratified by (linker_size, num_linkers)) and
prepare_geom_dataset.py (multi-fragment generalisation of the ZINC prep;
`anchors` "i-j-k" column). RDKit-bound except the graph logic
(dataprep.graphs).
"""
from __future__ import annotations

import json
import os
import pickle
import re
from typing import List, Optional

import numpy as np

from difflinker_tpu.dataprep import graphs

EXIT_REGEX = re.compile(r'\[\d*\*\]')


# ---------------------------------------------------------------------------
# BRICS fragmentation (generate_geom_multifrag.py:20-171)
# ---------------------------------------------------------------------------

def split_into_n_fragments(mol, bonds, num_frags):
    """Split on the num_frags-1 BRICS bonds whose cleavage leaves the largest
    smallest-fragment (:20-46). Returns (frags, 1-based bond atom pairs)."""
    from rdkit import Chem
    num_bonds = num_frags - 1
    bond2minfrag, bond2atoms = {}, {}
    for bond in bonds:
        bond_idx = mol.GetBondBetweenAtoms(bond[0], bond[1]).GetIdx()
        pieces = Chem.GetMolFrags(
            Chem.FragmentOnBonds(mol, [bond_idx], addDummies=False),
            asMols=True)
        bond2minfrag[bond_idx] = min(p.GetNumAtoms() for p in pieces)
        bond2atoms[bond_idx] = bond
    chosen = sorted(bond2minfrag, key=lambda b: -bond2minfrag[b])[:num_bonds]
    # +1: dummy labels start at 1 (RDKit convention)
    bond_atoms = [(bond2atoms[b][0] + 1, bond2atoms[b][1] + 1) for b in chosen]
    frags = Chem.FragmentOnBonds(mol, chosen, addDummies=True,
                                 dummyLabels=bond_atoms)
    return Chem.GetMolFrags(frags, asMols=True), bond_atoms


def _heavy_size(frag_smi: str) -> int:
    from rdkit import Chem
    mol = Chem.MolFromSmiles(frag_smi)
    return mol.GetNumAtoms() - len(EXIT_REGEX.findall(frag_smi))


def fragment_by_brics(smiles: str, min_frag_size: int, num_frags: int,
                      linker_order: Optional[int] = None) -> List[List[str]]:
    """BRICS split + linker-set enumeration over the fragment adjacency
    (:113-171). Returns rows [molecule, linkers_smi, fragments_smi, 'brics']."""
    from rdkit import Chem
    from rdkit.Chem.BRICS import FindBRICSBonds

    mol = Chem.MolFromSmiles(smiles)
    bonds = [b[0] for b in FindBRICSBonds(mol)]
    if not bonds:
        return []
    frags, bond_atoms = split_into_n_fragments(mol, bonds, num_frags)
    frag_smis = [Chem.MolToSmiles(f) for f in frags]
    if any(_heavy_size(s) < min_frag_size for s in frag_smis):
        return []

    # dummy label ↔ owning fragment
    atom2frag = {}
    for i, smi in enumerate(frag_smis):
        for match in EXIT_REGEX.findall(smi):
            atom2frag[int(match[1:-2])] = i
    adjacency = graphs.fragment_adjacency(
        len(frags), [(atom2frag[a], atom2frag[b]) for a, b in bond_atoms])

    linker_sets = (graphs.enumerate_linker_sets(adjacency)
                   if linker_order is None else
                   {1: graphs.connected_linkers_order1,
                    2: graphs.linkers_order2,
                    3: graphs.linkers_order3}[linker_order](adjacency))

    rows = []
    for linkers in linker_sets:
        linker_smi = '.'.join(frag_smis[i] for i in range(len(frags))
                              if i in linkers)
        frag_smi = '.'.join(frag_smis[i] for i in range(len(frags))
                            if i not in linkers)
        rows.append([smiles, linker_smi, frag_smi, 'brics'])
    return rows


# ---------------------------------------------------------------------------
# MMPA fragmentation (generate_geom_multifrag.py:204-232)
# ---------------------------------------------------------------------------

MMPA_PATTERN = '[#6+0;!$(*=,#[!#6])]!@!=!#[*]'


def fragment_by_mmpa(smiles: str, min_cuts: int, max_cuts: int,
                     min_frag_size: int) -> List[List[str]]:
    from rdkit import Chem
    from rdkit.Chem.rdMMPA import FragmentMol

    results = []
    for cuts in range(min_cuts, max_cuts + 1):
        results += FragmentMol(Chem.MolFromSmiles(smiles), minCuts=cuts,
                               maxCuts=cuts, maxCutBonds=100,
                               pattern=MMPA_PATTERN, resultsAsMols=False)
    rows = []
    for linker_smi, frags_smi in results:
        if (_mmpa_size_ok(linker_smi, min_frag_size)
                and all(_mmpa_size_ok(s, min_frag_size)
                        for s in frags_smi.split('.'))):
            rows.append([smiles, linker_smi, frags_smi, 'mmpa'])
    return rows


def _mmpa_size_ok(smi: str, min_size: int) -> bool:
    from rdkit import Chem
    mol = Chem.MolFromSmiles(smi)
    return (mol.GetNumAtoms() - smi.count('*:')) >= min_size


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

def generate_multifrag_table(geom_json_path: str, output_path: str,
                             min_size: int, mmpa: bool = True,
                             brics: bool = True, checkpoint_every: int = 5000):
    """Main fragmentation sweep over the GEOM summary json
    (generate_geom_multifrag.py:219-254). MMPA restricted to ≤40 atoms and
    ≥3 rings; BRICS at 4-7 fragments."""
    from rdkit import Chem
    import pandas as pd

    with open(geom_json_path) as f:
        all_smiles = list(json.load(f).keys())

    rows = []

    def flush():
        table = pd.DataFrame(rows, columns=['molecule', 'linker',
                                            'fragments', 'method'])
        table = table.drop_duplicates(['molecule', 'linker'])
        table.to_csv(output_path, index=False)

    for i, smiles in enumerate(all_smiles):
        if mmpa:
            mol = Chem.MolFromSmiles(smiles)
            if (mol is not None and mol.GetNumAtoms() <= 40
                    and mol.GetRingInfo().NumRings() >= 3):
                try:
                    rows += fragment_by_mmpa(smiles, 3, 5, min_size)
                except Exception as e:
                    print(f'MMPA error for {smiles}: {e}')
        if brics:
            for num_frags in (4, 5, 6, 7):
                try:
                    rows += fragment_by_brics(smiles, min_size, num_frags)
                except Exception as e:
                    print(f'BRICS error for {smiles}: {e}')
        if (i + 1) % checkpoint_every == 0:
            flush()
    flush()


def select_lowest_energy_conformers(geom_json_path: str, geom_root: str,
                                    out_sdf: str, max_molecules=None):
    """Lowest-energy conformer per GEOM molecule from the drugs pickles
    (generate_geom_conformers.py:26-28)."""
    from rdkit import Chem

    with open(geom_json_path) as f:
        summary = json.load(f)
    written = 0
    with Chem.SDWriter(open(out_sdf, 'w')) as writer:
        for smiles, meta in summary.items():
            pkl = meta.get('pickle_path')
            if pkl is None:
                continue
            try:
                with open(os.path.join(geom_root, pkl), 'rb') as f:
                    entry = pickle.load(f)
                confs = entry['conformers']
                best = min(confs, key=lambda c: c.get('totalenergy', 0.0))
                mol = best['rd_mol']
                mol.SetProp('_Name', smiles)
                mol.SetProp('_Energy', str(best.get('totalenergy', 0.0)))
                writer.write(mol)
                written += 1
            except Exception as e:
                print(f'conformer error for {smiles}: {e}')
            if max_molecules and written >= max_molecules:
                break
    return written


def train_test_split_table(table_csv: str, out_dir: str, n_val_mols: int = 200,
                           n_test_mols: int = 200, seed: int = 0):
    """Stratified split by (linker_size, num_linkers) at the *molecule*
    level (train_test_split.py:42-55)."""
    import pandas as pd
    from rdkit import Chem

    table = pd.read_csv(table_csv)

    def linker_stats(linker_smi):
        parts = str(linker_smi).split('.')
        sizes = sum(_heavy_size(p) for p in parts)
        return sizes, len(parts)

    mols = table.molecule.drop_duplicates().values
    mol_keys = {}
    for mol in mols:
        sub = table[table.molecule == mol]
        sizes, counts = zip(*(linker_stats(l) for l in sub.linker.values))
        mol_keys[mol] = (int(np.median(sizes)), int(np.median(counts)))

    split = graphs.stratified_split([mol_keys[m] for m in mols],
                                    n_val_mols, n_test_mols, seed)
    os.makedirs(out_dir, exist_ok=True)
    for name, idxs in split.items():
        chosen = set(mols[idxs])
        table[table.molecule.isin(chosen)].to_csv(
            os.path.join(out_dir, f'geom_multifrag_{name}.csv'), index=False)
    return split


def prepare_geom_dataset(table_path: str, sdf_path: str, out_dir: str,
                         prefix: str, progress: bool = True):
    """Multi-fragment generalisation of the ZINC prep: same pipeline, the
    anchors column is 'i-j-k' (prepare_geom_dataset.py:291-297). Reuses
    dataprep.zinc.process_sdf whose row formatting already handles >2 anchors.
    """
    import pandas as pd
    from difflinker_tpu.dataprep.zinc import process_sdf, _write_sdf

    table = pd.read_csv(table_path)
    molecules, fragments, linkers, out_table = process_sdf(sdf_path, table,
                                                           progress)
    os.makedirs(out_dir, exist_ok=True)
    out_table.to_csv(os.path.join(out_dir, f'{prefix}_table.csv'), index=False)
    _write_sdf(molecules, os.path.join(out_dir, f'{prefix}_mol.sdf'))
    _write_sdf(fragments, os.path.join(out_dir, f'{prefix}_frag.sdf'),
               kekulize=False)
    _write_sdf(linkers, os.path.join(out_dir, f'{prefix}_link.sdf'),
               kekulize=False)
