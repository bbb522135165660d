"""ZINC (and CASF) dataset preparation.

Ports of data/zinc/prepare_dataset.py (DeLinker triples + conformer SDF →
`{prefix}_table.csv` + `{prefix}_frag.sdf` + `{prefix}_link.sdf` +
`{prefix}_mol.sdf`), filter_and_merge.py (dedup keep lowest-energy conformer),
create_unique_smiles.py and prepare_val_test.py. CASF uses the same `run`
(data/casf/prepare.py:61). RDKit-bound.
"""
from __future__ import annotations

import os
from typing import List

from difflinker_tpu.dataprep.fragmentation import (
    combine_fragments, get_anchors_idx, prepare_fragments_and_linker)


def process_sdf(sdf_path: str, table, progress: bool = True,
                join_col: str = 'molecule'):
    """Pair each conformer molecule with its DeLinker (linker, fragments)
    rows and build anchored fragment/linker conformers
    (prepare_dataset.py:214-255).

    join_col: table column matched against the SDF `_Name` — 'molecule'
    (SMILES names, ZINC/GEOM) or 'molecule_name' (MOAD '1abc_0' ligand names,
    reference data/pocket/prepare_dataset.py)."""
    from rdkit import Chem
    import pandas as pd

    supplier = Chem.SDMolSupplier(sdf_path)
    if progress:
        from tqdm import tqdm
        supplier = tqdm(supplier, total=len(supplier))

    molecules, fragments, linkers, rows = [], [], [], []
    uuid = 0
    for mol in supplier:
        if mol is None:
            continue
        mol_name = mol.GetProp('_Name')
        mol_smi = Chem.MolToSmiles(mol)
        mol.SetProp('_Name', mol_smi)
        sel = table[table[join_col] == mol_name][['linker', 'fragments']].values
        for linker_smi, frags_smi in sel:
            try:
                frags, linker = prepare_fragments_and_linker(
                    frags_smi, linker_smi, mol)
            except Exception as e:
                print(f'{mol_smi} | {linker_smi} | {frags_smi} : {e}')
                continue
            combined = combine_fragments(frags)
            anchors_idx = get_anchors_idx(combined)
            if len(anchors_idx) != len(frags):
                print(f'{mol_smi}: found {len(anchors_idx)} anchors, '
                      f'expected {len(frags)}')
                continue
            molecules.append(mol)
            fragments.append(combined)
            linkers.append(linker)
            row = {
                'uuid': uuid, 'molecule': mol_smi,
                'fragments': Chem.MolToSmiles(combined),
                'linker': Chem.MolToSmiles(linker),
                'energy': mol.GetProp('_Energy') if mol.HasProp('_Energy') else 0,
            }
            if join_col != 'molecule':
                row[join_col] = mol_name
            if len(anchors_idx) == 2:
                row['anchor_1'], row['anchor_2'] = anchors_idx[:2]
            else:
                row['anchors'] = '-'.join(map(str, anchors_idx))
            rows.append(row)
            uuid += 1
    import pandas as pd
    return molecules, fragments, linkers, pd.DataFrame(rows)


def _write_sdf(mols, path, kekulize=True):
    from rdkit import Chem
    with Chem.SDWriter(open(path, 'w')) as writer:
        if not kekulize:
            writer.SetKekulize(False)
        for m in mols:
            writer.write(m)


def _process_and_write(table, sdf_path, out_table_path, out_mol_path,
                       out_frag_path, out_link_path, progress):
    """Match the table against the conformer SDF and write the four
    artifacts, dispatching on RDKit availability. The single gate for BOTH
    the one-process and the chunked parallel drivers — keeping it here means
    an RDKit-free image takes the native tier on every path.

    molgraph.HAS_RDKIT verifies a USABLE rdkit (a real symbol exists), not
    just an importable module — test fixtures stub `rdkit` in sys.modules
    with bond enums only, and a bare `import rdkit` would mis-route onto
    the Chem.SDMolSupplier path here."""
    from difflinker_tpu.chem.molgraph import HAS_RDKIT
    if HAS_RDKIT:
        molecules, fragments, linkers, out_table = process_sdf(
            sdf_path, table, progress)
        out_table.to_csv(out_table_path, index=False)
        _write_sdf(molecules, out_mol_path)
        _write_sdf(fragments, out_frag_path, kekulize=False)
        _write_sdf(linkers, out_link_path, kekulize=False)
        return
    # rdkit-free tier: native SMILES parse + VF2 matching
    # (dataprep/fragmentation_native.py) and MOL-V2000 writes — same
    # artifact contract, so cli.train consumes the outputs unchanged
    from difflinker_tpu.dataprep.fragmentation_native import process_sdf_native
    from difflinker_tpu.io.xyz import write_sdf as write_sdf_native
    molecules, fragments, linkers, out_table = process_sdf_native(
        sdf_path, table, progress)
    out_table.to_csv(out_table_path, index=False)
    titles = [str(s) for s in out_table['molecule']] if len(out_table) else []
    write_sdf_native(molecules, out_mol_path, titles=titles)
    write_sdf_native(fragments, out_frag_path, titles=titles)
    write_sdf_native(linkers, out_link_path, titles=titles)


def run(table_path: str, sdf_path: str, out_mol_path: str, out_frag_path: str,
        out_link_path: str, out_table_path: str, progress: bool = True):
    """Full ZINC preparation entry (prepare_dataset.py:258-273). The input
    table is the DeLinker .smi: `molecule linker fragments distance angle`."""
    import pandas as pd
    table = pd.read_csv(table_path, sep=' ',
                        names=['molecule', 'linker', 'fragments',
                               'distance', 'angle'])
    _process_and_write(table, sdf_path, out_table_path, out_mol_path,
                       out_frag_path, out_link_path, progress)


def _run_chunk(args):
    (table_chunk_csv, sdf_path, out_prefix) = args
    import pandas as pd
    table = pd.read_csv(table_chunk_csv)
    _process_and_write(table, sdf_path, f'{out_prefix}_table.csv',
                       f'{out_prefix}_mol.sdf', f'{out_prefix}_frag.sdf',
                       f'{out_prefix}_link.sdf', progress=False)
    return out_prefix


def run_parallel(table_path: str, sdf_path: str, out_dir: str, prefix: str,
                 n_workers: int = 2):
    """Chunked multi-process driver (reference
    data/zinc/prepare_dataset_parallel.py): split the DeLinker table into
    per-worker chunks, process each against the shared conformer SDF, then
    concatenate the artifacts with re-assigned uuids."""
    import multiprocessing as mp
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    table = pd.read_csv(table_path, sep=' ',
                        names=['molecule', 'linker', 'fragments',
                               'distance', 'angle'])
    jobs = []
    for w in range(n_workers):
        chunk = table.iloc[w::n_workers]
        chunk_csv = os.path.join(out_dir, f'_chunk_{w}.csv')
        chunk.to_csv(chunk_csv, index=False)
        jobs.append((chunk_csv, sdf_path, os.path.join(out_dir, f'_part_{w}')))
    if n_workers == 1:
        prefixes = [_run_chunk(jobs[0])]
    else:
        with mp.Pool(n_workers) as pool:
            prefixes = pool.map(_run_chunk, jobs)

    # merge: concatenate tables (uuid reassigned) and sdf files in order
    import pandas as pd
    tables = []
    uuid = 0
    for part in prefixes:
        t = pd.read_csv(f'{part}_table.csv')
        t['uuid'] = range(uuid, uuid + len(t))
        uuid += len(t)
        tables.append(t)
    pd.concat(tables).to_csv(os.path.join(out_dir, f'{prefix}_table.csv'),
                             index=False)
    for kind in ('mol', 'frag', 'link'):
        with open(os.path.join(out_dir, f'{prefix}_{kind}.sdf'), 'w') as out:
            for part in prefixes:
                with open(f'{part}_{kind}.sdf') as f:
                    out.write(f.read())
    for w in range(n_workers):
        os.remove(os.path.join(out_dir, f'_chunk_{w}.csv'))
        for kind in ('table.csv', 'mol.sdf', 'frag.sdf', 'link.sdf'):
            os.remove(os.path.join(out_dir, f'_part_{w}_{kind}'))


def filter_and_merge(chunk_sdf_paths: List[str], out_path: str):
    """Merge per-worker conformer chunks, keeping the lowest-energy conformer
    per SMILES (data/zinc/filter_and_merge.py:33-41)."""
    from rdkit import Chem
    best = {}
    for path in chunk_sdf_paths:
        for mol in Chem.SDMolSupplier(path):
            if mol is None:
                continue
            smi = mol.GetProp('_Name')
            energy = float(mol.GetProp('_Energy')) if mol.HasProp('_Energy') else 0.0
            if smi not in best or energy < best[smi][0]:
                best[smi] = (energy, mol)
    _write_sdf([m for _, m in best.values()], out_path)


def create_unique_smiles(triples_path: str, out_path: str):
    """Unique molecule SMILES from a DeLinker triples file
    (data/zinc/create_unique_smiles.py)."""
    seen, out = set(), []
    with open(triples_path) as f:
        for line in f:
            parts = line.strip().split(' ')
            if parts and parts[0] and parts[0] not in seen:
                seen.add(parts[0])
                out.append(parts[0])
    with open(out_path, 'w') as f:
        f.write('\n'.join(out) + '\n')


def prepare_val_test(table_path: str, sdf_path: str, out_dir: str,
                     prefix: str):
    """Val/test sets straight from the DeLinker SDF conformers
    (data/zinc/prepare_val_test.py): same pipeline, different artifacts."""
    os.makedirs(out_dir, exist_ok=True)
    run(table_path, sdf_path,
        os.path.join(out_dir, f'{prefix}_mol.sdf'),
        os.path.join(out_dir, f'{prefix}_frag.sdf'),
        os.path.join(out_dir, f'{prefix}_link.sdf'),
        os.path.join(out_dir, f'{prefix}_table.csv'))
