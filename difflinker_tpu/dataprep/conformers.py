"""Conformer generation: RDKit ETKDG with RMS/energy pruning, multi-process.

Port of data/zinc/rdkit_conf_parallel.py (adapted rdconf.py): per SMILES,
embed up to `max_confs` ETKDG conformers, MMFF-minimise optionally, prune by
heavy-atom RMS threshold, keep the lowest-energy survivors, write SDF chunks
(one per worker) mergeable with dataprep.zinc.filter_and_merge.
"""
from __future__ import annotations

import os
from typing import List, Optional


def generate_conformers_for_smiles(smi: str, max_confs: int = 20,
                                   seed: int = 42, rms_threshold: float = 0.7,
                                   energy_window: Optional[float] = None,
                                   minimize: bool = True):
    """Returns a list of (energy, mol-with-single-conformer), pruned."""
    from rdkit import Chem
    from rdkit.Chem import AllChem

    mol = Chem.MolFromSmiles(smi)
    if mol is None:
        return []
    mol = Chem.AddHs(mol)
    params = AllChem.ETKDGv3()
    params.randomSeed = seed
    params.pruneRmsThresh = rms_threshold
    conf_ids = AllChem.EmbedMultipleConfs(mol, numConfs=max_confs,
                                          params=params)
    if not conf_ids:
        return []

    energies = []
    for cid in conf_ids:
        energy = 0.0
        if minimize:
            try:
                ff = AllChem.MMFFGetMoleculeForceField(
                    mol, AllChem.MMFFGetMoleculeProperties(mol), confId=cid)
                ff.Minimize()
                energy = ff.CalcEnergy()
            except Exception:
                pass
        energies.append((energy, cid))
    energies.sort()

    mol_noh = Chem.RemoveHs(mol)
    out = []
    low, _ = energies[0]
    for energy, cid in energies:
        if energy_window is not None and energy - low > energy_window:
            break
        single = Chem.Mol(mol_noh)
        single.RemoveAllConformers()
        single.AddConformer(mol_noh.GetConformer(cid), assignId=True)
        single.SetProp('_Name', smi)
        single.SetProp('_Energy', str(energy))
        out.append((energy, single))
    return out


def _worker(args):
    chunk, out_path, kwargs = args
    from rdkit import Chem
    with Chem.SDWriter(open(out_path, 'w')) as writer:
        for smi in chunk:
            for _, mol in generate_conformers_for_smiles(smi, **kwargs):
                writer.write(mol)
    return out_path


def generate_conformers(smiles: List[str], out_dir: str, n_workers: int = 1,
                        **kwargs) -> List[str]:
    """Chunked multi-process driver (rdkit_conf_parallel.py:5-25). Returns
    the chunk SDF paths."""
    os.makedirs(out_dir, exist_ok=True)
    n_workers = max(n_workers, 1)
    chunks = [smiles[i::n_workers] for i in range(n_workers)]
    jobs = [(chunk, os.path.join(out_dir, f'confs_{i}.sdf'), kwargs)
            for i, chunk in enumerate(chunks) if chunk]
    if n_workers == 1:
        return [_worker(j) for j in jobs]
    import multiprocessing as mp
    with mp.Pool(n_workers) as pool:
        return pool.map(_worker, jobs)
