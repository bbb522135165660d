"""Reformat sampled xyz files into the evaluation `.smi` + `.sdf` dataset.

Port of reformat_data_obabel.py: per sampled xyz, convert to SDF (obabel when
installed — the published-protocol path — else native geometric bond
perception), keep the largest connected component, extract the linker SMILES
by removing the true-fragment substructure match, and join with the
ground-truth SMILES table. SMILES emission requires RDKit; without it the sdf
conversion still runs and a WL-hash `.keys` file is written instead so
uniqueness-style analyses remain possible.

    python -m difflinker_tpu.cli.reformat --samples samples/ \
        --true-smiles datasets/zinc_final_test_smiles.smi --out formatted/
"""
from __future__ import annotations

import argparse
import os
import sys

from difflinker_tpu.cli import common
from difflinker_tpu.chem.molgraph import HAS_RDKIT
from difflinker_tpu.io.xyz import xyz_to_sdf


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--samples', required=True,
                   help='dir of per-uuid sample dirs (cli.sample output)')
    p.add_argument('--true-smiles', required=True,
                   help='.smi table: `molecule fragments` per line, row i == uuid i')
    p.add_argument('--out', required=True)
    p.add_argument('--name', default='dataset')
    return p


def load_molecule_smiles(sdf_path: str, true_frag_smi: str):
    """(mol, mol_smi, linker_smi) keeping the biggest connected part
    (reformat_data_obabel.py:21-52)."""
    from rdkit import Chem
    supp = Chem.SDMolSupplier(sdf_path, sanitize=False)
    mol = list(supp)[0]
    frags = Chem.GetMolFrags(mol, asMols=True, sanitizeFrags=False)
    mol = max(frags, default=mol, key=lambda m: m.GetNumAtoms())
    try:
        mol_smi = Chem.MolToSmiles(mol)
    except RuntimeError:
        mol_smi = Chem.MolToSmiles(mol, canonical=False)

    true_frag = Chem.MolFromSmiles(true_frag_smi, sanitize=False)
    match = mol.GetSubstructMatch(true_frag)
    if len(match) == 0:
        linker_smi = ''
    else:
        editable = Chem.EditableMol(mol)
        for atom in sorted(match, reverse=True):
            editable.RemoveAtom(atom)
        linker = editable.GetMol()
        Chem.Kekulize(linker, clearAromaticFlags=True)
        try:
            linker_smi = Chem.MolToSmiles(linker)
        except RuntimeError:
            linker_smi = Chem.MolToSmiles(linker, canonical=False)
    return mol, mol_smi, linker_smi


def main(argv=None):
    import pandas as pd
    args = build_argparser().parse_args(argv)
    table = pd.read_csv(args.true_smiles, sep=' ',
                        names=['molecule', 'fragments'])
    os.makedirs(args.out, exist_ok=True)

    rows, mols = [], []
    backend_counts = {}
    uuid_dirs = sorted((d for d in os.listdir(args.samples) if d.isdigit()),
                       key=int)
    for u in uuid_dirs:
        folder = os.path.join(args.samples, u)
        true_mol_smi = table.molecule.values[int(u)]
        true_frag_smi = table.fragments.values[int(u)]
        obabel_dir = os.path.join(folder, 'obabel')
        os.makedirs(obabel_dir, exist_ok=True)
        for fname in sorted(os.listdir(folder)):
            # sample files are '{i}_.xyz'; true_/frag_/pocket_ are skipped by
            # the isdigit check (naming contract: cli/sample.already_generated)
            stem = fname.split('_')[0]
            if not (fname.endswith('.xyz') and stem.isdigit()):
                continue
            sdf_path = os.path.join(obabel_dir, f'{stem}_.sdf')
            if not os.path.exists(sdf_path):
                backend = xyz_to_sdf(os.path.join(folder, fname), sdf_path)
                backend_counts[backend] = backend_counts.get(backend, 0) + 1
            if HAS_RDKIT:
                mol, mol_smi, linker_smi = load_molecule_smiles(
                    sdf_path, true_frag_smi)
                mols.append(mol)
            else:
                from difflinker_tpu.chem.io_rdkit import _read_sdf_native
                mg = list(_read_sdf_native(sdf_path))[0].largest_component()
                mols.append(mg)
                mol_smi, linker_smi = mg.canonical_key(), ''
            rows.append((true_frag_smi, true_mol_smi, mol_smi, linker_smi, u))

    smi_path = os.path.join(args.out, f'{args.name}.smi')
    with open(smi_path, 'w') as f:
        for frag, true, pred, linker, u in rows:
            f.write(f'{frag} {true} {pred} {linker} {u}\n')

    sdf_path = os.path.join(args.out, f'{args.name}.sdf')
    if HAS_RDKIT:
        from rdkit import Chem
        with Chem.SDWriter(open(sdf_path, 'w')) as writer:
            for mol in mols:
                writer.write(mol)
    else:
        from difflinker_tpu.io.xyz import write_sdf
        write_sdf(mols, sdf_path)
    # protocol provenance rides with the dataset: which bond-perception and
    # SMILES backends produced these files (VERDICT r2 #9)
    import json
    from difflinker_tpu.chem.molgraph import chem_env_provenance
    prov = chem_env_provenance()
    prov['xyz_to_sdf_conversions'] = backend_counts
    prov_path = os.path.join(args.out, f'{args.name}_provenance.json')
    with open(prov_path, 'w') as f:
        json.dump(prov, f, indent=2)
    common.log(f'wrote {len(rows)} entries -> {smi_path}, {sdf_path} '
               f'(chem backends: {prov["bond_perception"]} bonds, '
               f'{prov["smiles_backend"]} smiles -> {prov_path})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
