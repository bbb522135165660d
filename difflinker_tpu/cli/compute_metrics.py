"""Offline benchmark over a `.smi` file of generated molecules.

Port of the reference compute_metrics.py:20-451: validity (full substructure
match), QED, SA, linker ring count, uniqueness, novelty vs train linkers,
recovery, PAINS, ring filter, linker-weighted RMSD via graph isomorphism +
GetBestRMS, SC_RDKit with 0.7/0.8/0.9 thresholds; writes a per-sample CSV and
a summary CSV next to the input.

Input format per line: `fragments true_molecule pred_molecule [pred_linker]`
(SMILES). RDKit-required — without it the CLI exits with an explanation (this
protocol is definitionally an RDKit/OpenBabel pipeline, README.md:230-265).

    python -m difflinker_tpu.cli.compute_metrics --smi samples.smi \
        --train-linkers train_linkers.smi [--sdf samples.sdf \
        --true-smi test_smiles.smi --true-sdf test_molecules.sdf] \
        [--pains wehi_pains.csv] [--restrict N]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

from difflinker_tpu.chem.molgraph import HAS_RDKIT


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--smi', required=True, help='generated .smi file')
    p.add_argument('--train-linkers', required=True,
                   help='training-set linker SMILES (novelty reference)')
    p.add_argument('--sdf', default=None, help='generated 3D sdf (for RMSD/SC)')
    p.add_argument('--true-smi', default=None)
    p.add_argument('--true-sdf', default=None)
    p.add_argument('--pains', default=None, help='PAINS SMARTS csv')
    p.add_argument('--restrict', type=int, default=None)
    return p


def load_smi(path, restrict=None):
    data = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(' ')
            if not parts or not parts[0]:
                continue
            data.append({'fragments': parts[0], 'true_molecule': parts[1],
                         'pred_molecule': parts[2],
                         'pred_linker': parts[3] if len(parts) > 3 else ''})
    return data[:restrict] if restrict else data


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if not HAS_RDKIT:
        print('compute_metrics requires RDKit (the reference protocol is an '
              'RDKit pipeline); install rdkit and retry', file=sys.stderr)
        return 2

    from rdkit import Chem
    from rdkit.Chem import MolStandardize, QED, rdMolAlign, rdMolDescriptors
    from difflinker_tpu.chem import sascorer
    from difflinker_tpu.chem.delinker import check_pains, check_ring_filter
    from difflinker_tpu.chem.sc_score import sc_rdkit_score

    data = load_smi(args.smi, args.restrict)
    summary = {}

    # validity: sanitize-props + full fragment substructure match
    # (compute_metrics.py:70-96)
    def is_valid(pred_smi, frag_smi):
        pred = Chem.MolFromSmiles(pred_smi)
        frag = Chem.MolFromSmiles(frag_smi)
        if pred is None or frag is None:
            return False
        try:
            Chem.SanitizeMol(pred,
                             sanitizeOps=Chem.SanitizeFlags.SANITIZE_PROPERTIES)
        except Exception:
            return False
        return len(pred.GetSubstructMatch(frag)) == frag.GetNumAtoms()

    for obj in data:
        obj['valid'] = is_valid(obj['pred_molecule'], obj['fragments'])
    summary['validity'] = 100 * np.mean([o['valid'] for o in data])
    print(f"Validity: {summary['validity']:.3f}%")

    # QED / SA / linker rings over valid molecules
    qed_vals, sa_vals, ring_vals = [], [], []
    for obj in data:
        obj.update(qed=None, sa=None, rings_n=None)
        if not obj['valid']:
            continue
        mol = Chem.MolFromSmiles(obj['pred_molecule'])
        obj['qed'] = QED.qed(mol)
        qed_vals.append(obj['qed'])
        try:
            obj['sa'] = sascorer.calculate_score(mol)
            sa_vals.append(obj['sa'])
        except Exception:
            pass
        try:
            obj['rings_n'] = rdMolDescriptors.CalcNumRings(
                Chem.MolFromSmiles(obj['pred_linker']))
            ring_vals.append(obj['rings_n'])
        except Exception:
            pass
    summary['qed'] = float(np.mean(qed_vals)) if qed_vals else 0.0
    summary['sa'] = float(np.mean(sa_vals)) if sa_vals else 0.0
    summary['rings_n'] = float(np.mean(ring_vals)) if ring_vals else 0.0

    # uniqueness grouped by (true molecule, fragments)
    groups = {}
    for obj in data:
        if obj['valid']:
            groups.setdefault(
                f"{obj['true_molecule']}_{obj['fragments']}", []).append(
                    obj['pred_molecule'])
    total = sum(len(v) for v in groups.values())
    unique = sum(len(set(v)) for v in groups.values())
    summary['uniqueness'] = 100 * unique / total if total else 0.0
    print(f"Uniqueness: {summary['uniqueness']:.3f}%")

    # novelty vs train linkers
    with open(args.train_linkers) as f:
        train_linkers = {line.strip() for line in f}
    novel = total = 0
    for obj in data:
        obj['novel'] = False
        if not obj['valid']:
            continue
        try:
            linker_mol = Chem.MolFromSmiles(obj['pred_linker'])
            Chem.RemoveStereochemistry(linker_mol)
            linker = MolStandardize.canonicalize_tautomer_smiles(
                Chem.MolToSmiles(linker_mol))
        except Exception:
            linker = obj['pred_linker']
        obj['novel'] = linker not in train_linkers
        novel += obj['novel']
        total += 1
    summary['novelty'] = 100 * novel / total if total else 0.0
    print(f"Novelty: {summary['novelty']:.3f}%")

    # recovery
    recovered, all_inputs = set(), set()
    for obj in data:
        obj['recovered'] = False
        if not obj['valid']:
            continue
        key = obj['true_molecule'] + '_' + obj['fragments']
        true = Chem.MolFromSmiles(obj['true_molecule'])
        Chem.RemoveStereochemistry(true)
        true_smi = Chem.MolToSmiles(Chem.RemoveHs(true))
        pred = Chem.MolFromSmiles(obj['pred_molecule'])
        Chem.RemoveStereochemistry(pred)
        pred_smi = Chem.MolToSmiles(Chem.RemoveHs(pred))
        obj['recovered'] = true_smi == pred_smi
        if obj['recovered']:
            recovered.add(key)
        all_inputs.add(key)
    summary['recovery'] = (100 * len(recovered) / len(all_inputs)
                           if all_inputs else 0.0)
    print(f"Recovery: {summary['recovery']:.3f}%")

    # PAINS + ring filter
    pains_smarts = []
    if args.pains:
        with open(args.pains) as f:
            pains_smarts = [Chem.MolFromSmarts(row[0], mergeHs=True)
                            for row in csv.reader(f)]
    pains_cnt = ra_cnt = total = 0
    for obj in data:
        obj['passed_pains'] = obj['passed_ring_filter'] = False
        if not obj['valid']:
            continue
        total += 1
        obj['passed_pains'] = check_pains(
            Chem.MolFromSmiles(obj['pred_molecule']), pains_smarts)
        pains_cnt += obj['passed_pains']
        try:
            obj['passed_ring_filter'] = check_ring_filter(
                Chem.MolFromSmiles(obj['pred_linker'], sanitize=False))
            ra_cnt += obj['passed_ring_filter']
        except Exception:
            pass
    summary['pains'] = 100 * pains_cnt / total if total else 0.0
    summary['ra'] = 100 * ra_cnt / total if total else 0.0

    # 3D metrics: linker-weighted RMSD + SC_RDKit thresholds
    if args.sdf and args.true_smi and args.true_sdf:
        import pandas as pd
        from networkx.algorithms import isomorphism
        from difflinker_tpu.chem.graph_utils import topology_from_rdkit

        true_smi = pd.read_csv(args.true_smi, sep=' ',
                               names=['mol', 'frag']).mol.values
        true_mols = Chem.SDMolSupplier(args.true_sdf)
        smi2mol = dict(zip(true_smi, true_mols))
        preds = Chem.SDMolSupplier(args.sdf)

        rmsd_list, sc_list = [], []
        for obj, pred in zip(data, preds):
            obj['rmsd'] = obj['sc_rdkit'] = None
            if pred is None or obj['true_molecule'] not in smi2mol:
                continue
            true = smi2mol[obj['true_molecule']]
            if obj['recovered']:
                t = Chem.RemoveHs(true)
                Chem.RemoveStereochemistry(t)
                p = Chem.RemoveHs(pred)
                Chem.RemoveStereochemistry(p)
                gm = isomorphism.GraphMatcher(topology_from_rdkit(p),
                                              topology_from_rdkit(t))
                if gm.is_isomorphic():
                    err = rdMolAlign.GetBestRMS(p, t)
                    n_frag = Chem.MolFromSmiles(obj['fragments']).GetNumAtoms()
                    n_link = p.GetNumAtoms() - n_frag
                    err *= np.sqrt(p.GetNumAtoms() / n_link)
                    rmsd_list.append(err)
                    obj['rmsd'] = err
            if obj['valid']:
                try:
                    rdMolAlign.GetO3A(pred, true).Align()
                    score = sc_rdkit_score(pred, true)
                except Exception:
                    score = -0.5
                sc_list.append(score)
                obj['sc_rdkit'] = score
        summary['rmsd'] = float(np.mean(rmsd_list)) if rmsd_list else 0.0
        sc = np.asarray(sc_list)
        if len(sc):
            summary['sc_rdkit_7'] = 100 * float((sc > 0.7).mean())
            summary['sc_rdkit_8'] = 100 * float((sc > 0.8).mean())
            summary['sc_rdkit_9'] = 100 * float((sc > 0.9).mean())
            summary['sc_rdkit_mean'] = float(sc.mean())
        print(f"Mean RMSD: {summary.get('rmsd', 0):.3f}")

    # stamp protocol provenance into the summary (VERDICT r2 #9): which chem
    # stack scored this run, plus the sdf-conversion backend recorded by
    # cli.reformat when its provenance file sits next to the .smi input
    from difflinker_tpu.chem.molgraph import chem_env_provenance
    prov = chem_env_provenance()
    summary['chem_smiles_backend'] = prov['smiles_backend']
    summary['chem_bond_backend'] = prov['bond_perception']
    prov_path = args.smi[:-4] + '_provenance.json'
    if os.path.exists(prov_path):
        import json
        with open(prov_path) as f:
            conversions = json.load(f).get('xyz_to_sdf_conversions', {})
        summary['sdf_conversion_backend'] = '+'.join(sorted(conversions)) or \
            prov['bond_perception']

    import pandas as pd
    pd.DataFrame(data).to_csv(args.smi[:-3] + 'csv', index=False)
    pd.DataFrame([summary]).to_csv(args.smi[:-4] + '_summary.csv', index=False)
    print('summary:', summary)
    return 0


if __name__ == '__main__':
    sys.exit(main())
