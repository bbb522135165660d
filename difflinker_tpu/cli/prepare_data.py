"""Dataset-preparation CLI — one entry for all L1 pipelines.

    python -m difflinker_tpu.cli.prepare_data zinc --table triples.smi \
        --sdf confs.sdf --out-dir datasets --prefix zinc_final_train
    python -m difflinker_tpu.cli.prepare_data conformers --smiles smiles.txt ...
    python -m difflinker_tpu.cli.prepare_data geom-multifrag --geom-json ...
    python -m difflinker_tpu.cli.prepare_data geom-split --table ...
    python -m difflinker_tpu.cli.prepare_data moad-clean --in-dir ...
    python -m difflinker_tpu.cli.prepare_data moad-fragment --ligands-dir ...
    python -m difflinker_tpu.cli.prepare_data moad-prepare --table ...
    python -m difflinker_tpu.cli.prepare_data moad-split --table ...
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)

    s = sub.add_parser('zinc', help='DeLinker triples + conformers -> dataset')
    s.add_argument('--table', required=True)
    s.add_argument('--sdf', required=True)
    s.add_argument('--out-dir', required=True)
    s.add_argument('--prefix', default='zinc_final_train')
    s.add_argument('--workers', type=int, default=1)

    s = sub.add_parser('conformers', help='ETKDG conformer generation')
    s.add_argument('--smiles', required=True, help='one SMILES per line')
    s.add_argument('--out-dir', required=True)
    s.add_argument('--workers', type=int, default=1)
    s.add_argument('--max-confs', type=int, default=20)
    s.add_argument('--merge', action='store_true',
                   help='also merge chunks keeping lowest-energy conformer')

    s = sub.add_parser('unique-smiles')
    s.add_argument('--triples', required=True)
    s.add_argument('--out', required=True)

    s = sub.add_parser('geom-multifrag')
    s.add_argument('--geom-json', required=True)
    s.add_argument('--output', required=True)
    s.add_argument('--min-size', type=int, default=3)
    s.add_argument('--mmpa', action='store_true')
    s.add_argument('--brics', action='store_true')

    s = sub.add_parser('geom-conformers')
    s.add_argument('--geom-json', required=True)
    s.add_argument('--geom-root', required=True)
    s.add_argument('--out-sdf', required=True)

    s = sub.add_parser('geom-split')
    s.add_argument('--table', required=True)
    s.add_argument('--out-dir', required=True)
    s.add_argument('--n-val', type=int, default=200)
    s.add_argument('--n-test', type=int, default=200)

    s = sub.add_parser('geom-prepare')
    s.add_argument('--table', required=True)
    s.add_argument('--sdf', required=True)
    s.add_argument('--out-dir', required=True)
    s.add_argument('--prefix', default='geom_multifrag_train')

    s = sub.add_parser('moad-clean')
    s.add_argument('--in-dir', required=True)
    s.add_argument('--proteins-dir', required=True)
    s.add_argument('--ligands-dir', required=True)

    s = sub.add_parser('moad-fragment')
    s.add_argument('--ligands-dir', required=True)
    s.add_argument('--out-table', required=True)
    s.add_argument('--out-conformers', required=True)

    s = sub.add_parser('moad-prepare')
    s.add_argument('--table', required=True)
    s.add_argument('--sdf', required=True)
    s.add_argument('--proteins-dir', required=True)
    s.add_argument('--out-dir', required=True)
    s.add_argument('--prefix', default='MOAD')

    s = sub.add_parser('moad-split')
    s.add_argument('--table', required=True)
    s.add_argument('--pockets', required=True)
    s.add_argument('--test-pdbs', default=None,
                   help='default: vendored resources/moad_test_pdbs.txt')
    s.add_argument('--val-pdbs', default=None,
                   help='default: vendored resources/moad_val_pdbs.txt')
    s.add_argument('--out-dir', required=True)
    s.add_argument('--prefix', default='MOAD')
    s.add_argument('--frag-sdf', default=None,
                   help='with --link-sdf: also write aligned per-split sdf/pkl')
    s.add_argument('--link-sdf', default=None)

    args = p.parse_args(argv)

    if args.cmd == 'zinc':
        from difflinker_tpu.dataprep import zinc
        os.makedirs(args.out_dir, exist_ok=True)
        if args.workers > 1:
            zinc.run_parallel(args.table, args.sdf, args.out_dir, args.prefix,
                              n_workers=args.workers)
        else:
            zinc.run(args.table, args.sdf,
                     os.path.join(args.out_dir, f'{args.prefix}_mol.sdf'),
                     os.path.join(args.out_dir, f'{args.prefix}_frag.sdf'),
                     os.path.join(args.out_dir, f'{args.prefix}_link.sdf'),
                     os.path.join(args.out_dir, f'{args.prefix}_table.csv'))
    elif args.cmd == 'conformers':
        from difflinker_tpu.dataprep import conformers, zinc
        with open(args.smiles) as f:
            smiles = [line.strip().split()[0] for line in f if line.strip()]
        chunks = conformers.generate_conformers(
            smiles, args.out_dir, n_workers=args.workers,
            max_confs=args.max_confs)
        if args.merge:
            zinc.filter_and_merge(
                chunks, os.path.join(args.out_dir, 'conformers_merged.sdf'))
    elif args.cmd == 'unique-smiles':
        from difflinker_tpu.dataprep import zinc
        zinc.create_unique_smiles(args.triples, args.out)
    elif args.cmd == 'geom-multifrag':
        from difflinker_tpu.dataprep import geom
        geom.generate_multifrag_table(args.geom_json, args.output,
                                      args.min_size, mmpa=args.mmpa,
                                      brics=args.brics)
    elif args.cmd == 'geom-conformers':
        from difflinker_tpu.dataprep import geom
        geom.select_lowest_energy_conformers(args.geom_json, args.geom_root,
                                             args.out_sdf)
    elif args.cmd == 'geom-split':
        from difflinker_tpu.dataprep import geom
        geom.train_test_split_table(args.table, args.out_dir, args.n_val,
                                    args.n_test)
    elif args.cmd == 'geom-prepare':
        from difflinker_tpu.dataprep import geom
        geom.prepare_geom_dataset(args.table, args.sdf, args.out_dir,
                                  args.prefix)
    elif args.cmd == 'moad-clean':
        from difflinker_tpu.dataprep import moad
        n_prot, n_lig = moad.clean_and_split(args.in_dir, args.proteins_dir,
                                             args.ligands_dir)
        print(f'{n_prot} proteins, {n_lig} ligands')
    elif args.cmd == 'moad-fragment':
        from difflinker_tpu.dataprep import moad
        n = moad.fragment_ligands(args.ligands_dir, args.out_table,
                                  args.out_conformers)
        print(f'{n} fragmentations')
    elif args.cmd == 'moad-prepare':
        from difflinker_tpu.dataprep import moad
        moad.prepare_moad_dataset(args.table, args.sdf, args.proteins_dir,
                                  args.out_dir, args.prefix)
    elif args.cmd == 'moad-split':
        from difflinker_tpu.dataprep import moad
        counts = moad.filter_and_split(args.table, args.pockets,
                                       args.test_pdbs, args.val_pdbs,
                                       args.out_dir, args.prefix,
                                       frag_sdf_path=args.frag_sdf,
                                       link_sdf_path=args.link_sdf)
        print(counts)
    return 0


if __name__ == '__main__':
    sys.exit(main())
