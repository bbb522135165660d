"""Pocket-conditioned generation from fragments + a full protein PDB.

Port of generate_with_protein.py: extract the 6A-contact-residue pocket from
the protein (native PDB parser — no BioPython needed), assemble the
[fragment | pocket | linker] sample layout, and sample with a pocket model.

    python -m difflinker_tpu.cli.generate_with_protein \
        --fragments frags.sdf --protein protein.pdb \
        --run RUN_DIR | --ckpt pockets_difflinker.ckpt \
        --linker-size 5 --n-samples 4 [--backbone] --out out/
"""
from __future__ import annotations

import argparse
import os
import sys

import jax

from difflinker_tpu.cli import common
from difflinker_tpu.cli.generate import resolve_size_spec
from difflinker_tpu.cli.sample import load_model
from difflinker_tpu.data.collate import collate
from difflinker_tpu.io.xyz import save_xyz_file, xyz_to_sdf
from difflinker_tpu.sample.sampler import LinkerSampler


def build_argparser(pocket_is_precut: bool = False):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--fragments', type=str, required=True)
    if pocket_is_precut:
        p.add_argument('--pocket', type=str, required=True,
                       help='pre-cut pocket PDB')
    else:
        p.add_argument('--protein', type=str, required=True,
                       help='full protein PDB; pocket extracted at 6A')
    p.add_argument('--run', type=str)
    p.add_argument('--ckpt', type=str)
    p.add_argument('--params', type=str,
                   help='bundled demo-weights .npz (examples/params/*.npz)')
    p.add_argument('--backbone', action='store_true',
                   help='keep only N/CA/C/O pocket atoms')
    p.add_argument('--linker-size', type=str, default='prior')
    p.add_argument('--size-model', type=str, default=None)
    p.add_argument('--n-samples', type=int, default=5)
    common.add_respacing_args(p)
    common.add_mesh_args(p)
    p.add_argument('--anchors', type=str, default=None)
    p.add_argument('--pad-nodes', type=int, default=None,
                   help='pad every sample to this many atoms so different '
                        'complexes reuse one compiled chain (compiles '
                        'dominate pocket CLI latency, CLAUDE.md)')
    p.add_argument('--out', type=str, default='output')
    p.add_argument('--seed', type=int, default=0)
    return p


def build_pocket_sample(args, is_precut: bool):
    from difflinker_tpu.sample.service import pocket_sample_from_files
    anchors = ([int(a) for a in args.anchors.split(',')]
               if args.anchors else None)
    sample, center = pocket_sample_from_files(
        args.fragments,
        pocket=args.pocket if is_precut else None,
        protein=None if is_precut else args.protein,
        backbone=args.backbone, anchors=anchors, is_geom=True)
    n_pocket = int(sample['pocket_mask'].sum())
    common.log(f'fragments: {sample["num_atoms"] - n_pocket} atoms; '
               f'pocket: {n_pocket} atoms')
    return sample, center


def run(args, pocket_is_precut: bool):
    from difflinker_tpu.config import CenterOfMass
    cfg, params = load_model(args)
    assert cfg.data.has_pocket or cfg.model.context_node_nf == 3, \
        'this model was not trained with pocket conditioning'
    if cfg.train.center_of_mass == CenterOfMass.ANCHORS and not args.anchors:
        # reference refuses the same way (generate_with_protein.py:198-201)
        raise SystemExit(
            'this model centers on anchor atoms: pass --anchors i,j '
            '(1-based fragment atom indices) or use a model that does not '
            'require anchor information')
    cfg = common.apply_respacing(cfg, args)
    sample, center = build_pocket_sample(args, pocket_is_precut)
    nf_model, nf_input = cfg.model.in_node_nf, sample['one_hot'].shape[-1]
    if nf_model != nf_input:
        # without this the mismatch surfaces as an opaque XLA broadcast
        # error ((B,N,nf_input+3) vs (B,N,nf_model+3)) deep inside the jit
        vocab = {8: 'ZINC', 9: 'GEOM'}
        raise SystemExit(
            f'atom-type vocab mismatch: the model expects {nf_model} one-hot '
            f'channels ({vocab.get(nf_model, "custom")} vocab) but the parsed '
            f'input has {nf_input} ({vocab.get(nf_input, "custom")} vocab). '
            f'The pocket CLIs parse files with the GEOM vocab (as the '
            f'reference generate_with_protein.py does) — use a pocket model '
            f'trained with in_node_nf={nf_input}, or record "in_node_nf" in '
            f'the params sidecar .config.json.')
    batch = collate([dict(sample) for _ in range(args.n_samples)])

    sampler = LinkerSampler(cfg, params, mesh=common.build_mesh(args),
                            pad_nodes_to=args.pad_nodes)
    out = sampler.sample(batch, jax.random.PRNGKey(args.seed),
                         size_spec=resolve_size_spec(args, cfg),
                         recenter_output=True)
    if out['nan_flag'].any():
        common.log(f'warning: {int(out["nan_flag"].sum())} samples NaN after '
                   f'retries')

    os.makedirs(args.out, exist_ok=True)
    # save without the pocket (sample.py:141-164 convention)
    node_mask = out['node_mask'] - out['pocket_mask']
    positions = out['positions'] + center  # back to protein frame
    names = [f'{sample["name"]}_{i}' for i in range(args.n_samples)]
    paths = save_xyz_file(args.out, out['one_hot'], positions, node_mask,
                          names=names, is_geom=True)
    for p in paths:
        xyz_to_sdf(p, p[:-4] + '.sdf')
    common.log(f'wrote {len(paths)} pocket-conditioned molecules to {args.out}')
    return 0


def main(argv=None):
    args = build_argparser().parse_args(argv)
    common.enable_compilation_cache()
    return run(args, pocket_is_precut=False)


if __name__ == '__main__':
    sys.exit(main())
