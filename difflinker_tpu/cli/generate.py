"""User-facing linker generation from a fragment file.

Port of generate.py: read fragments (sdf/mol/xyz; +pdb/mol2 with RDKit),
replicate n_samples times, sample linkers (polymorphic --linker-size:
int, 'lo,hi' range, 'prior', or a size-classifier checkpoint), un-center into
the input frame, write xyz + sdf (obabel when installed, else native bond
perception).

    python -m difflinker_tpu.cli.generate --fragments frags.sdf \
        --run RUN_DIR | --ckpt reference.ckpt \
        --linker-size 5 --n-samples 8 --out out/
"""
from __future__ import annotations

import argparse
import os
import sys

import jax

from difflinker_tpu.cli import common
from difflinker_tpu.cli.sample import load_model, parse_size_spec
from difflinker_tpu.data.collate import collate
from difflinker_tpu.io.xyz import save_xyz_file, xyz_to_sdf
from difflinker_tpu.sample.sampler import LinkerSampler


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--fragments', type=str, required=True)
    p.add_argument('--run', type=str)
    p.add_argument('--ckpt', type=str)
    p.add_argument('--params', type=str,
                   help='bundled demo-weights .npz (examples/params/*.npz)')
    p.add_argument('--linker-size', type=str, default='prior')
    p.add_argument('--size-model', type=str, default=None,
                   help='SizeClassifier .ckpt for learned size prediction')
    p.add_argument('--n-samples', type=int, default=5)
    common.add_respacing_args(p)
    common.add_mesh_args(p)
    p.add_argument('--anchors', type=str, default=None,
                   help='comma-separated anchor atom indices (1-based)')
    p.add_argument('--out', type=str, default='output')
    p.add_argument('--seed', type=int, default=0)
    return p


def fragment_sample_dict(args, is_geom):
    from difflinker_tpu.sample.service import sample_from_file
    anchors = ([int(a) for a in args.anchors.split(',')]
               if args.anchors else None)
    return sample_from_file(args.fragments, is_geom=is_geom, anchors=anchors)


def resolve_size_spec(args, cfg):
    if args.size_model:
        from difflinker_tpu.cli.sample import load_size_spec
        return load_size_spec(args.size_model)
    return parse_size_spec(args.linker_size)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    common.enable_compilation_cache()
    cfg, params = load_model(args)
    cfg = common.apply_respacing(cfg, args)
    is_geom = cfg.data.is_geom
    sample = fragment_sample_dict(args, is_geom)
    batch = collate([dict(sample) for _ in range(args.n_samples)])

    sampler = LinkerSampler(cfg, params, mesh=common.build_mesh(args))
    out = sampler.sample(batch, jax.random.PRNGKey(args.seed),
                         size_spec=resolve_size_spec(args, cfg),
                         recenter_output=True)
    if out['nan_flag'].any():
        common.log(f'warning: {int(out["nan_flag"].sum())} samples still NaN '
                   f'after retries — skipped')

    os.makedirs(args.out, exist_ok=True)
    names = [f'{sample["name"]}_{i}' for i in range(args.n_samples)]
    paths = save_xyz_file(args.out, out['one_hot'], out['positions'],
                          out['node_mask'], names=names, is_geom=is_geom)
    for p in paths:
        mode = xyz_to_sdf(p, p[:-4] + '.sdf')
    common.log(f'wrote {len(paths)} molecules to {args.out} '
               f'(sdf conversion: {mode})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
