"""Save denoising-chain trajectories as xyz frames + png/gif animations.

Port of sample_trajectories.py:44-98.

    python -m difflinker_tpu.cli.sample_trajectories --run RUN_DIR \
        --prefix zinc_final_val --keep-frames 100 --n-inputs 2 --out traj/
"""
from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

from difflinker_tpu.cli import common
from difflinker_tpu.cli.sample import load_model
from difflinker_tpu.data.datasets import LinkerDataset, synthetic_dataset
from difflinker_tpu.io.xyz import save_xyz_file
from difflinker_tpu.sample.sampler import LinkerSampler


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--run', type=str)
    p.add_argument('--ckpt', type=str)
    p.add_argument('--params', type=str,
                   help='bundled demo-weights .npz (examples/params/*.npz)')
    p.add_argument('--data', type=str, default='datasets')
    p.add_argument('--prefix', type=str, default='zinc_final_val')
    p.add_argument('--synthetic', type=int, default=None)
    p.add_argument('--keep-frames', type=int, default=100)
    p.add_argument('--n-inputs', type=int, default=2)
    p.add_argument('--out', type=str, default='trajectories')
    p.add_argument('--gif', action='store_true', help='also render png/gif')
    p.add_argument('--seed', type=int, default=0)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    common.enable_compilation_cache()
    cfg, params = load_model(args)
    if args.synthetic:
        if args.params:
            # bundled demo weights: generate inputs the recipe was trained
            # on (multifrag artifacts need k-fragment molecules, etc.)
            import json
            from difflinker_tpu.demo import recipe_val_dataset
            # seed=1 is the held-out val convention everywhere (the
            # demo_learning* scripts train on seed=0) — trajectories must
            # not showcase memorized training inputs
            with open(args.params + '.config.json') as f:
                ds = recipe_val_dataset(json.load(f), args.synthetic, seed=1)
        else:
            ds = synthetic_dataset(args.synthetic, seed=0,
                                   is_geom=cfg.data.is_geom)
    else:
        ds = LinkerDataset.from_pt(args.data, args.prefix)

    batch = next(ds.iter_batches(args.n_inputs, group_by_bucket=False))
    sampler = LinkerSampler(cfg, params)
    keep = min(args.keep_frames, cfg.diffusion.timesteps)
    out = sampler.sample(batch, jax.random.PRNGKey(args.seed),
                         size_spec='ground_truth', keep_frames=keep)
    chain = out['chain']  # (keep, B, N, 3+nf)
    assert chain.shape[0] == keep

    is_geom = cfg.data.is_geom
    # exclude the trailing charge column from the one-hot decode when present
    nf = cfg.model.in_node_nf - int(cfg.data.include_charges)
    for i in range(chain.shape[1]):
        name = str(np.asarray(batch['uuid']).tolist()[i])
        mol_dir = os.path.join(args.out, f'mol_{name}')
        os.makedirs(mol_dir, exist_ok=True)
        node_mask = np.repeat(out['node_mask'][i][None], keep, axis=0)
        save_xyz_file(mol_dir, chain[:, i, :, 3:3 + nf], chain[:, i, :, :3],
                      node_mask, names=[f'{name}_{j}' for j in range(keep)],
                      is_geom=is_geom)
        common.log(f'wrote {keep} frames for input {name}')
        if args.gif:
            from difflinker_tpu.io.visualizer import visualize_chain
            gif = visualize_chain(mol_dir, is_geom=is_geom)
            common.log(f'animation: {gif}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
