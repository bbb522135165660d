"""Batch sampling over a test dataset → per-uuid xyz files.

Port of sample.py: n_samples linkers per input, resume-aware (skips uuids
whose outputs already exist, sample.py:37-61), optional size-classifier or
prior size selection, T override.

    python -m difflinker_tpu.cli.sample --run RUN_DIR --prefix zinc_final_test \
        --data datasets --n-samples 5 [--linker-size-model CKPT] [--steps T]
"""
from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

from difflinker_tpu.cli import common
from difflinker_tpu.data.datasets import LinkerDataset, synthetic_dataset
from difflinker_tpu.io import checkpoints as ckpt_lib
from difflinker_tpu.io.xyz import save_xyz_file
from difflinker_tpu.sample.sampler import LinkerSampler


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--run', type=str, help='training run dir (orbax)')
    p.add_argument('--ckpt', type=str,
                   help='reference Lightning .ckpt to sample from instead')
    p.add_argument('--params', type=str,
                   help='bundled demo-weights .npz (examples/params/*.npz)')
    p.add_argument('--data', type=str, default='datasets')
    p.add_argument('--prefix', type=str, default='zinc_final_test')
    p.add_argument('--synthetic', type=int, default=None)
    p.add_argument('--n-samples', type=int, default=5)
    p.add_argument('--batch-size', type=int, default=64)
    common.add_respacing_args(p)
    common.add_mesh_args(p)
    p.add_argument('--linker-size', type=str, default='ground_truth',
                   help="'ground_truth' | 'prior' | int | 'lo,hi'")
    p.add_argument('--linker-size-model', type=str, default=None,
                   help='SizeClassifier .ckpt for learned size prediction '
                        '(reference sample.py:66-81)')
    p.add_argument('--out', type=str, default='samples')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--pad-nodes', type=int, default=None,
                   help='pad every template to this node count so one '
                        'compiled chain serves all batches (each extra '
                        'shape costs a compile + device program load)')
    return p


def parse_size_spec(s: str):
    if s in ('ground_truth', 'prior'):
        return s
    if ',' in s:
        lo, hi = s.split(',')
        return (int(lo), int(hi))
    return int(s)


def load_size_spec(size_model: str):
    """SizeClassifier .ckpt → sampler size callable (reference sample.py:66-81,
    generate.py:88-99). Uses size_prediction_fn so the predictor sees the
    fragment-edges graph regardless of which collate built the batch."""
    from difflinker_tpu.io.lightning_import import load_size_checkpoint
    from difflinker_tpu.models.size_gnn import (SizePredictor,
                                                size_prediction_fn)
    hp, params, state = load_size_checkpoint(size_model)
    predictor = SizePredictor(
        in_node_nf=hp['in_node_nf'], hidden_nf=hp['hidden_nf'],
        out_node_nf=hp['out_node_nf'], n_layers=hp['n_layers'],
        task=hp.get('task', 'classification'),
        with_pocket=hp.get('with_pocket', False))
    return size_prediction_fn(predictor, params, state)


def load_model(args):
    """(cfg, params) from a native run dir, a reference .ckpt, or a bundled
    demo-weights npz (examples/params/*.npz — see difflinker_tpu/demo.py)."""
    if getattr(args, 'params', None):
        from difflinker_tpu.demo import load_demo_model
        cfg, params, _ = load_demo_model(args.params)
        return cfg, params
    if args.ckpt:
        from difflinker_tpu.io.lightning_import import load_ddpm_checkpoint
        cfg, params = load_ddpm_checkpoint(args.ckpt)
        return cfg, params
    if not args.run:
        raise SystemExit('pass one of --run / --ckpt / --params')
    cfg = ckpt_lib.load_config(args.run)
    state = ckpt_lib.CheckpointManager(args.run).restore_raw()
    if 'ema_params' in state:
        # runs trained with --ema: the EMA weights are the release weights
        common.log('using EMA params from checkpoint')
        return cfg, state['ema_params']
    return cfg, state['params']


def already_generated(out_dir, uuids, n_samples):
    """Resume check (sample.py:37-61): all expected files present.

    File naming follows the reference convention: per-uuid dirs containing
    `{i}_.xyz` sample files plus `true_/frag_/pocket_` ground truths — the
    sample index MUST be the leading underscore-token because the reformat /
    run_obabel stages key their SDF conversions on `fname.split('_')[0]`."""
    done = []
    for u in uuids:
        d = os.path.join(out_dir, str(u))
        ok = os.path.isdir(d) and all(
            os.path.exists(os.path.join(d, f'{i}_.xyz'))
            for i in range(n_samples))
        done.append(ok)
    return np.asarray(done)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    common.enable_compilation_cache()
    cfg, params = load_model(args)
    cfg = common.apply_respacing(cfg, args)
    if args.synthetic:
        ds = synthetic_dataset(args.synthetic, seed=0,
                               is_geom=cfg.data.is_geom)
    else:
        ds = LinkerDataset.from_pt(args.data, args.prefix)

    # wrap-pad ragged tail batches to --batch-size: every bucket then reuses
    # one compiled chain shape instead of compiling per tail size
    sampler = LinkerSampler(cfg, params, mesh=common.build_mesh(args),
                            pad_batch_to=args.batch_size,
                            pad_nodes_to=args.pad_nodes)
    size_spec = (load_size_spec(args.linker_size_model)
                 if args.linker_size_model
                 else parse_size_spec(args.linker_size))
    key = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out, exist_ok=True)
    is_geom = cfg.data.is_geom

    n_done = 0
    for b_idx, batch in enumerate(ds.iter_batches(args.batch_size)):
        uuids = [str(u) for u in np.asarray(batch['uuid']).tolist()]
        if already_generated(args.out, uuids, args.n_samples).all():
            common.log(f'batch {b_idx}: all {len(uuids)} uuids done, skipping')
            continue

        # ground-truth molecule + fragments, saved once per uuid
        for u in uuids:
            os.makedirs(os.path.join(args.out, u), exist_ok=True)
        atom_mask = batch['atom_mask']
        frag_mask = batch['fragment_mask']
        if 'pocket_mask' in batch:
            atom_mask = atom_mask - batch['pocket_mask']
            frag_mask = batch['fragment_only_mask']
        for i, u in enumerate(uuids):
            d = os.path.join(args.out, u)
            save_xyz_file(d, batch['one_hot'][i:i+1], batch['positions'][i:i+1],
                          atom_mask[i:i+1], names=['true'], is_geom=is_geom)
            save_xyz_file(d, batch['one_hot'][i:i+1], batch['positions'][i:i+1],
                          frag_mask[i:i+1], names=['frag'], is_geom=is_geom)
            if 'pocket_mask' in batch:
                save_xyz_file(d, batch['one_hot'][i:i+1],
                              batch['positions'][i:i+1],
                              batch['pocket_mask'][i:i+1],
                              names=['pocket'], is_geom=is_geom)

        outs = sampler.sample_n(batch, jax.random.fold_in(key, b_idx),
                                args.n_samples, size_spec=size_spec)
        for s_idx, out in enumerate(outs):
            node_mask = out['node_mask']
            if 'pocket_mask' in out:
                node_mask = node_mask - out['pocket_mask']
            for i, u in enumerate(uuids):
                # '{i}_.xyz' — the sample index leads (see already_generated)
                save_xyz_file(os.path.join(args.out, u),
                              out['one_hot'][i:i+1], out['positions'][i:i+1],
                              node_mask[i:i+1], names=[f'{s_idx}'],
                              is_geom=is_geom)
        n_done += len(uuids)
        common.log(f'batch {b_idx}: sampled {args.n_samples} linkers for '
                   f'{len(uuids)} inputs')
    common.log(f'done: {n_done} inputs -> {args.out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
