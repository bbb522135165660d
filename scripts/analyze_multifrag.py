#!/usr/bin/env python
"""Per-fragment-count breakdown of the multifrag model: validity and
valid+connected grouped by k (number of fragments), plus the implied
per-junction success rate — V+C for a k-fragment molecule requires all k-1
linker segments to connect, so p_junction ≈ V+C^(1/(k-1)) — and success@n
(the reference's practical protocol draws many linkers per input,
README.md:205-215; success@n = fraction of inputs with ≥1 V+C sample among
the n draws).

    python scripts/analyze_multifrag.py --params /tmp/multifrag_params.npz \
        --out docs/demo_geom_multifrag_by_k.json
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--params', required=True)
    p.add_argument('--val-size', type=int, default=256)
    p.add_argument('--n-samples', type=int, default=2)
    p.add_argument('--steps', type=int, default=None,
                   help='respace the chain (subsequence mode)')
    p.add_argument('--resample-steps', type=int, default=1,
                   help='RePaint repeats per reverse step (masked-path '
                        'harmonisation)')
    p.add_argument('--noise-scale', type=float, default=1.0,
                   help='low-temperature sampling (<1 cools the posterior '
                        'draw of every reverse transition)')
    p.add_argument('--out', default=None)
    args = p.parse_args(argv)

    import dataclasses
    import jax
    from difflinker_tpu.chem import metrics
    from difflinker_tpu.chem.molgraph import build_molecules
    from difflinker_tpu.cli.common import respace_config
    from difflinker_tpu.demo import load_demo_model, recipe_val_dataset
    from difflinker_tpu.sample.sampler import LinkerSampler

    cfg, params, mc = load_demo_model(args.params)
    if args.steps:
        cfg = respace_config(cfg, args.steps, 'subsequence')
    if args.resample_steps > 1:
        cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
            cfg.diffusion, resample_steps=args.resample_steps))
    if args.noise_scale != 1.0:
        cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
            cfg.diffusion, noise_scale=args.noise_scale))

    val_ds = recipe_val_dataset(mc, args.val_size, seed=1)
    sampler = LinkerSampler(cfg, params, pad_batch_to=64)

    by_k = {}
    inputs = {}   # (b_idx, row) -> {'k': k, 'any_vc': bool}
    for b_idx, batch in enumerate(val_ds.iter_batches(64)):
        names = list(batch['name'])
        true_mols = build_molecules(batch['one_hot'], batch['positions'],
                                    batch['atom_mask'])
        for s_idx in range(args.n_samples):
            # nested fold_in: collision-free for any (batch, draw) count
            out = sampler.sample(
                batch, jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(7), b_idx), s_idx))
            preds = build_molecules(out['one_hot'], out['positions'],
                                    out['node_mask'])
            for i, pred in enumerate(preds):
                if out['nan_flag'][i] or not metrics.is_valid(true_mols[i]):
                    continue
                k = int(names[i].split('_')[0].replace('synthmf', ''))
                d = by_k.setdefault(k, {'n': 0, 'valid': 0, 'vc': 0})
                d['n'] += 1
                v = metrics.is_valid(pred)
                vc = v and metrics.is_connected(pred)
                d['valid'] += int(v)
                d['vc'] += int(vc)
                rec = inputs.setdefault((b_idx, i), {'k': k, 'any_vc': False})
                rec['any_vc'] = rec['any_vc'] or bool(vc)

    report = {'sample_T': args.steps or mc['timesteps'],
              'trained_T': mc['timesteps'],
              'resample_steps': args.resample_steps,
              'noise_scale': args.noise_scale, 'by_k': {}}
    succ_by_k = {}
    for rec in inputs.values():
        s = succ_by_k.setdefault(rec['k'], {'n': 0, 'hit': 0})
        s['n'] += 1
        s['hit'] += int(rec['any_vc'])
    tot_n = tot_v = tot_vc = 0
    for k in sorted(by_k):
        d = by_k[k]
        vc_rate = d['vc'] / d['n']
        report['by_k'][str(k)] = {
            'n': d['n'],
            'validity': round(d['valid'] / d['n'], 4),
            'valid_and_connected': round(vc_rate, 4),
            'per_junction_success': round(vc_rate ** (1 / (k - 1)), 4)
            if vc_rate > 0 else 0.0,
            f'success_at_{args.n_samples}': round(
                succ_by_k[k]['hit'] / succ_by_k[k]['n'], 4),
        }
        tot_n += d['n']
        tot_v += d['valid']
        tot_vc += d['vc']
    report['overall'] = {'n': tot_n,
                         'validity': round(tot_v / tot_n, 4),
                         'valid_and_connected': round(tot_vc / tot_n, 4),
                         f'success_at_{args.n_samples}': round(
                             sum(s['hit'] for s in succ_by_k.values())
                             / max(sum(s['n'] for s in succ_by_k.values()), 1),
                             4)}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
