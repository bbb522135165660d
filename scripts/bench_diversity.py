#!/usr/bin/env python
"""Per-input diversity vs sampling temperature, measured.

The low-temperature study (BASELINE.md "Low-temperature sampling") carries a
stated caveat: its evals draw ONE sample per input, so the global uniqueness
column cannot see per-input diversity loss — yet the generate CLIs' user
journey is K samples per fragment pair (reference sample.py / generate.py
n_samples semantics, README.md:205-207: 250 linkers per test input), where
temperature is expected to trade diversity for validity. This script measures
that trade directly: K chain draws per input at each noise_scale, identity by
canonical graph key (chem/metrics.canonical_key), and reports

  - vc_rate            fraction of the K*N draws that are valid+connected
  - distinct_per_input mean |distinct keys| over inputs with >=1 V+C draw
                       (diversity conditional on success)
  - distinct_frac_vc   pooled distinct / pooled V+C (diversity among successes)
  - distinct_vc_per_k  mean distinct V+C linkers per K draws over ALL inputs —
                       the user-facing product of quality x diversity ("how
                       many different usable linkers do K draws buy me")

    python scripts/bench_diversity.py --params examples/params/zinc_h512.npz \
        --steps 50 --noise 1.0,0.7,0.5 --k 8 --out docs/diversity_temperature.json
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--params', default='examples/params/zinc_h512.npz')
    p.add_argument('--steps', type=int, default=50)
    p.add_argument('--noise', type=str, default='1.0,0.7,0.5')
    p.add_argument('--k', type=int, default=8, help='samples per input')
    p.add_argument('--inputs', type=int, default=64)
    p.add_argument('--out', type=str, default=None)
    args = p.parse_args()

    import jax
    from difflinker_tpu.chem.metrics import (canonical_key, is_connected,
                                             is_valid)
    from difflinker_tpu.chem.molgraph import build_molecules
    from difflinker_tpu.cli.common import respace_config
    from difflinker_tpu.demo import (load_demo_model, recipe_config,
                                     recipe_val_dataset)
    from difflinker_tpu.sample.sampler import LinkerSampler

    _, params, mc = load_demo_model(args.params, exp_name='diversity_study')
    val_ds = recipe_val_dataset(mc, args.inputs, seed=1)
    batches = list(val_ds.iter_batches(min(args.inputs, 64)))

    rows = []
    for noise in [float(s) for s in args.noise.split(',')]:
        cfg = respace_config(
            recipe_config(mc, timesteps=mc['timesteps'],
                          exp_name='diversity_study'),
            args.steps, 'subsequence')
        cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
            cfg.diffusion, noise_scale=noise))
        # one (B, N) chain program per noise setting: wrap-pad ragged
        # batches and pad every bucket to a common node count
        pad_n = max(int(b['atom_mask'].shape[1]) for b in batches)
        sampler = LinkerSampler(cfg, params, pad_batch_to=64,
                                pad_nodes_to=pad_n)

        # keys[i] = canonical graph keys of input i's valid+connected draws
        keys, n_vc, n_total = {}, 0, 0
        t0 = time.time()
        for b_idx, batch in enumerate(batches):
            # bucketed loader: every row in a yielded batch is a real input
            # (the sampler's pad_batch_to wrap-padding is appended after
            # these rows, so pred[:n_real] strips it)
            n_real = int(batch['atom_mask'].shape[0])
            for s_idx in range(args.k):
                out = sampler.sample(
                    batch,
                    jax.random.fold_in(jax.random.PRNGKey(7),
                                       b_idx * 1000 + s_idx))
                ok = ~out['nan_flag']
                pred = build_molecules(out['one_hot'], out['positions'],
                                       out['node_mask'], is_geom=False)
                for i, mol in enumerate(pred[:n_real]):
                    n_total += 1
                    if ok[i] and is_valid(mol) and is_connected(mol):
                        n_vc += 1
                        keys.setdefault(b_idx * 64 + i, set()).add(
                            canonical_key(mol))
        dt = time.time() - t0

        n_inputs = sum(int(b['atom_mask'].shape[0]) for b in batches)
        distinct = [len(v) for v in keys.values()]
        pooled_distinct = sum(distinct)
        row = {
            'noise_scale': noise, 'T': args.steps, 'k': args.k,
            'inputs': n_inputs,
            'vc_rate': round(n_vc / n_total, 4),
            'distinct_per_input':
                round(float(np.mean(distinct)), 3) if distinct else 0.0,
            'distinct_frac_vc': round(pooled_distinct / max(n_vc, 1), 4),
            'distinct_vc_per_k': round(pooled_distinct / n_inputs, 3),
            'inputs_with_any_vc': len(keys),
            'global_unique': len(set().union(*keys.values())) if keys else 0,
            'wall_s': round(dt, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(rows, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
