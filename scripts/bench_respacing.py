#!/usr/bin/env python
"""Respaced-sampling study: quality vs diffusion steps T at sample time.

The reference always samples with the full training T (500 forwards per
linker, src/edm.py:146-163). Our schedules are functions of t/T and the
denoiser is conditioned on t/T, so a model trained at T_train can be sampled
on any coarser grid (DDPM ancestral subsequence respacing) by just rebuilding
the gamma table at a smaller T — `DiffusionConfig.timesteps` / the CLIs'
`--steps`. Sampling cost is exactly O(T), so T=100 is a 5x throughput
multiplier IF quality holds. This script measures that trade on a model
trained by scripts/demo_learning.py:

    python scripts/demo_learning.py --epochs 1500 --cosine --hidden 128 \
        --layers 6 --train-size 4000 --timesteps 500 --save-params /tmp/m.npz
    python scripts/bench_respacing.py --params /tmp/m.npz \
        --steps 500,250,100,50,25,10 --out docs/respacing_results.json

Results are recorded in BASELINE.md.
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
    p.add_argument('--params', required=True, help='.npz from demo_learning --save-params')
    p.add_argument('--steps', type=str, default='500,250,100,50,25,10')
    p.add_argument('--mode', type=str, default='both',
                   choices=['subsequence', 'rebuild', 'both'],
                   help='subsequence: gamma read off the trained grid '
                        "(exact, the reference's n_steps semantics); "
                        'rebuild: regenerate the schedule at T (legacy); '
                        'both: measure the two side by side')
    p.add_argument('--val-size', type=int, default=256)
    p.add_argument('--n-samples', type=int, default=1)
    p.add_argument('--sampler', type=str, default='ancestral',
                   choices=['ancestral', 'ddim', 'both'],
                   help="reverse integrator(s) to measure: 'ddim' (eta=0, "
                        'deterministic) typically holds quality at far '
                        'fewer steps than the ancestral sampler')
    p.add_argument('--noise-scale', type=float, default=1.0,
                   help='low-temperature sampling knob (ancestral only; '
                        '<1 scales the per-step noise injection)')
    p.add_argument('--out', type=str, default=None)
    args = p.parse_args()

    import jax
    from difflinker_tpu.demo import load_demo_model, recipe_val_dataset
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze

    # one canonical meta -> recipe mapping (difflinker_tpu/demo.py), shared
    # with analyze_multifrag and demo_pretrained
    _, params, mc = load_demo_model(args.params,
                                    exp_name='respacing_study')
    val_ds = recipe_val_dataset(mc, args.val_size, seed=1)

    from difflinker_tpu.cli.common import respace_config
    from difflinker_tpu.demo import recipe_config

    def make_cfg(T):
        return recipe_config(mc, timesteps=T, exp_name='respacing_study')

    modes = (['subsequence', 'rebuild'] if args.mode == 'both'
             else [args.mode])
    samplers = (['ancestral', 'ddim'] if args.sampler == 'both'
                else [args.sampler])
    rows = []
    for T in [int(s) for s in args.steps.split(',')]:
      for mode in (modes if T != mc['timesteps'] else modes[:1]):
       for integrator in samplers:
        cfg = respace_config(make_cfg(mc['timesteps']), T, mode)
        if integrator != 'ancestral':
            cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
                cfg.diffusion, sampler=integrator))
        elif args.noise_scale != 1.0:
            cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
                cfg.diffusion, noise_scale=args.noise_scale))
        sampler = LinkerSampler(cfg, params, pad_batch_to=64)
        # warm-up to exclude compile time from the throughput number
        batches = list(val_ds.iter_batches(64))
        sampler.sample(batches[0], jax.random.PRNGKey(99))
        t0 = time.time()
        m = sample_and_analyze(sampler, batches, jax.random.PRNGKey(7),
                               n_samples=args.n_samples)
        dt = time.time() - t0
        n_linkers = args.val_size * args.n_samples
        row = {'T': T, 'mode': mode, 'sampler': integrator,
               **({'noise_scale': args.noise_scale}
                  if args.noise_scale != 1.0 else {}),
               'validity': round(m['validity'], 4),
               'validity_and_connectivity':
                   round(m['validity_and_connectivity'], 4),
               'uniqueness': round(m['uniqueness'], 4),
               'wall_s': round(dt, 2),
               'linkers_per_s': round(n_linkers / dt, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(rows, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
