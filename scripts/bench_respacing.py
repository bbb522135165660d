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
    p.add_argument('--out', type=str, default=None)
    args = p.parse_args()

    import jax
    from difflinker_tpu.config import (CenterOfMass, DataConfig,
                                       DatasetFamily, DiffusionConfig,
                                       ExperimentConfig, GraphType,
                                       ModelConfig, PocketMode, TrainConfig)
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.io.checkpoints import load_params_npz
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze

    with open(args.params + '.config.json') as f:
        mc = json.load(f)
    pocket = mc.get('pocket', False)
    multifrag = mc.get('n_fragments') is not None  # GEOM multifrag recipe

    def make_cfg(T):
        if multifrag:
            # demo_learning_multifrag: 9-type vocab; context and CoM follow
            # the saved recipe flag (geom_difflinker vs ..._given_anchors,
            # same switch analyze_multifrag.py uses)
            anchors = bool(mc.get('given_anchors'))
            return ExperimentConfig(
                exp_name='respacing_study',
                model=ModelConfig(in_node_nf=9,
                                  context_node_nf=2 if anchors else 1,
                                  hidden_nf=mc['hidden'],
                                  n_layers=mc['layers'], norm_constant=1e-6),
                diffusion=DiffusionConfig(timesteps=T),
                data=DataConfig(family=DatasetFamily.GEOM),
                train=TrainConfig(n_stability_samples=1,
                                  anchors_context=anchors,
                                  center_of_mass=(CenterOfMass.ANCHORS
                                                  if anchors else
                                                  CenterOfMass.FRAGMENTS)))
        return ExperimentConfig(
            exp_name='respacing_study',
            model=ModelConfig(
                in_node_nf=8, context_node_nf=3 if pocket else 2,
                hidden_nf=mc['hidden'], n_layers=mc['layers'],
                norm_constant=1e-6,
                graph_type=GraphType.A4 if pocket else GraphType.FC),
            diffusion=DiffusionConfig(timesteps=T),
            data=DataConfig(family=DatasetFamily.MOAD,
                            pocket_mode=PocketMode.FULL)
            if pocket else DataConfig(),
            train=TrainConfig(
                n_stability_samples=1,
                center_of_mass=CenterOfMass(mc.get('com', 'fragments'))))

    cfg0 = make_cfg(mc['timesteps'])
    params_like = make_edm(cfg0.model, cfg0.diffusion).init_params(
        jax.random.PRNGKey(0))
    params = load_params_npz(args.params, params_like)
    if multifrag:
        from difflinker_tpu.data.synthetic_molecules import \
            synthetic_multifrag_dataset
        val_ds = synthetic_multifrag_dataset(
            args.val_size, seed=1, n_fragments=tuple(mc['n_fragments']))
    else:
        val_ds = synthetic_molecule_dataset(
            args.val_size, seed=1,
            **({'pocket_range': (8, 16)} if pocket else {}))

    from difflinker_tpu.cli.common import respace_config

    modes = (['subsequence', 'rebuild'] if args.mode == 'both'
             else [args.mode])
    rows = []
    for T in [int(s) for s in args.steps.split(',')]:
      for mode in (modes if T != mc['timesteps'] else modes[:1]):
        cfg = respace_config(make_cfg(mc['timesteps']), T, mode)
        sampler = LinkerSampler(cfg, params, pad_batch_to=64)
        # warm-up to exclude compile time from the throughput number
        batches = list(val_ds.iter_batches(64))
        sampler.sample(batches[0], jax.random.PRNGKey(99))
        t0 = time.time()
        m = sample_and_analyze(sampler, batches, jax.random.PRNGKey(7),
                               n_samples=args.n_samples)
        dt = time.time() - t0
        n_linkers = args.val_size * args.n_samples
        row = {'T': T, 'mode': mode,
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
