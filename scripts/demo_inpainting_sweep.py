#!/usr/bin/env python
"""Inpainting operating-point study (VERDICT r2 weak #5): sweep
width / epochs / sampling-T / RePaint-resampling on the replace-inpainting
formulation and publish where whole-molecule valid+connected actually
saturates (round 2 recorded a single point: 89.1% validity / 39.1% V+C).

Each configured run trains an InpaintingEDM on the synthetic set, then the
trained model is scored across sampling variants (respaced T, resample_steps)
— inference-time knobs reuse one trained model, so the expensive axis
(training) stays short.

    python scripts/demo_inpainting_sweep.py --out docs/demo_inpainting_results.json
"""
import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def build(args, hidden, layers, timesteps):
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)
    return ExperimentConfig(
        exp_name='inpainting_sweep',
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=hidden,
                          n_layers=layers, norm_constant=1e-6,
                          centering=True),
        diffusion=DiffusionConfig(timesteps=timesteps, inpainting=True),
        data=DataConfig(),
        train=TrainConfig(lr=4e-4, batch_size=args.batch_size,
                          n_stability_samples=1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--train-size', type=int, default=3000)
    p.add_argument('--val-size', type=int, default=128)
    p.add_argument('--batch-size', type=int, default=128)
    p.add_argument('--layers', type=int, default=6)
    p.add_argument('--out', type=str, default=None)
    p.add_argument('--configs', type=str,
                   default='128:800:500,256:1500:500',
                   help='comma list of hidden:epochs:T training runs')
    p.add_argument('--resample', type=str, default='1,3,5',
                   help='resample_steps variants scored per trained model')
    p.add_argument('--steps', type=str, default='500,100',
                   help='sampling-T variants (subsequence respacing)')
    p.add_argument('--noise', type=str, default='1.0',
                   help='noise_scale variants (low-temperature sampling) '
                        'scored per trained model')
    p.add_argument('--save-params', type=str, default=None,
                   help='save the LAST config\'s trained params as .npz '
                        '(+ .config.json recipe sidecar)')
    args = p.parse_args()

    import jax
    from difflinker_tpu.cli.common import respace_config
    from difflinker_tpu.data.packed import PackedDataset
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze
    from difflinker_tpu.train.trainer import Trainer

    t0 = time.time()
    print(f'generating {args.train_size}+{args.val_size} molecules...',
          flush=True)
    train_ds = PackedDataset(
        synthetic_molecule_dataset(args.train_size, seed=0).samples)
    val_ds = synthetic_molecule_dataset(args.val_size, seed=1)

    results = {'runs': []}
    for spec in args.configs.split(','):
        hidden, epochs, T = (int(v) for v in spec.split(':'))
        cfg = build(args, hidden, args.layers, T)
        steps = max(train_ds.num_steps(args.batch_size), 1)
        trainer = Trainer(cfg, lr_schedule='cosine',
                          decay_steps=epochs * steps, warmup_steps=5 * steps)
        state = trainer.init_state(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        print(f'== training H={hidden} T={T} for {epochs} epochs ==',
              flush=True)
        for epoch in range(epochs):
            key, k = jax.random.split(key)
            state, m = trainer.fit_epoch_scanned(
                state, train_ds, args.batch_size, k, seed=epoch)
            if (epoch + 1) % 200 == 0:
                print(f'  epoch {epoch + 1}: loss={m["loss"]:.4f} '
                      f'({time.time() - t0:.0f}s)', flush=True)

        for sample_T in (int(v) for v in args.steps.split(',')):
            if sample_T > T:
                print(f'skipping sample_T={sample_T} > trained T={T} '
                      '(pure no-op steps)', flush=True)
                continue
            for r in (int(v) for v in args.resample.split(',')):
                for ns in (float(v) for v in args.noise.split(',')):
                    scfg = respace_config(cfg, sample_T, 'subsequence')
                    scfg = dataclasses.replace(
                        scfg, diffusion=dataclasses.replace(
                            scfg.diffusion, resample_steps=r,
                            noise_scale=ns))
                    sampler = LinkerSampler(
                        scfg, state['params'],
                        make_edm(scfg.model, scfg.diffusion),
                        pad_batch_to=args.batch_size)
                    m = sample_and_analyze(
                        sampler, val_ds.iter_batches(args.batch_size),
                        jax.random.PRNGKey(7), n_samples=1)
                    row = {'hidden': hidden, 'train_T': T, 'epochs': epochs,
                           'sample_T': sample_T, 'resample_steps': r,
                           'noise_scale': ns,
                           'validity': round(m['validity'], 4),
                           'validity_and_connectivity': round(
                               m['validity_and_connectivity'], 4),
                           'uniqueness': round(m['uniqueness'], 4),
                           'elapsed_s': round(time.time() - t0, 1)}
                    results['runs'].append(row)
                    print(json.dumps(row), flush=True)
                    if args.out:
                        with open(args.out, 'w') as f:
                            json.dump(results, f, indent=2)

        if args.save_params:
            from difflinker_tpu.io.checkpoints import save_params_npz
            save_params_npz(state['params'], args.save_params)
            with open(args.save_params + '.config.json', 'w') as f:
                json.dump({'hidden': hidden, 'layers': args.layers,
                           'timesteps': T, 'inpainting': True}, f)
            print(f'saved params to {args.save_params}', flush=True)

    if results['runs']:
        best = max(results['runs'],
                   key=lambda r: r['validity_and_connectivity'])
        results['best'] = best
        print('best:', json.dumps(best))
    else:
        print('no scoring rows (every sample_T exceeded its trained T)')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    return 0 if results['runs'] else 1


if __name__ == '__main__':
    sys.exit(main())
