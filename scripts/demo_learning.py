#!/usr/bin/env python
"""End-to-end learning demo: train the diffusion model on geometrically valid
synthetic molecules and watch sampling validity/connectivity climb.

The released ZINC/GEOM/MOAD artifacts aren't vendored, so this is the
framework's self-contained proof that the full loop — bucketed data → jitted
DP train step → lax.scan sampling → geometric bond perception → metrics —
learns real structure (an untrained model samples ~0% valid linkers).

    python scripts/demo_learning.py [--epochs 300] [--eval-every 25]
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=300)
    p.add_argument('--eval-every', type=int, default=25)
    p.add_argument('--train-size', type=int, default=2000)
    p.add_argument('--val-size', type=int, default=64)
    p.add_argument('--batch-size', type=int, default=128)
    p.add_argument('--out', type=str, default=None, help='json results path')
    p.add_argument('--hidden', type=int, default=96)
    p.add_argument('--layers', type=int, default=5)
    p.add_argument('--lr', type=float, default=4e-4)
    p.add_argument('--cosine', action='store_true',
                   help='cosine lr decay over the run')
    p.add_argument('--timesteps', type=int, default=100,
                   help='diffusion T (reference flagship trains at 500)')
    p.add_argument('--save-params', type=str, default=None,
                   help='save final params as .npz (io.checkpoints.save_params_npz)')
    p.add_argument('--config', type=str, default=None,
                   help='configs/*.yml whose model/diffusion shape drives the '
                        'demo (e.g. configs/zinc_difflinker_wide.yml — the '
                        'TPU-recommended wide recipe); data stays synthetic')
    p.add_argument('--seed', type=int, default=0,
                   help='init/training RNG seed (data seeds stay fixed, so '
                        'different seeds train on the identical task — for '
                        'seed-robustness measurements)')
    args = p.parse_args()

    import jax
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig, load_config)

    if args.config:
        loaded = load_config(args.config)
        args.hidden = loaded.model.hidden_nf
        args.layers = loaded.model.n_layers
        args.timesteps = loaded.diffusion.timesteps
        print(f'config {args.config}: {args.layers}x{args.hidden} '
              f'T={args.timesteps}', flush=True)
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze
    from difflinker_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        exp_name='synthetic_learning_demo',
        model=ModelConfig(in_node_nf=8, context_node_nf=2,
                          hidden_nf=args.hidden, n_layers=args.layers,
                          norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=args.timesteps),
        data=DataConfig(),
        train=TrainConfig(lr=args.lr, batch_size=args.batch_size,
                          n_stability_samples=1))

    print(f'generating {args.train_size}+{args.val_size} synthetic molecules...',
          flush=True)
    from difflinker_tpu.data.packed import PackedDataset
    train_raw = synthetic_molecule_dataset(args.train_size, seed=0)
    train_ds = PackedDataset(train_raw.samples)  # O(1) per-epoch batching
    val_ds = synthetic_molecule_dataset(args.val_size, seed=1)

    steps_per_epoch = max(train_ds.num_steps(args.batch_size), 1)
    trainer = Trainer(cfg,
                      lr_schedule='cosine' if args.cosine else 'constant',
                      decay_steps=args.epochs * steps_per_epoch,
                      warmup_steps=5 * steps_per_epoch if args.cosine else 0)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    key = jax.random.PRNGKey(args.seed + 1)
    results = []
    t_start = time.time()

    eval_sampler = LinkerSampler(cfg, state['params'], trainer.edm)

    def evaluate(epoch, state):
        # one sampler for the run: compiled chains persist, weights swap
        sampler = eval_sampler.update_params(state['params'])
        m = sample_and_analyze(
            sampler, val_ds.iter_batches(args.batch_size), jax.random.PRNGKey(7),
            n_samples=1)
        row = {'epoch': epoch, 'elapsed_s': round(time.time() - t_start, 1),
               'validity': round(m['validity'], 4),
               'validity_and_connectivity': round(m['validity_and_connectivity'], 4),
               'uniqueness': round(m['uniqueness'], 4)}
        results.append(row)
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(results, f, indent=2)
        print(json.dumps(row), flush=True)
        return m

    evaluate(0, state)
    for epoch in range(args.epochs):
        key, ktrain = jax.random.split(key)
        state, metrics = trainer.fit_epoch_scanned(
            state, train_ds, args.batch_size, ktrain, shuffle=True, seed=epoch)
        if (epoch + 1) % args.eval_every == 0:
            print(f'epoch {epoch + 1}: loss={metrics["loss"]:.4f}', flush=True)
            evaluate(epoch + 1, state)

    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    if args.save_params:
        from difflinker_tpu.io.checkpoints import save_params_npz
        save_params_npz(state['params'], args.save_params)
        with open(args.save_params + '.config.json', 'w') as f:
            json.dump({'hidden': args.hidden, 'layers': args.layers,
                       'timesteps': args.timesteps}, f)
        print(f'saved params to {args.save_params}', flush=True)
    first, last = results[0], results[-1]
    print(f'validity {first["validity"]:.2%} -> {last["validity"]:.2%}; '
          f'valid+connected {first["validity_and_connectivity"]:.2%} -> '
          f'{last["validity_and_connectivity"]:.2%}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
