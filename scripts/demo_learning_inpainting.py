#!/usr/bin/env python
"""InpaintingEDM learning demo: the replace-inpainting variant (full-molecule
generation, src/edm.py:466-730 — used by the reference's unconditioned
pockets config) trains end-to-end on synthetic molecules.

Unlike the masked EDM, inpainting noises ALL nodes and re-injects q-sampled
fragments at every reverse step, so the sampler keeps the input layout
(no template re-batching) and quality shows up as the same
validity/connectivity metrics over the inpainted outputs.

    python scripts/demo_learning_inpainting.py [--epochs 600]
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=600)
    p.add_argument('--eval-every', type=int, default=100)
    p.add_argument('--train-size', type=int, default=3000)
    p.add_argument('--val-size', type=int, default=64)
    p.add_argument('--batch-size', type=int, default=128)
    p.add_argument('--hidden', type=int, default=128)
    p.add_argument('--layers', type=int, default=6)
    p.add_argument('--lr', type=float, default=4e-4)
    p.add_argument('--timesteps', type=int, default=100)
    p.add_argument('--out', type=str, default=None)
    p.add_argument('--save-params', type=str, default=None,
                   help='save final params as .npz (+ .config.json recipe '
                        'meta for difflinker_tpu/demo.py)')
    args = p.parse_args()

    import jax
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)
    from difflinker_tpu.data.packed import PackedDataset
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze
    from difflinker_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        exp_name='inpainting_demo',
        model=ModelConfig(in_node_nf=8, context_node_nf=2,
                          hidden_nf=args.hidden, n_layers=args.layers,
                          norm_constant=1e-6, centering=True),
        diffusion=DiffusionConfig(timesteps=args.timesteps, inpainting=True),
        data=DataConfig(),
        train=TrainConfig(lr=args.lr, batch_size=args.batch_size,
                          n_stability_samples=1))

    print(f'generating {args.train_size}+{args.val_size} molecules...',
          flush=True)
    train_ds = PackedDataset(
        synthetic_molecule_dataset(args.train_size, seed=0).samples)
    val_ds = synthetic_molecule_dataset(args.val_size, seed=1)

    steps = max(train_ds.num_steps(args.batch_size), 1)
    trainer = Trainer(cfg, lr_schedule='cosine',
                      decay_steps=args.epochs * steps, warmup_steps=5 * steps)
    state = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    results = []
    t0 = time.time()

    eval_sampler = LinkerSampler(cfg, state['params'], trainer.edm)

    def evaluate(epoch, state):
        sampler = eval_sampler.update_params(state['params'])
        m = sample_and_analyze(sampler,
                               val_ds.iter_batches(args.batch_size),
                               jax.random.PRNGKey(7), n_samples=1)
        row = {'epoch': epoch, 'elapsed_s': round(time.time() - t0, 1),
               'validity': round(m['validity'], 4),
               'validity_and_connectivity':
                   round(m['validity_and_connectivity'], 4)}
        results.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(results, f, indent=2)

    evaluate(0, state)
    for epoch in range(args.epochs):
        key, k = jax.random.split(key)
        state, m = trainer.fit_epoch_scanned(state, train_ds, args.batch_size,
                                             k, seed=epoch)
        if (epoch + 1) % args.eval_every == 0:
            print(f'epoch {epoch + 1}: loss={m["loss"]:.4f}', flush=True)
            evaluate(epoch + 1, state)
    if args.save_params:
        from difflinker_tpu.io.checkpoints import save_params_npz
        save_params_npz(state['params'], args.save_params)
        with open(args.save_params + '.config.json', 'w') as f:
            json.dump({'hidden': args.hidden, 'layers': args.layers,
                       'timesteps': args.timesteps, 'inpainting': True}, f)
        print(f'saved params to {args.save_params}', flush=True)
    first, last = results[0], results[-1]
    print(f'inpainting model: validity {first["validity"]:.2%} -> '
          f'{last["validity"]:.2%}; v+c '
          f'{first["validity_and_connectivity"]:.2%} -> '
          f'{last["validity_and_connectivity"]:.2%}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
