#!/usr/bin/env python
"""Fine-tune the bundled pocket model at the published case-study scale.

The bundled pocket demo weights (examples/params/pocket_geom_h256.npz) were
trained on complexes with 8-16-atom linker-shell pockets; the reference's
published case studies (case_studies/*/README.md) carry 129-187-atom
6Å-contact pockets around 23-29-atom fragment pairs — far out of that
training distribution. This script warm-starts from the bundled weights and
fine-tunes on synthetic complexes matched to the case regime
(pocket_style='residues': bonded residue-like clusters surrounding the whole
ligand; frag 8-16 atoms each, linkers 5-10, pockets 100-190), then saves
examples/params/pocket_case_h256.npz for scripts/demo_case_studies.py.

    nohup python scripts/train_case_scale_pocket.py \
        --out docs/train_case_scale.json > /tmp/case_train.log 2>&1 &
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--init', default='examples/params/pocket_geom_h256.npz')
    p.add_argument('--train-size', type=int, default=1024)
    p.add_argument('--val-size', type=int, default=128)
    p.add_argument('--epochs', type=int, default=200)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--hidden', type=int, default=256)
    p.add_argument('--layers', type=int, default=6)
    p.add_argument('--timesteps', type=int, default=500)
    p.add_argument('--lr', type=float, default=1e-4)
    p.add_argument('--eval-steps', type=int, default=100,
                   help='respaced eval chain (pocket quality flat to T=100)')
    p.add_argument('--n-eval-samples', type=int, default=128)
    p.add_argument('--save', default='examples/params/pocket_case_h256.npz')
    p.add_argument('--out', default='docs/train_case_scale.json')
    args = p.parse_args()

    import jax
    import numpy as np

    from difflinker_tpu import constants
    from difflinker_tpu.cli.common import enable_compilation_cache
    from difflinker_tpu.config import (CenterOfMass, DataConfig, DatasetFamily,
                                       DiffusionConfig, ExperimentConfig,
                                       GraphType, ModelConfig, PocketMode,
                                       TrainConfig)
    from difflinker_tpu.data.packed import PackedDataset
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.io.checkpoints import load_params_npz, save_params_npz
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze
    from difflinker_tpu.train.trainer import Trainer

    enable_compilation_cache()
    t0 = time.time()
    NF = constants.GEOM_NUMBER_OF_ATOM_TYPES

    gen_kw = dict(frag_range=(8, 16), linker_range=(5, 10),
                  pocket_range=(100, 190), pocket_style='residues',
                  n_types=NF)
    print(f'generating {args.train_size}+{args.val_size} case-scale '
          f'complexes {gen_kw}...', flush=True)
    train_raw = synthetic_molecule_dataset(args.train_size, seed=0, **gen_kw)
    val_ds = synthetic_molecule_dataset(args.val_size, seed=1, **gen_kw)
    sizes = [s['num_atoms'] for s in train_raw.samples]
    print(f'total atoms: min={min(sizes)} max={max(sizes)}', flush=True)

    cfg = ExperimentConfig(
        exp_name='case_scale_pocket',
        model=ModelConfig(in_node_nf=NF, context_node_nf=3,
                          hidden_nf=args.hidden, n_layers=args.layers,
                          norm_constant=1e-6, graph_type=GraphType.A4),
        diffusion=DiffusionConfig(timesteps=args.timesteps),
        data=DataConfig(family=DatasetFamily.MOAD,
                        pocket_mode=PocketMode.FULL),
        train=TrainConfig(lr=args.lr, batch_size=args.batch_size,
                          n_stability_samples=1,
                          center_of_mass=CenterOfMass.ANCHORS))
    train_ds = PackedDataset(train_raw.samples)
    steps = max(train_ds.num_steps(args.batch_size), 1)
    trainer = Trainer(cfg, lr_schedule='cosine',
                      decay_steps=args.epochs * steps,
                      warmup_steps=2 * steps)
    state = trainer.init_state(jax.random.PRNGKey(0))
    if args.init and os.path.exists(args.init):
        print(f'warm start from {args.init}', flush=True)
        loaded = load_params_npz(args.init, state['params'])
        state['params'] = loaded
        if 'ema_params' in state:
            state['ema_params'] = jax.tree.map(lambda x: x, loaded)

    key = jax.random.PRNGKey(1)
    print(f'fine-tuning ({args.epochs} epochs x {steps} steps, '
          f'{args.layers}x{args.hidden}, T={args.timesteps}, '
          f'lr={args.lr})...', flush=True)
    losses = []
    for epoch in range(args.epochs):
        key, k = jax.random.split(key)
        state, m = trainer.fit_epoch_scanned(state, train_ds,
                                             args.batch_size, k, seed=epoch)
        losses.append(round(float(m['loss']), 4))
        if (epoch + 1) % 20 == 0 or epoch == 0:
            print(f'epoch {epoch + 1}: loss={m["loss"]:.4f} '
                  f'({time.time() - t0:.0f}s)', flush=True)

    params = state.get('ema_params', state['params'])

    save_params_npz(params, args.save, dtype=np.float16)
    with open(args.save + '.config.json', 'w') as f:
        json.dump({'hidden': args.hidden, 'layers': args.layers,
                   'timesteps': args.timesteps, 'pocket': True,
                   'com': 'anchors', 'in_node_nf': NF}, f)
    print(f'saved {args.save}', flush=True)

    # in-distribution eval at the case scale (respaced chain)
    eval_cfg = cfg
    if args.eval_steps and args.eval_steps < args.timesteps:
        from difflinker_tpu.cli.common import apply_respacing
        eval_cfg = apply_respacing(
            cfg, argparse.Namespace(steps=args.eval_steps,
                                    respace_mode='subsequence',
                                    resample_steps=1, noise_scale=1.0))
    sampler = LinkerSampler(eval_cfg, params, pad_batch_to=args.batch_size)
    m = sample_and_analyze(sampler, val_ds.iter_batches(args.batch_size),
                           jax.random.PRNGKey(7),
                           n_samples=args.n_eval_samples,
                           is_geom=True, size_spec='ground_truth')
    report = {k: round(float(v), 4) for k, v in m.items()
              if isinstance(v, (int, float))}
    print('in-distribution eval:', json.dumps(report), flush=True)

    results = {'init': args.init, 'save': args.save, 'gen': repr(gen_kw),
               'epochs': args.epochs, 'train_size': args.train_size,
               'lr': args.lr, 'loss_first': losses[0], 'loss_last': losses[-1],
               'eval': report, 'eval_steps': args.eval_steps,
               'elapsed_s': round(time.time() - t0, 1)}
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == '__main__':
    sys.exit(main())
