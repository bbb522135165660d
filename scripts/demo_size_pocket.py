#!/usr/bin/env python
"""Pocket-conditioned learned-size journey (VERDICT r3 item 7).

Mirrors the round-3 no-pocket study (scripts/demo_size_conditioned.py) on
synthetic ligand+pocket complexes:

  1. train a SizePredictor(with_pocket=True) through the without-pocket-edges
     collate — the reference's `with_pocket` path where the size model sees
     ONLY the ligand fragments while the batch carries the pocket
     (src/linker_size_lightning.py:83-97, collate at src/datasets.py:425-469);
  2. train a pocket-conditioned diffusion model (4A distance graphs,
     3-channel context, CoM=anchors — the configs/pockets_difflinker_full
     recipe) on the same coupled complexes;
  3. size-conditioned sampling sweep: ground_truth (oracle) vs predictor vs
     prior, scored by validity / valid+connected;
  4. the user journey end-to-end: export the predictor as a reference-format
     Lightning .ckpt, write one complex's fragments (.xyz) + pocket (.pdb) to
     disk, and drive `cli.generate_with_pocket --size-model` on the files.

    python scripts/demo_size_pocket.py --epochs 1500 \
        --out docs/demo_size_pocket.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_pocket_pdb(path, positions, one_hot, idx2atom):
    """Minimal PDB (ATOM records only) for chem.pdb.read_pocket_pdb."""
    with open(path, 'w') as f:
        for i, (pos, oh) in enumerate(zip(positions, one_hot)):
            el = idx2atom[int(oh.argmax())]
            f.write(f'ATOM  {i + 1:5d} {el:>3s}  POC A{1 + i // 100:4d}    '
                    f'{pos[0]:8.3f}{pos[1]:8.3f}{pos[2]:8.3f}'
                    f'  1.00  0.00          {el:>2s}\n')
        f.write('END\n')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=1500)
    p.add_argument('--size-epochs', type=int, default=60)
    p.add_argument('--train-size', type=int, default=3000)
    p.add_argument('--val-size', type=int, default=128)
    p.add_argument('--batch-size', type=int, default=64)
    p.add_argument('--hidden', type=int, default=256)
    p.add_argument('--layers', type=int, default=6)
    p.add_argument('--timesteps', type=int, default=500)
    p.add_argument('--size-hidden', type=int, default=128)
    p.add_argument('--size-layers', type=int, default=3)
    p.add_argument('--n-eval-samples', type=int, default=2)
    p.add_argument('--out', type=str, default=None)
    p.add_argument('--artifacts', type=str, default='/tmp/size_pocket_demo',
                   help='dir for the CLI-journey files (ckpt/npz/xyz/pdb)')
    p.add_argument('--skip-diffusion', action='store_true')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from difflinker_tpu import constants
    from difflinker_tpu.config import (CenterOfMass, DataConfig,
                                       DatasetFamily, DiffusionConfig,
                                       ExperimentConfig, GraphType,
                                       ModelConfig, PocketMode, TrainConfig)
    from difflinker_tpu.data.packed import PackedDataset
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.models.size_gnn import (DistributionNodes,
                                                SizePredictor,
                                                size_prediction_fn)
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze
    from difflinker_tpu.train.trainer import Trainer

    t0 = time.time()
    NF = constants.GEOM_NUMBER_OF_ATOM_TYPES  # the CLI parses files is_geom
    print(f'generating {args.train_size}+{args.val_size} coupled '
          f'ligand+pocket complexes (vocab {NF})...', flush=True)
    train_raw = synthetic_molecule_dataset(
        args.train_size, seed=0, pocket_range=(8, 16),
        coupled_linker_size='types', n_types=NF)
    val_ds = synthetic_molecule_dataset(
        args.val_size, seed=1, pocket_range=(8, 16),
        coupled_linker_size='types', n_types=NF)

    def device_batch(b):
        keys = ('positions', 'one_hot', 'fragment_mask', 'fragment_only_mask',
                'pocket_mask', 'linker_mask', 'edge_mask')
        return {k: jnp.asarray(v) for k, v in b.items() if k in keys}

    # ---- 1. pocket-aware size predictor -----------------------------------
    predictor = SizePredictor(
        in_node_nf=NF, hidden_nf=args.size_hidden,
        out_node_nf=len(constants.ZINC_TRAIN_LINKER_ID2SIZE),
        n_layers=args.size_layers, task='classification', with_pocket=True)
    sparams, bn_state = predictor.init(jax.random.PRNGKey(2))
    steps_per_epoch = max(len(train_raw.samples) // args.batch_size, 1)
    tx = optax.adam(optax.cosine_decay_schedule(
        1e-3, args.size_epochs * steps_per_epoch))
    opt_state = tx.init(sparams)

    @jax.jit
    def size_step(sparams, bn_state, opt_state, batch):
        (loss, (_, new_bn)), grads = jax.value_and_grad(
            lambda q: predictor.loss(q, batch, bn_state, train=True),
            has_aux=True)(sparams)
        updates, opt_state = tx.update(grads, opt_state, sparams)
        return (optax.apply_updates(sparams, updates), new_bn, opt_state,
                loss)

    for epoch in range(args.size_epochs):
        losses = []
        # the reference's pocket size collate: edge mask spans the LIGAND
        # fragments only (fragment_only_mask), pocket rows carry no edges
        for batch in train_raw.iter_batches(args.batch_size, shuffle=True,
                                            seed=epoch,
                                            without_pocket_edges=True):
            sparams, bn_state, opt_state, loss = size_step(
                sparams, bn_state, opt_state, device_batch(batch))
            losses.append(float(loss))
    print(f'[size] final train loss {np.mean(losses):.4f}', flush=True)

    preds, trues = [], []
    for batch in val_ds.iter_batches(args.batch_size,
                                     without_pocket_edges=True):
        preds.append(predictor.predict_sizes(sparams, device_batch(batch),
                                             bn_state))
        trues.append(np.asarray(batch['linker_mask'])[..., 0].sum(-1))
    preds = np.concatenate(preds)
    true_sizes = np.concatenate(trues).astype(np.int32)
    prior_sizes = np.asarray(
        DistributionNodes().sample(jax.random.PRNGKey(3), len(true_sizes)))
    size_report = {
        'acc': float((preds == true_sizes).mean()),
        'acc_pm1': float((np.abs(preds - true_sizes) <= 1).mean()),
        'mae': float(np.abs(preds - true_sizes).mean()),
        'majority_acc': float(
            (true_sizes == np.bincount(true_sizes).argmax()).mean()),
        'prior_acc': float((prior_sizes == true_sizes).mean()),
        'prior_mae': float(np.abs(prior_sizes - true_sizes).mean()),
    }
    print('size predictor (with_pocket):', json.dumps(size_report), flush=True)
    results = {'size_predictor': size_report}
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    if args.skip_diffusion:
        return 0

    # ---- 2. pocket diffusion model (wide pocket recipe, GEOM vocab) --------
    cfg = ExperimentConfig(
        exp_name='size_pocket_demo',
        model=ModelConfig(in_node_nf=NF, context_node_nf=3,
                          hidden_nf=args.hidden, n_layers=args.layers,
                          norm_constant=1e-6, graph_type=GraphType.A4),
        diffusion=DiffusionConfig(timesteps=args.timesteps),
        data=DataConfig(family=DatasetFamily.MOAD,
                        pocket_mode=PocketMode.FULL),
        train=TrainConfig(lr=4e-4, batch_size=args.batch_size,
                          n_stability_samples=1,
                          center_of_mass=CenterOfMass.ANCHORS))
    train_ds = PackedDataset(train_raw.samples)
    steps = max(train_ds.num_steps(args.batch_size), 1)
    trainer = Trainer(cfg, lr_schedule='cosine',
                      decay_steps=args.epochs * steps, warmup_steps=5 * steps)
    state = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    print(f'training pocket diffusion ({args.epochs} epochs, '
          f'{args.layers}x{args.hidden}, T={args.timesteps})...', flush=True)
    for epoch in range(args.epochs):
        key, k = jax.random.split(key)
        state, m = trainer.fit_epoch_scanned(state, train_ds, args.batch_size,
                                             k, seed=epoch)
        if (epoch + 1) % 100 == 0:
            print(f'epoch {epoch + 1}: loss={m["loss"]:.4f} '
                  f'({time.time() - t0:.0f}s)', flush=True)

    # ---- 3. size-conditioned sampling sweep --------------------------------
    sampler = LinkerSampler(cfg, state['params'], trainer.edm,
                            pad_batch_to=args.batch_size)
    specs = {
        'ground_truth': 'ground_truth',
        'predictor': size_prediction_fn(predictor, sparams, bn_state),
        'prior': 'prior',
    }
    for name, spec in specs.items():
        m = sample_and_analyze(
            sampler, val_ds.iter_batches(args.batch_size),
            jax.random.PRNGKey(7), n_samples=args.n_eval_samples,
            is_geom=True, size_spec=spec)
        row = {k: round(float(v), 4) for k, v in m.items()
               if isinstance(v, (int, float))}
        results[name] = row
        print(f'{name}: validity={row.get("validity")} '
              f'v+c={row.get("validity_and_connectivity")}', flush=True)
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(results, f, indent=2)

    # ---- 4. the user journey: cli.generate_with_pocket --size-model --------
    os.makedirs(args.artifacts, exist_ok=True)
    from difflinker_tpu.io.checkpoints import save_params_npz
    from difflinker_tpu.io.lightning_export import save_size_checkpoint
    from difflinker_tpu.io.xyz import save_xyz_file

    size_ckpt = os.path.join(args.artifacts, 'size_pocket.ckpt')
    save_size_checkpoint(size_ckpt, predictor, sparams, bn_state,
                         is_geom=True)
    npz = os.path.join(args.artifacts, 'pocket_diffusion.npz')
    save_params_npz(state['params'], npz)
    with open(npz + '.config.json', 'w') as f:
        json.dump({'hidden': args.hidden, 'layers': args.layers,
                   'timesteps': args.timesteps, 'pocket': True,
                   'com': 'anchors', 'in_node_nf': NF}, f)

    s = val_ds.samples[0]
    frag_rows = np.where(s['fragment_only_mask'] > 0)[0]
    pocket_rows = np.where(s['pocket_mask'] > 0)[0]
    frag_paths = save_xyz_file(
        args.artifacts, s['one_hot'][None, frag_rows],
        s['positions'][None, frag_rows],
        np.ones((1, len(frag_rows))), names=['frags'], is_geom=True)
    pdb_path = os.path.join(args.artifacts, 'pocket.pdb')
    write_pocket_pdb(pdb_path, s['positions'][pocket_rows],
                     s['one_hot'][pocket_rows], constants.GEOM_IDX2ATOM)
    anchor_idx = [int(i) + 1 for i in
                  np.where(s['anchors'][frag_rows] > 0)[0]]

    import difflinker_tpu.cli.generate_with_pocket as gwp
    out_dir = os.path.join(args.artifacts, 'generated')
    rc = gwp.main(['--fragments', frag_paths[0], '--pocket', pdb_path,
                   '--params', npz, '--size-model', size_ckpt,
                   '--anchors', ','.join(map(str, anchor_idx)),
                   '--n-samples', '8', '--out', out_dir, '--seed', '5'])
    produced = sorted(f for f in os.listdir(out_dir) if f.endswith('.xyz'))
    results['cli_journey'] = {
        'rc': rc,
        'command': ('cli.generate_with_pocket --fragments frags_.xyz '
                    '--pocket pocket.pdb --params pocket_diffusion.npz '
                    f'--size-model size_pocket.ckpt --anchors '
                    f'{",".join(map(str, anchor_idx))} --n-samples 8'),
        'n_outputs': len(produced),
    }
    print('cli journey:', json.dumps(results['cli_journey']), flush=True)

    results['elapsed_s'] = round(time.time() - t0, 1)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
