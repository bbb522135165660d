#!/usr/bin/env python
"""Train a with_pocket SizeGNN at the published case-study scale.

Companion to scripts/train_case_scale_pocket.py: the bundled size model
(examples/params/size_pocket_geom.ckpt) saw 4-8-atom fragments and 8-16-atom
linker shells; the case studies carry 8-21-atom fragments inside 129-187-atom
contact pockets. Trains SizePredictor(with_pocket=True) through the
without-pocket-edges collate (reference src/linker_size_lightning.py:83-97)
on the matched residue-pocket distribution with the node-local 'types' size
rule, and exports a reference-format Lightning .ckpt for
`--size-model` on the pocket CLIs.

    python scripts/train_case_size_gnn.py --out docs/train_case_size.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--train-size', type=int, default=2000)
    p.add_argument('--val-size', type=int, default=256)
    p.add_argument('--epochs', type=int, default=40)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--hidden', type=int, default=128)
    p.add_argument('--layers', type=int, default=3)
    p.add_argument('--save', default='examples/params/size_pocket_case.ckpt')
    p.add_argument('--out', default='docs/train_case_size.json')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from difflinker_tpu import constants
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.io.lightning_export import save_size_checkpoint
    from difflinker_tpu.models.size_gnn import DistributionNodes, SizePredictor

    t0 = time.time()
    NF = constants.GEOM_NUMBER_OF_ATOM_TYPES
    gen_kw = dict(frag_range=(8, 16), linker_range=(5, 10),
                  pocket_range=(100, 190), pocket_style='residues',
                  coupled_linker_size='types', n_types=NF)
    print(f'generating {args.train_size}+{args.val_size} case-scale '
          f'complexes {gen_kw}...', flush=True)
    train_raw = synthetic_molecule_dataset(args.train_size, seed=0, **gen_kw)
    val_ds = synthetic_molecule_dataset(args.val_size, seed=1, **gen_kw)

    def device_batch(b):
        keys = ('positions', 'one_hot', 'fragment_mask', 'fragment_only_mask',
                'pocket_mask', 'linker_mask', 'edge_mask')
        return {k: jnp.asarray(v) for k, v in b.items() if k in keys}

    predictor = SizePredictor(
        in_node_nf=NF, hidden_nf=args.hidden,
        out_node_nf=len(constants.ZINC_TRAIN_LINKER_ID2SIZE),
        n_layers=args.layers, task='classification', with_pocket=True)
    sparams, bn_state = predictor.init(jax.random.PRNGKey(2))
    steps_per_epoch = max(len(train_raw.samples) // args.batch_size, 1)
    tx = optax.adam(optax.cosine_decay_schedule(
        1e-3, args.epochs * steps_per_epoch))
    opt_state = tx.init(sparams)

    @jax.jit
    def size_step(sparams, bn_state, opt_state, batch):
        (loss, (_, new_bn)), grads = jax.value_and_grad(
            lambda q: predictor.loss(q, batch, bn_state, train=True),
            has_aux=True)(sparams)
        updates, opt_state = tx.update(grads, opt_state, sparams)
        return (optax.apply_updates(sparams, updates), new_bn, opt_state,
                loss)

    for epoch in range(args.epochs):
        losses = []
        for batch in train_raw.iter_batches(args.batch_size, shuffle=True,
                                            seed=epoch,
                                            without_pocket_edges=True):
            sparams, bn_state, opt_state, loss = size_step(
                sparams, bn_state, opt_state, device_batch(batch))
            losses.append(float(loss))
        if (epoch + 1) % 10 == 0 or epoch == 0:
            print(f'epoch {epoch + 1}: loss={np.mean(losses):.4f} '
                  f'({time.time() - t0:.0f}s)', flush=True)

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
    report = {
        'acc': round(float((preds == true_sizes).mean()), 4),
        'acc_pm1': round(float((np.abs(preds - true_sizes) <= 1).mean()), 4),
        'mae': round(float(np.abs(preds - true_sizes).mean()), 4),
        'majority_acc': round(float(
            (true_sizes == np.bincount(true_sizes).argmax()).mean()), 4),
        'prior_acc': round(float((prior_sizes == true_sizes).mean()), 4),
    }
    print('size predictor (case scale):', json.dumps(report), flush=True)

    save_size_checkpoint(args.save, predictor, sparams, bn_state,
                         is_geom=True)
    print(f'saved {args.save}', flush=True)
    results = {'save': args.save, 'gen': repr(gen_kw),
               'epochs': args.epochs, 'report': report,
               'elapsed_s': round(time.time() - t0, 1)}
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == '__main__':
    sys.exit(main())
