"""Train the linker-size predictor (classifier / ordinal / regressor).

Port of train_size_gnn.py: ZINC or GEOM label space picked by config,
class-weighted cross-entropy, per-epoch val accuracy.

    python -m difflinker_tpu.cli.train_size_gnn --data datasets \
        --train-prefix zinc_final_train --val-prefix zinc_final_val \
        --task classification [--synthetic N]
"""
from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np
import optax

from difflinker_tpu import constants
from difflinker_tpu.cli import common
from difflinker_tpu.data.datasets import LinkerDataset, synthetic_dataset
from difflinker_tpu.io.checkpoints import save_params_npz
from difflinker_tpu.models.size_gnn import SizePredictor, size_labels


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data', type=str, default='datasets')
    p.add_argument('--train-prefix', type=str, default='zinc_final_train')
    p.add_argument('--val-prefix', type=str, default='zinc_final_val')
    p.add_argument('--synthetic', type=int, default=None)
    p.add_argument('--task', type=str, default='classification',
                   choices=['classification', 'ordinal', 'regression'])
    p.add_argument('--hidden', type=int, default=256)
    p.add_argument('--layers', type=int, default=5)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--epochs', type=int, default=100)
    p.add_argument('--geom', action='store_true', help='GEOM label space')
    p.add_argument('--no-class-weights', action='store_true')
    p.add_argument('--out', type=str, default='models/size_gnn')
    p.add_argument('--seed', type=int, default=0)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    common.enable_compilation_cache()
    if args.geom:
        id2size = constants.GEOM_TRAIN_LINKER_ID2SIZE
        size2id = constants.GEOM_TRAIN_LINKER_SIZE2ID
        weights = constants.GEOM_TRAIN_LINKER_SIZE_WEIGHTS
        in_nf = constants.GEOM_NUMBER_OF_ATOM_TYPES
    else:
        id2size = constants.ZINC_TRAIN_LINKER_ID2SIZE
        size2id = constants.ZINC_TRAIN_LINKER_SIZE2ID
        weights = constants.ZINC_TRAIN_LINKER_SIZE_WEIGHTS
        in_nf = constants.NUMBER_OF_ATOM_TYPES
    if args.no_class_weights or args.task != 'classification':
        weights = None

    predictor = SizePredictor(
        in_node_nf=in_nf, hidden_nf=args.hidden, out_node_nf=len(id2size),
        n_layers=args.layers, task=args.task, size2id=size2id,
        id2size=id2size, class_weights=weights)

    if args.synthetic:
        train_ds = synthetic_dataset(args.synthetic, seed=0, is_geom=args.geom)
        val_ds = synthetic_dataset(max(args.synthetic // 8, 4), seed=1,
                                   is_geom=args.geom)
    else:
        train_ds = LinkerDataset.from_pt(args.data, args.train_prefix)
        val_ds = LinkerDataset.from_pt(args.data, args.val_prefix)

    params, bn_state = predictor.init(jax.random.PRNGKey(args.seed))
    tx = optax.chain(optax.scale_by_amsgrad(),
                     optax.add_decayed_weights(1e-12),
                     optax.scale_by_learning_rate(args.lr))
    opt_state = tx.init(params)

    import jax.numpy as jnp

    @jax.jit
    def step(params, bn_state, opt_state, batch):
        (loss, (_, new_bn)), grads = jax.value_and_grad(
            lambda p: predictor.loss(p, batch, bn_state, train=True),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bn, opt_state, loss

    def batch_device(b):
        keys = ('positions', 'one_hot', 'fragment_mask', 'linker_mask',
                'edge_mask', 'fragment_only_mask')
        return {k: jnp.asarray(v) for k, v in b.items() if k in keys}

    collate_kw = dict(fragment_edges_only=True)
    for epoch in range(args.epochs):
        losses = []
        for batch in train_ds.iter_batches(args.batch_size, shuffle=True,
                                           seed=epoch, **collate_kw):
            params, bn_state, opt_state, loss = step(
                params, bn_state, opt_state, batch_device(batch))
            losses.append(float(loss))
        # val accuracy (src/linker_size_lightning.py:148-165)
        correct = total = 0
        for batch in val_ds.iter_batches(args.batch_size, **collate_kw):
            pred = predictor.predict_sizes(params, batch_device(batch), bn_state)
            true_ids = size_labels(batch['linker_mask'], size2id, id2size)
            pred_ids = np.asarray([size2id.get(int(s), len(id2size) - 1)
                                   for s in pred])
            correct += int((pred_ids == true_ids).sum())
            total += len(pred_ids)
        common.log(f'epoch {epoch}: loss={np.mean(losses):.4f} '
                   f'val_acc={correct / max(total, 1):.3f}')

    os.makedirs(args.out, exist_ok=True)
    npz_path = os.path.join(args.out, f'size_gnn_{args.task}.npz')
    save_params_npz({'params': params, 'bn_state': bn_state}, npz_path)
    # recipe sidecar (same convention as the demo weights): enough to
    # rebuild the SizePredictor, e.g. for cli.export_checkpoint --size-npz
    import json
    with open(npz_path + '.config.json', 'w') as f:
        json.dump({'task': args.task, 'hidden': args.hidden,
                   'layers': args.layers, 'in_node_nf': in_nf,
                   'out_node_nf': len(id2size), 'geom': bool(args.geom)}, f)
    common.log(f'saved to {args.out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
