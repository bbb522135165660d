#!/usr/bin/env python
"""Learned-size end-to-end demo (ROADMAP gap: size-conditioned sampling
scored against ground truth).

Trains a SizePredictor (classification head) on the synthetic molecules
(with sizes coupled to fragment content — see
synthetic_molecules.coupled_linker_size), reports its size accuracy against
the categorical-prior and majority-class baselines, then trains the
diffusion model and compares the full sampling metrics under three size
sources:

  * ground_truth — oracle linker sizes (upper bound),
  * predictor    — the trained SizeGNN via size_prediction_fn
                   (the generate.py:88-99 user journey),
  * prior        — DistributionNodes categorical prior (lower bound).

Honest ceiling, measured 2026-08-16: on THIS generator the only size signal
a fragment-only model can use is the pooled atom count, and the reference
SizeGNN architecture (BatchNorm over B·N rows, mean-pool readout,
d²<6-gated edges) learns such pooled-count signals only *relative to batch
statistics* — train-mode (batch-stat) val MSE reaches 0.23 while eval-mode
(running-stat) predictions collapse to ~prior quality, across
classification/ordinal/regression heads, lr schedules, stats-refresh and
affine recalibration. Real ZINC fragments carry node-local chemistry the
architecture demonstrably does learn (the published predictor); meaningful
accuracy here therefore needs the real datasets (ROADMAP gap). This demo
still proves the full journey: train -> checkpoint-compatible predictor ->
size_prediction_fn -> sampler -> metrics, and quantifies what oracle vs
prior sizes are worth downstream.

    python scripts/demo_size_conditioned.py [--epochs 600]
"""
import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=600,
                   help='diffusion training epochs')
    p.add_argument('--size-epochs', type=int, default=40)
    p.add_argument('--train-size', type=int, default=3000)
    p.add_argument('--val-size', type=int, default=128)
    p.add_argument('--batch-size', type=int, default=128)
    p.add_argument('--hidden', type=int, default=128)
    p.add_argument('--layers', type=int, default=6)
    p.add_argument('--size-hidden', type=int, default=128)
    p.add_argument('--size-layers', type=int, default=3)
    p.add_argument('--n-eval-samples', type=int, default=2)
    p.add_argument('--out', type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from difflinker_tpu import constants
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)
    from difflinker_tpu.data.packed import PackedDataset
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.models.size_gnn import (DistributionNodes,
                                                SizePredictor,
                                                size_prediction_fn)
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze
    from difflinker_tpu.train.trainer import Trainer

    t0 = time.time()
    print(f'generating {args.train_size}+{args.val_size} molecules...',
          flush=True)
    # coupled sizes: the d²<6-gated fragment graph hides inter-fragment
    # geometry, so independent sizes would be unlearnable by construction
    train_raw = synthetic_molecule_dataset(args.train_size, seed=0,
                                           coupled_linker_size=True)
    val_ds = synthetic_molecule_dataset(args.val_size, seed=1,
                                        coupled_linker_size=True)
    # ---- 1. size predictor ------------------------------------------------
    predictor = SizePredictor(
        in_node_nf=constants.NUMBER_OF_ATOM_TYPES,
        hidden_nf=args.size_hidden,
        out_node_nf=len(constants.ZINC_TRAIN_LINKER_ID2SIZE),
        n_layers=args.size_layers)
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
        return optax.apply_updates(sparams, updates), new_bn, opt_state, loss

    def device_batch(b):
        keys = ('positions', 'one_hot', 'fragment_mask', 'linker_mask',
                'edge_mask')
        return {k: jnp.asarray(v) for k, v in b.items() if k in keys}

    for epoch in range(args.size_epochs):
        losses = []
        for batch in train_raw.iter_batches(args.batch_size, shuffle=True,
                                            seed=epoch,
                                            fragment_edges_only=True):
            sparams, bn_state, opt_state, loss = size_step(
                sparams, bn_state, opt_state, device_batch(batch))
            losses.append(float(loss))
        if (epoch + 1) % 10 == 0:
            print(f'size epoch {epoch + 1}: loss={np.mean(losses):.4f}',
                  flush=True)

    # val accuracy vs baselines — true sizes collected from the SAME batch
    # stream as the predictions (iter_batches groups by size bucket, so
    # dataset-order labels would be misaligned)
    preds, trues = [], []
    for batch in val_ds.iter_batches(args.batch_size,
                                     fragment_edges_only=True):
        preds.append(predictor.predict_sizes(sparams, device_batch(batch),
                                             bn_state))
        trues.append(np.asarray(batch['linker_mask'])[..., 0].sum(-1))
    preds = np.concatenate(preds)
    true_sizes = np.concatenate(trues).astype(np.int32)
    prior_sizes = np.asarray(
        DistributionNodes().sample(jax.random.PRNGKey(3), len(true_sizes)))
    majority = np.bincount(true_sizes).argmax()
    size_report = {
        'predictor_acc': float((preds == true_sizes).mean()),
        'predictor_acc_pm1': float((np.abs(preds - true_sizes) <= 1).mean()),
        'predictor_mae': float(np.abs(preds - true_sizes).mean()),
        'majority_acc': float((true_sizes == majority).mean()),
        'prior_acc': float((prior_sizes == true_sizes).mean()),
        'prior_mae': float(np.abs(prior_sizes - true_sizes).mean()),
    }
    print('size predictor:', json.dumps(size_report), flush=True)

    # ---- 2. diffusion model ----------------------------------------------
    cfg = ExperimentConfig(
        exp_name='size_conditioned_demo',
        model=ModelConfig(in_node_nf=8, context_node_nf=2,
                          hidden_nf=args.hidden, n_layers=args.layers,
                          norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=100),
        data=DataConfig(),
        train=TrainConfig(lr=4e-4, batch_size=args.batch_size,
                          n_stability_samples=1))
    train_ds = PackedDataset(train_raw.samples)
    steps = max(train_ds.num_steps(args.batch_size), 1)
    trainer = Trainer(cfg, lr_schedule='cosine',
                      decay_steps=args.epochs * steps, warmup_steps=5 * steps)
    state = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    print(f'training diffusion model ({args.epochs} epochs)...', flush=True)
    for epoch in range(args.epochs):
        key, k = jax.random.split(key)
        state, m = trainer.fit_epoch_scanned(state, train_ds, args.batch_size,
                                             k, seed=epoch)
        if (epoch + 1) % 100 == 0:
            print(f'epoch {epoch + 1}: loss={m["loss"]:.4f} '
                  f'({time.time() - t0:.0f}s)', flush=True)

    # ---- 3. size-conditioned sampling sweep ------------------------------
    sampler = LinkerSampler(cfg, state['params'], trainer.edm)
    specs = {
        'ground_truth': 'ground_truth',
        'predictor': size_prediction_fn(predictor, sparams, bn_state),
        'prior': 'prior',
    }
    results = {'size_predictor': size_report}
    for name, spec in specs.items():
        m = sample_and_analyze(
            sampler, val_ds.iter_batches(args.batch_size),
            jax.random.PRNGKey(7), n_samples=args.n_eval_samples,
            size_spec=spec)
        row = {k: round(float(v), 4) for k, v in m.items()
               if isinstance(v, (int, float))}
        results[name] = row
        print(f'{name}: validity={row.get("validity")} '
              f'v+c={row.get("validity_and_connectivity")} '
              f'uniqueness={row.get("uniqueness")}', flush=True)

    results['elapsed_s'] = round(time.time() - t0, 1)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
