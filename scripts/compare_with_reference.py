#!/usr/bin/env python
"""Released-checkpoint reproduction harness (BASELINE.json north star).

Run this in an environment that has the released artifacts (they cannot be
fetched in the zero-egress build container):

    python scripts/compare_with_reference.py \
        --ckpt zinc_difflinker.ckpt --data datasets \
        --prefix zinc_final_test --n-inputs 50 --n-samples 10

It (1) loads the Lightning checkpoint through the converter, (2) when torch
can run the reference (sys.path /root/reference), compares ε̂ on a real test
batch between the torch model and the imported JAX model, (3) samples linkers
and runs the metric battery, printing a comparison table.
"""
import argparse
import json
import sys

import numpy as np

# North-star tolerances (BASELINE.json: "matching ZINC validity/uniqueness
# within 1%" + RMSD "within numerical tolerance"). Values are absolute
# percentage points for rate metrics, Angstrom for RMSD.
TOLERANCES = {
    'validity': 1.0,
    'uniqueness': 1.0,
    'validity_and_connectivity': 1.0,
    'novelty': 1.0,
    'rmsd': 0.05,
}


def baseline_comparison(ckpt: str, ours: dict, reference: dict) -> dict:
    """The exact BASELINE.json north-star comparison record: per-metric
    deltas vs the reference-side numbers and pass/fail at the published
    tolerances. `reference` keys must use the same metric names as
    sample_and_analyze / cli.compute_metrics output."""
    shared = sorted(set(ours) & set(reference))
    deltas = {k: float(ours[k]) - float(reference[k]) for k in shared}
    checks = {k: abs(deltas[k]) <= TOLERANCES[k]
              for k in shared if k in TOLERANCES}
    return {
        'schema': 'baseline-comparison-v1',
        'north_star': ('reference checkpoints load and reproduce validity/'
                       'uniqueness/RMSD within tolerance (BASELINE.json)'),
        'checkpoint': ckpt,
        'ours': {k: float(v) for k, v in ours.items()},
        'reference': {k: float(v) for k, v in reference.items()},
        'deltas': deltas,
        'tolerances': {k: TOLERANCES[k] for k in checks},
        'pass': checks,
        'all_pass': bool(checks) and all(checks.values()),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', required=True)
    p.add_argument('--data', default='datasets')
    p.add_argument('--prefix', default='zinc_final_test')
    p.add_argument('--n-inputs', type=int, default=50)
    p.add_argument('--n-samples', type=int, default=10)
    p.add_argument('--reference', default='/root/reference')
    p.add_argument('--reference-metrics', default=None,
                   help='JSON file of reference-side metric values (same '
                        'keys as our output); enables the BASELINE.json '
                        'comparison record')
    p.add_argument('--out', default=None,
                   help='write the comparison record to this JSON file')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    import jax
    from difflinker_tpu.chem import delinker, metrics
    from difflinker_tpu.chem.molgraph import build_molecules
    from difflinker_tpu.data.datasets import LinkerDataset
    from difflinker_tpu.io.lightning_import import load_ddpm_checkpoint
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze

    print(f'loading {args.ckpt}...')
    cfg, params = load_ddpm_checkpoint(args.ckpt)
    print(f'config: {cfg.model.n_layers} layers, nf={cfg.model.hidden_nf}, '
          f'T={cfg.diffusion.timesteps}, graph={cfg.model.graph_type.value}')

    ds = LinkerDataset.from_pt(args.data, args.prefix)
    ds = LinkerDataset(ds.samples[:args.n_inputs], ds.buckets)
    print(f'{len(ds)} test inputs')

    # --- step 1: eps-hat parity vs the torch reference on a real batch ------
    try:
        sys.path.insert(0, args.reference)
        import torch
        from src.lightning import DDPM  # noqa: F401 (needs pytorch_lightning)
        has_torch_ref = True
    except Exception as e:
        print(f'(torch reference model unavailable for direct parity: {e})')
        has_torch_ref = False

    if has_torch_ref:
        import jax.numpy as jnp
        from difflinker_tpu.models.dynamics import dynamics_apply
        from difflinker_tpu.train.trainer import assemble_context
        ddpm = DDPM.load_from_checkpoint(args.ckpt, map_location='cpu').eval()
        batch = next(ds.iter_batches(8, group_by_bucket=False))
        context = np.asarray(assemble_context(
            {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)},
            anchors_context=cfg.train.anchors_context,
            has_pocket=cfg.data.has_pocket))
        xh = np.concatenate([batch['positions'], batch['one_hot']], -1)
        B, N = xh.shape[:2]
        t = np.full((B, 1), 0.5, np.float32)
        with torch.no_grad():
            ref = ddpm.edm.dynamics.forward(
                t=torch.tensor(t), xh=torch.tensor(xh),
                node_mask=torch.tensor(batch['atom_mask']),
                linker_mask=torch.tensor(batch['linker_mask']),
                edge_mask=torch.tensor(
                    batch['edge_mask'].reshape(B * N * N, 1)),
                context=torch.tensor(context)).numpy()
        ours, _ = dynamics_apply(
            params['dynamics'], jnp.asarray(t), jnp.asarray(xh),
            jnp.asarray(batch['atom_mask']), jnp.asarray(batch['linker_mask']),
            jnp.asarray(batch['edge_mask']), jnp.asarray(context),
            cfg=cfg.model)
        rel = np.linalg.norm(np.asarray(ours) - ref) / np.linalg.norm(ref)
        print(f'eps-hat relative error vs torch reference: {rel:.2e}')

    # --- step 2: sample + metric battery ------------------------------------
    sampler = LinkerSampler(cfg, params)
    results = sample_and_analyze(
        sampler, ds.iter_batches(min(args.n_inputs, 32)),
        jax.random.PRNGKey(args.seed), n_samples=args.n_samples,
        is_geom=cfg.data.is_geom)
    print(json.dumps({k: round(float(v), 4) for k, v in results.items()},
                     indent=2))

    # --- step 3: BASELINE.json north-star comparison record -----------------
    if args.reference_metrics:
        with open(args.reference_metrics) as f:
            ref_metrics = json.load(f)
        record = baseline_comparison(args.ckpt, results, ref_metrics)
        print(json.dumps(record, indent=2))
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(record, f, indent=2)
            print(f'comparison record written to {args.out}')
        return 0 if record['all_pass'] else 2
    return 0


if __name__ == '__main__':
    sys.exit(main())
