#!/usr/bin/env python
"""Sample linkers from a bundled pre-trained demo model — no training needed.

The repo ships fp16 weights for the headline demo models under
examples/params/ (see examples/params/README.md for provenance and expected
scores). This script rebuilds the recipe from the sidecar .config.json
(difflinker_tpu/demo.py), samples n linkers against the recipe's validation
set, and scores validity / valid+connected / uniqueness with the native
chemistry stack:

    python scripts/demo_pretrained.py --params examples/params/zinc_h256.npz
    python scripts/demo_pretrained.py --params examples/params/pocket_h256.npz \
        --steps 100   # 5x faster chain, quality holds (BASELINE.md)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--params', required=True,
                   help='bundled .npz (examples/params/*.npz) or any '
                        'demo --save-params artifact')
    p.add_argument('--n', type=int, default=128, help='molecules to score')
    p.add_argument('--n-samples', type=int, default=1,
                   help='linkers per input molecule')
    p.add_argument('--batch-size', type=int, default=64)
    p.add_argument('--out', default=None, help='write the report JSON here')

    from difflinker_tpu.cli import common
    common.add_respacing_args(p)  # --steps / --respace-mode / --resample-steps
    args = p.parse_args()

    import jax
    from difflinker_tpu.demo import load_demo_model, recipe_val_dataset
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze

    common.enable_compilation_cache()
    cfg, params, meta = load_demo_model(args.params, exp_name='pretrained')
    cfg = common.apply_respacing(cfg, args)
    print(f'recipe: {json.dumps(meta)}', flush=True)

    val_ds = recipe_val_dataset(meta, args.n, seed=1)
    sampler = LinkerSampler(cfg, params, pad_batch_to=args.batch_size)

    t0 = time.time()
    m = sample_and_analyze(sampler, val_ds.iter_batches(args.batch_size),
                           jax.random.PRNGKey(7), n_samples=args.n_samples)
    dt = time.time() - t0
    report = {'params': args.params, 'recipe': meta,
              'sample_T': args.steps or meta['timesteps'],
              'respace_mode': args.respace_mode if args.steps else None,
              'resample_steps': args.resample_steps,
              'noise_scale': args.noise_scale,
              'n_scored': len(val_ds.samples) * args.n_samples,
              'validity': round(m['validity'], 4),
              'validity_and_connectivity':
                  round(m['validity_and_connectivity'], 4),
              'uniqueness': round(m['uniqueness'], 4),
              'wall_s': round(dt, 1)}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
