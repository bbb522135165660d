#!/usr/bin/env python
"""RePaint / low-temperature sweep on the multifrag k=5 gap (VERDICT r4
item 8).

The wide given-anchors multifrag model (examples/params/multifrag_h384.npz)
holds 87.4% whole-molecule V+C at k=3 but 52.0% at k=5
(docs/demo_geom_multifrag_wide_by_k.json): closing ALL k-1 junctions
compounds per-junction success geometrically. Two inference-only levers the
TPU build adds over the reference could move it: RePaint resampling
(re-noise + re-denoise each reverse transition — the knob that multiplied
inpainting V+C 4.5x, BASELINE.md) and low-temperature sampling
(noise_scale < 1). Each cell is one scripts/analyze_multifrag.py run (the
canonical per-k battery), collected into one JSON:

    python scripts/bench_multifrag_repaint.py --out docs/multifrag_repaint_sweep.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--params', default='examples/params/multifrag_h384.npz')
    p.add_argument('--val-size', type=int, default=256)
    p.add_argument('--n-samples', type=int, default=2)
    p.add_argument('--steps', type=int, default=100)
    p.add_argument('--grid', default='1:1.0,2:1.0,3:1.0,1:0.7,3:0.7',
                   help='comma-separated resample_steps:noise_scale cells '
                        '(1:1.0 is the measured round-3 baseline setting)')
    p.add_argument('--out', default='docs/multifrag_repaint_sweep.json')
    args = p.parse_args()

    import analyze_multifrag

    results = {'params': args.params, 'steps': args.steps,
               'val_size': args.val_size, 'n_samples': args.n_samples,
               'cells': []}
    for cell in args.grid.split(','):
        r, ns = cell.split(':')
        cell_out = f'/tmp/repaint_cell_{r}_{ns}.json'
        argv = ['--params', args.params, '--val-size', str(args.val_size),
                '--n-samples', str(args.n_samples), '--steps',
                str(args.steps), '--resample-steps', r, '--noise-scale', ns,
                '--out', cell_out]
        analyze_multifrag.main(argv)
        with open(cell_out) as f:
            results['cells'].append(json.load(f))
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)
    print('done ->', args.out)
    return 0


if __name__ == '__main__':
    sys.exit(main())
