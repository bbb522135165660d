#!/usr/bin/env python
"""Backward-path anatomy (VERDICT r2 next-round #4): time forward-only vs
forward+grad vs the full fused train step at the ZINC and pocket shapes,
with remat forced on/off and the auto policy's choice, and report MFU with
honest FLOPs accounting (3x forward for a remat-free backward, 4x with
remat — ops/flops.train_step_flops).

    python scripts/bench_train_breakdown.py --out docs/train_breakdown.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(mcfg, B, N, make_batch, runs=3):
    import jax
    import jax.numpy as jnp
    import bench

    # Setup + scan-of-K timing harness shared with bench.py (same cfg
    # assembly, same clock) so the MFU numbers published by both agree.
    trainer, state, batch = bench._train_setup(mcfg, B, N, make_batch)
    key = jax.random.PRNGKey(1)
    K = 16

    @jax.jit
    def fwd_many(p, keys):
        def body(acc, k):
            return acc + trainer.loss_fn(p, batch, k, training=True)[0], None
        return jax.lax.scan(body, 0.0, keys)[0]

    @jax.jit
    def grad_many(p, keys):
        def body(acc, k):
            g = jax.grad(
                lambda q: trainer.loss_fn(q, batch, k, training=True)[0])(p)
            gsum = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                       for l in jax.tree_util.tree_leaves(g))
            return acc + gsum, None
        return jax.lax.scan(body, 0.0, keys)[0]

    @jax.jit
    def step_many(s, keys):
        def body(c, k):
            s2, m = trainer.train_step(c, batch, k, jnp.inf)
            return s2, m['loss']
        return jax.lax.scan(body, s, keys)[1]

    def clock(fn, *args):
        return bench._scan_clock(fn, args, K, runs) * 1e3  # ms per iteration

    keys = jax.random.split(key, K)
    t_fwd = clock(fwd_many, state['params'], keys)
    t_grad = clock(grad_many, state['params'], keys)
    t_step = clock(step_many, state, keys)
    return {'fwd_ms': round(t_fwd, 2), 'grad_ms': round(t_grad, 2),
            'step_ms': round(t_step, 2),
            'bwd_over_fwd': round((t_grad - t_fwd) / t_fwd, 2),
            'optimizer_ms': round(t_step - t_grad, 2)}


def main():
    import jax
    import bench
    from difflinker_tpu.config import GraphType, ModelConfig, resolve_remat
    from difflinker_tpu.ops import flops as flops_lib

    p = argparse.ArgumentParser()
    p.add_argument('--out', default=None)
    p.add_argument('--runs', type=int, default=3)
    args = p.parse_args()

    kind = jax.devices()[0].device_kind
    report = {'device': kind, 'shapes': {}}
    shapes = [
        ('zinc_bf16', dict(in_node_nf=8, context_node_nf=2, hidden_nf=128,
                           n_layers=8, inv_sublayers=2, norm_constant=1e-6,
                           dtype='bfloat16'), 128, 32, bench._zinc_train_batch),
        ('zinc_fp32', dict(in_node_nf=8, context_node_nf=2, hidden_nf=128,
                           n_layers=8, inv_sublayers=2, norm_constant=1e-6,
                           dtype='float32'), 128, 32, bench._zinc_train_batch),
        ('zinc_bf16_B512', dict(in_node_nf=8, context_node_nf=2,
                                hidden_nf=128, n_layers=8, inv_sublayers=2,
                                norm_constant=1e-6, dtype='bfloat16'),
         512, 32, bench._zinc_train_batch),
        ('pocket_bf16', dict(in_node_nf=9, context_node_nf=3, hidden_nf=128,
                             n_layers=6, inv_sublayers=2, norm_constant=1e-6,
                             graph_type=GraphType.A4, dtype='bfloat16'),
         32, 256, bench._pocket_train_batch),
    ]
    for name, kw, B, N, mk in shapes:
        row = {}
        for remat in ('auto', True, False):
            mcfg = ModelConfig(remat=remat, **kw)
            decided = resolve_remat(mcfg, (B, N))
            label = f'remat={remat}' + (f'({decided})' if remat == 'auto'
                                        else '')
            try:
                m = measure(mcfg, B, N, mk, runs=args.runs)
            except Exception as e:  # OOM expected for some forced-off combos
                row[label] = {'error': str(e)[:120]}
                continue
            fl = flops_lib.train_step_flops(B, N, mcfg, remat=decided
                                            if remat == 'auto' else remat)
            peak = flops_lib.peak_flops(kind, mcfg.dtype)
            m['mol_per_s'] = round(B / (m['step_ms'] / 1e3), 1)
            if peak:
                m['mfu'] = round(fl / (m['step_ms'] / 1e3) / peak, 4)
            row[label] = m
            print(name, label, json.dumps(m), flush=True)
        report['shapes'][name] = row
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(report, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
