#!/usr/bin/env python
"""Measured study: does int8 quantisation of the EGNN edge/node MLPs pay on
this chip? (docs/ROADMAP.md kernel-headroom idea.)

The dense EGNN at H=128 is VPU/HBM-bound (docs/ARCHITECTURE.md §5); int8
could help two ways: (a) int8 MXU matmuls (2x peak vs bf16 on v5e-class
chips), (b) halved HBM traffic IF the edge activations are stored int8
between ops. This script measures an ad-hoc int8 GCL (per-channel symmetric
weight scales, dynamic per-tensor activation scales, int8xint8->int32
dot_general) against the production fp32/bf16 paths at the ZINC and pocket
shapes, plus the quantisation error vs fp32.

The verdict is recorded in docs/ARCHITECTURE.md §5 — like the Pallas
generations, this is measured evidence, not speculation.

    python scripts/bench_int8_study.py [--steps 20]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quantize_per_channel(w):
    """int8 symmetric per-output-channel: w (I, O) -> (q (I, O) int8,
    scale (O,) f32)."""
    import jax.numpy as jnp
    s = jnp.max(jnp.abs(w), axis=0) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def int8_matmul(a, qw, ws):
    """a (..., I) f32 -> dynamic per-tensor int8 -> int8 matmul -> dequant."""
    import jax.numpy as jnp
    from jax import lax
    sa = jnp.max(jnp.abs(a)) / 127.0 + 1e-12
    qa = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
    out = lax.dot_general(qa, qw, (((qa.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * (sa * ws)


def gcl_int8(p, h, edge_attr, node_mask, edge_mask, act, norm_factor):
    """gcl_apply (models/egnn.py) with every matmul int8-quantised."""
    import jax
    import jax.numpy as jnp

    input_nf = h.shape[-1]
    w = p['edge_mlp']['lin0']['w']
    w_src, w_dst, w_e = w[:input_nf], w[input_nf:2 * input_nf], w[2 * input_nf:]
    pre = (int8_matmul(h, *quantize_per_channel(w_src))[:, :, None, :]
           + int8_matmul(h, *quantize_per_channel(w_dst))[:, None, :, :])
    if edge_attr is not None and w_e.shape[0] > 0:
        pre = pre + int8_matmul(edge_attr, *quantize_per_channel(w_e))
    mij = act(pre + p['edge_mlp']['lin0']['b'])
    mij = act(int8_matmul(mij, *quantize_per_channel(p['edge_mlp']['lin1']['w']))
              + p['edge_mlp']['lin1']['b'])
    feat = mij * edge_mask
    agg = jnp.sum(feat, axis=2) / norm_factor
    wn = p['node_mlp']['lin0']['w']
    out = (int8_matmul(h, *quantize_per_channel(wn[:input_nf]))
           + int8_matmul(agg, *quantize_per_channel(wn[input_nf:]))
           + p['node_mlp']['lin0']['b'])
    out = act(out)
    out = (int8_matmul(out, *quantize_per_channel(p['node_mlp']['lin1']['w']))
           + p['node_mlp']['lin1']['b'])
    h = h + out
    return h * node_mask


def run_shape(label, B, N, L, steps):
    import jax
    import jax.numpy as jnp
    from difflinker_tpu.models.egnn import activation_fn, init_gcl
    from difflinker_tpu.models import egnn as egnn_lib
    from difflinker_tpu.ops.geometry import fc_edge_mask

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((B, N, 128)).astype(np.float32))
    d2 = jnp.asarray(
        (rng.standard_normal((B, N, N, 2)) ** 2).astype(np.float32))
    nm = jnp.ones((B, N, 1), jnp.float32)
    em = jnp.abs(fc_edge_mask(nm))  # {0,1,2}-ish weights; fine for timing
    p, _ = init_gcl(jax.random.PRNGKey(0), 128, 128, 128, edges_in_d=2)
    act = activation_fn('silu')

    def chain(fn):
        @jax.jit
        def run(h):
            def body(h, _):
                return fn(h), ()
            out, _ = jax.lax.scan(body, h, jnp.arange(L * steps))
            return out
        return run

    def gcl_ref(dtype):
        def f(h):
            pp = jax.tree.map(lambda a: a.astype(dtype), p)
            out, _ = egnn_lib.gcl_apply(
                pp, h.astype(dtype), d2.astype(dtype), nm.astype(dtype),
                em.astype(dtype), act=act, normalization_factor=100.0,
                aggregation_method='sum', attention=False)
            return out.astype(jnp.float32)
        return f

    def gcl_q(h):
        return gcl_int8(p, h, d2, nm, em, act, 100.0)

    rows = {}
    outs = {}
    for name, fn in (('fp32', gcl_ref(jnp.float32)),
                     ('bf16', gcl_ref(jnp.bfloat16)),
                     ('int8', gcl_q)):
        run = chain(fn)
        out = run(h0)
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(h0))
            times.append((time.perf_counter() - t0) / (L * steps))
        rows[name] = float(np.median(times))
        outs[name] = np.asarray(fn(h0))
    err = {k: float(np.abs(outs[k] - outs['fp32']).max()
                    / (np.abs(outs['fp32']).max() + 1e-12))
           for k in ('bf16', 'int8')}
    print(f'{label}: ' + '  '.join(f'{k}={v*1e3:.3f} ms/GCL'
                                   for k, v in rows.items())
          + f'  rel_err bf16={err["bf16"]:.4f} int8={err["int8"]:.4f}',
          flush=True)
    return {'shape': label, 'ms_per_gcl': {k: v * 1e3 for k, v in rows.items()},
            'rel_err': err}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--steps', type=int, default=10)
    args = ap.parse_args()
    import jax
    print(f'# device: {jax.devices()[0].device_kind}')
    results = [
        run_shape('zinc B=256 N=32', 256, 32, 8, args.steps),
        run_shape('pocket B=32 N=256', 32, 256, 6, max(args.steps // 2, 2)),
    ]
    print(json.dumps(results))


if __name__ == '__main__':
    main()
