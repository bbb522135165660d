#!/usr/bin/env python
"""Measured study: does a wider hidden dimension use the chip better?

The dense EGNN at H=128 runs at ~25-40% MFU because the per-edge elementwise
chain is VPU/HBM-bound (docs/ARCHITECTURE.md §5). The edge MLP's dominant
matmul is (edges, H) @ (H, H): arithmetic intensity grows linearly with H, so
a wider model should climb toward the MXU roofline. This quantifies that —
per-GCL time, TFLOP/s, and MFU at H ∈ {128, 256, 512} — to answer "if a
future model family went wider (the reference fixes nf=128,
configs/zinc_difflinker.yml), would the TPU reward it?"

    python scripts/bench_width_study.py [--steps 20]

Verdict recorded in docs/ARCHITECTURE.md §5.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_shape(label, B, N, L, H, steps, dtype_name):
    import jax
    import jax.numpy as jnp
    from difflinker_tpu.models import egnn as egnn_lib
    from difflinker_tpu.models.egnn import activation_fn, init_gcl
    from difflinker_tpu.ops.flops import gcl_flops, peak_flops
    from difflinker_tpu.ops.geometry import fc_edge_mask

    dtype = jnp.bfloat16 if dtype_name == 'bf16' else jnp.float32
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((B, N, H)).astype(np.float32))
    d2 = jnp.asarray((rng.standard_normal((B, N, N, 2)) ** 2).astype(np.float32))
    nm = jnp.ones((B, N, 1), jnp.float32)
    em = jnp.abs(fc_edge_mask(nm))
    p, _ = init_gcl(jax.random.PRNGKey(0), H, H, H, edges_in_d=2)
    act = activation_fn('silu')
    pp = jax.tree.map(lambda a: a.astype(dtype), p)
    d2c, nmc, emc = d2.astype(dtype), nm.astype(dtype), em.astype(dtype)

    @jax.jit
    def chain(h):
        def body(h, _):
            out, _ = egnn_lib.gcl_apply(
                pp, h, d2c, nmc, emc, act=act, normalization_factor=100.0,
                aggregation_method='sum', attention=False)
            return out, ()
        out, _ = jax.lax.scan(body, h.astype(dtype), jnp.arange(L * steps))
        return out

    jax.block_until_ready(chain(h0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(h0))
        times.append((time.perf_counter() - t0) / (L * steps))
    t = float(np.median(times))
    fl = gcl_flops(B, N, H)
    peak = peak_flops(jax.devices()[0].device_kind,
                      'bfloat16' if dtype_name == 'bf16' else 'float32')
    tflops = fl / t / 1e12
    mfu = fl / t / peak if peak else float('nan')
    print(f'{label} H={H} {dtype_name}: {t*1e3:.3f} ms/GCL  '
          f'{tflops:.1f} TFLOP/s  MFU={mfu:.1%}', flush=True)
    return {'shape': label, 'H': H, 'dtype': dtype_name, 'ms_per_gcl': t * 1e3,
            'tflops': round(tflops, 1), 'mfu': round(mfu, 4)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--steps', type=int, default=20)
    args = ap.parse_args()
    import jax
    print(f'# device: {jax.devices()[0].device_kind}')
    results = []
    for H in (128, 256, 512):
        for dt in ('fp32', 'bf16'):
            results.append(run_shape('zinc B=256 N=32', 256, 32, 8, H,
                                     args.steps, dt))
    for H in (128, 256):
        results.append(run_shape('pocket B=32 N=256', 32, 256, 6, H,
                                 max(args.steps // 2, 2), 'bf16'))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
