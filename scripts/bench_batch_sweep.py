#!/usr/bin/env python
"""Explain the B=128->1024 sampling-throughput plateau (BASELINE.md:58,
VERDICT r1 next-step #2): per-forward time and achieved bandwidth/TFLOPs as
the batch grows at the ZINC shape.

    python scripts/bench_batch_sweep.py [--dtype float32] [--steps 10]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--dtypes', default='float32,bfloat16')
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--batches', default='64,128,256,512,1024')
    args = ap.parse_args()

    import jax
    from difflinker_tpu.config import ModelConfig
    from difflinker_tpu.ops import flops as flops_lib
    from scripts.bench_kernels import bench_forward

    kind = jax.devices()[0].device_kind
    N = 32
    print(f'# ZINC shape N={N}, 8x2 layers, nf=128; {kind}')
    rows = []
    for dtype in args.dtypes.split(','):
        peak = flops_lib.peak_flops(kind, dtype)
        for B in [int(b) for b in args.batches.split(',')]:
            cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=128,
                              n_layers=8, inv_sublayers=2, norm_constant=1e-6,
                              dtype=dtype)
            dt = bench_forward(cfg, B, N, args.steps)
            fl = flops_lib.egnn_forward_flops(B, N, cfg)
            # bytes of (B,N,N,H) edge activations per GCL pass (2 tensors,
            # ~2.5 passes x 24 message-passing subunits), the dominant traffic
            itemsize = 2 if dtype == 'bfloat16' else 4
            edge_bytes = B * N * N * 128 * itemsize
            rows.append(dict(
                dtype=dtype, B=B, t_fwd_ms=dt * 1e3,
                linkers_per_s_T500=B / (dt * 501),
                tflops=fl / dt / 1e12,
                mfu=fl / dt / peak if peak else None,
                edge_gb_per_fwd=edge_bytes * 2.5 * 24 / 1e9,
                achieved_gbps=edge_bytes * 2.5 * 24 / dt / 1e9))
            r = rows[-1]
            print(f"{dtype:9s} B={B:5d}  {r['t_fwd_ms']:8.3f} ms/fwd  "
                  f"{r['linkers_per_s_T500']:7.2f} l/s@T500  "
                  f"{r['tflops']:6.2f} TFLOP/s  MFU {r['mfu']*100:5.1f}%  "
                  f"~{r['achieved_gbps']:5.0f} GB/s est. edge traffic")
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
