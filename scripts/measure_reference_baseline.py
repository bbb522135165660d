#!/usr/bin/env python
"""Measure the PyTorch reference's linker-sampling throughput on this host.

Runs the reference EDM.sample_chain (random-init weights — throughput is
weight-independent) at the ZINC flagship shape with a short chain and
extrapolates linearly to T=500 (sampling cost is exactly O(T) EGNN forwards,
reference train_difflinker.py:138). The resulting number is the
`vs_baseline` denominator in bench.py and is recorded in BASELINE.md.
"""
import sys
import time

sys.path.insert(0, '/root/reference')

import numpy as np
import torch

from src.egnn import Dynamics
from src.edm import EDM

B, N, NF, T_MEAS, T_TARGET = 128, 32, 8, 4, 500


def main():
    torch.set_num_threads(torch.get_num_threads())
    torch.manual_seed(0)
    dyn = Dynamics(n_dims=3, in_node_nf=NF, context_node_nf=2, hidden_nf=128,
                   activation=torch.nn.SiLU(), n_layers=8, attention=False,
                   condition_time=True, tanh=False, norm_constant=1e-6,
                   inv_sublayers=2, sin_embedding=False,
                   normalization_factor=100, aggregation_method='sum',
                   model='egnn_dynamics').eval()
    edm = EDM(dynamics=dyn, in_node_nf=NF, n_dims=3, timesteps=T_MEAS,
              noise_schedule='polynomial_2', noise_precision=1e-5,
              loss_type='l2', norm_values=(1, 4, 10),
              norm_biases=(None, 0, 0)).eval()

    rng = np.random.default_rng(0)
    node_mask = torch.ones(B, N, 1)
    frag = torch.zeros(B, N, 1)
    frag[:, :14] = 1
    link = node_mask - frag
    x = torch.tensor(rng.standard_normal((B, N, 3)).astype(np.float32)) * 2
    h = torch.tensor(np.eye(NF, dtype=np.float32)[rng.integers(0, NF, (B, N))])
    anchors = torch.zeros(B, N, 1)
    anchors[:, 2] = 1
    anchors[:, 10] = 1
    ctx = torch.cat([anchors, frag], -1)
    am = node_mask[:, :, 0]
    em = (am[:, None, :] * am[:, :, None]
          * ~torch.eye(N, dtype=torch.int8)[None]).view(B * N * N, 1)

    with torch.no_grad():
        edm.sample_chain(x, h, node_mask, frag, link, em, ctx, keep_frames=1)
        t0 = time.time()
        edm.sample_chain(x, h, node_mask, frag, link, em, ctx, keep_frames=1)
        dt = time.time() - t0
    per_step = dt / (T_MEAS + 1)
    t_full = per_step * (T_TARGET + 1)
    print(f'per-step {per_step * 1000:.0f} ms; extrapolated T={T_TARGET} '
          f'chain for B={B}: {t_full:.1f}s -> {B / t_full:.4f} linkers/s '
          f'({torch.get_num_threads()} torch threads)')


if __name__ == '__main__':
    main()
