#!/usr/bin/env python
"""Headline benchmark: linker-sampling throughput at T=500 on one chip.

Runs the flagship ZINC-shaped model (8 layers, nf=128 — configs/zinc_difflinker.yml)
through the full jitted reverse-diffusion chain and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: the PyTorch reference (igashov/DiffLinker) measured on this host
(torch CPU, single core, B=128, N=32, T=500 extrapolated from per-step time):
0.0197 linkers/s. No GPU exists in this container and the repo publishes no
numbers (BASELINE.md), so same-host-measured is the only honest denominator.
"""
import json
import sys
import time

import numpy as np

# measured via scripts/measure_reference_baseline.py on this host (1 CPU core)
REFERENCE_LINKERS_PER_SEC = 0.0197

# flagship ZINC shapes
BATCH = 256
N_NODES = 32
T = 500
N_FRAG = 14


def main():
    import jax
    import jax.numpy as jnp

    from difflinker_tpu.config import ModelConfig, DiffusionConfig
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.ops.geometry import fc_edge_mask

    # bf16-mixed: invariant-feature MLPs on the MXU in bf16, all geometry /
    # coordinates / diffusion algebra float32 (0.7% per-forward rel err vs
    # fp32; parity tests cover fp32 — see BASELINE.md)
    mcfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=128,
                       n_layers=8, inv_sublayers=2, norm_constant=1e-6,
                       dtype='bfloat16')
    dcfg = DiffusionConfig(timesteps=T)
    edm = make_edm(mcfg, dcfg)
    params = edm.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    node_mask = np.ones((BATCH, N_NODES, 1), np.float32)
    frag = np.zeros((BATCH, N_NODES, 1), np.float32)
    frag[:, :N_FRAG] = 1
    link = node_mask - frag
    x = (rng.standard_normal((BATCH, N_NODES, 3)).astype(np.float32) * 2)
    h = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (BATCH, N_NODES))]
    anchors = np.zeros((BATCH, N_NODES, 1), np.float32)
    anchors[:, [2, N_FRAG - 1]] = 1
    ctx = np.concatenate([anchors, frag], -1)
    em = fc_edge_mask(jnp.asarray(node_mask))

    args = [jnp.asarray(a) for a in (x, h, node_mask, frag, link)] + [em, jnp.asarray(ctx)]
    fn = jax.jit(lambda p, k: edm.sample_chain(p, k, *args))

    # warm-up/compile
    out = fn(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    linkers_per_sec = BATCH / dt

    print(json.dumps({
        'metric': f'linker sampling throughput (T={T}, B={BATCH}, N={N_NODES}, '
                  f'ZINC 8x128 EGNN, {jax.devices()[0].device_kind})',
        'value': round(linkers_per_sec, 2),
        'unit': 'linkers/sec/chip',
        'vs_baseline': round(linkers_per_sec / REFERENCE_LINKERS_PER_SEC, 1),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
