#!/usr/bin/env python
"""Training-path benchmark at pocket shapes: remat vs no-remat, fp32/bf16
(VERDICT r1 next-step #5).

Measures the full jitted train step (context + CoM + EDM loss + grads +
AdamW) in mol/s/chip, and isolates the remat decision with a grad-through-
dynamics microbench at (B=32, N=256) and (B=16, N=512). Per-block
jax.checkpoint trades one extra forward for not holding every block's
(B, N, N, H) edge activations for the backward pass.

    python scripts/bench_train_pocket.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_grad(cfg, B, N, remat, steps=8):
    import jax
    import jax.numpy as jnp
    from difflinker_tpu.models.dynamics import dynamics_apply, init_dynamics
    from scripts.bench_kernels import build_inputs

    xh, node_mask, link, em, ctx = build_inputs(
        B, N, cfg.in_node_nf, cfg.context_node_nf, cfg.graph_type.value)
    params = init_dynamics(jax.random.PRNGKey(0), cfg)
    args = [jnp.asarray(a) if a is not None else None
            for a in (xh, node_mask, link, em, ctx)]

    def loss(p, xh_c, t):
        eps, _ = dynamics_apply(p, t, xh_c, args[1], args[2], args[3],
                                args[4], cfg=cfg, remat=remat)
        return jnp.mean(eps ** 2)

    def one(carry, t):
        p_dummy, xh_c = carry
        g = jax.grad(loss)(params, xh_c, t)
        leaf = jax.tree.leaves(g)[0]
        return (p_dummy, xh_c + 1e-6 * jnp.mean(leaf)), ()

    @jax.jit
    def run(xh0):
        ts = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1) * jnp.ones((1, B, 1))
        out, _ = jax.lax.scan(one, (0.0, xh0), ts)
        return out

    out = run(args[0])
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(args[0]))
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times))


def bench_full_train_step(dtype, B=32, N=256, steps=8):
    """mol/s/chip for the complete pocket train step (Trainer path)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, GraphType,
                                       ModelConfig, TrainConfig)
    from difflinker_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=128,
                          n_layers=6, inv_sublayers=2, norm_constant=1e-6,
                          graph_type=GraphType.A4, dtype=dtype),
        diffusion=DiffusionConfig(timesteps=500),
        data=DataConfig(family='moad', pocket_mode='full'),
        train=TrainConfig(lr=2e-4, batch_size=B, center_of_mass='anchors'))
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    from scripts.bench_kernels import build_inputs
    xh, node_mask, link, em, ctx = build_inputs(B, N, 9, 3, '4A')
    n_frag = max(N // 4, 2)
    frag_only = np.zeros((B, N, 1), np.float32)
    frag_only[:, :n_frag // 2] = 1
    pocket = np.zeros((B, N, 1), np.float32)
    pocket[:, n_frag // 2:n_frag] = 1
    batch = {
        'positions': xh[..., :3], 'one_hot': xh[..., 3:],
        'atom_mask': node_mask, 'fragment_mask': frag_only + pocket,
        'fragment_only_mask': frag_only, 'pocket_mask': pocket,
        'linker_mask': link,
        'anchors': np.zeros((B, N, 1), np.float32)}
    batch['anchors'][:, [0, 1]] = 1
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def body(carry, i):
        st = carry
        st, metrics = trainer.train_step(st, jb, jax.random.fold_in(
            jax.random.PRNGKey(1), i), jnp.inf)
        return st, metrics['loss']

    @jax.jit
    def run(st):
        return jax.lax.scan(body, st, jnp.arange(steps))

    st, losses = run(state)
    jax.block_until_ready(losses)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, losses = run(state)
        jax.block_until_ready(losses)
        times.append((time.perf_counter() - t0) / steps)
    dt = float(np.median(times))
    return B / dt, dt


def main():
    import jax
    from difflinker_tpu.config import GraphType, ModelConfig

    print(f'# device: {jax.devices()[0].device_kind}')
    rows = []
    for B, N in ((32, 256), (16, 512)):
        for dtype in ('float32', 'bfloat16'):
            cfg = ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=128,
                              n_layers=6, inv_sublayers=2, norm_constant=1e-6,
                              graph_type=GraphType.A4, dtype=dtype)
            for remat in (True, False):
                try:
                    dt = bench_grad(cfg, B, N, remat)
                    note = ''
                except Exception as e:
                    dt, note = float('nan'), f'{type(e).__name__}'
                rows.append(dict(B=B, N=N, dtype=dtype, remat=remat,
                                 t_grad_ms=dt * 1e3, note=note))
                print(f'B={B:3d} N={N:4d} {dtype:9s} remat={str(remat):5s} '
                      f'{dt*1e3:9.2f} ms/grad {note}')
    for dtype in ('float32', 'bfloat16'):
        mols, dt = bench_full_train_step(dtype)
        rows.append(dict(kind='full_train_step', dtype=dtype, B=32, N=256,
                         mol_per_s=mols, t_step_ms=dt * 1e3))
        print(f'full pocket train step (B=32, N=256, {dtype}): '
              f'{mols:.1f} mol/s/chip ({dt*1e3:.1f} ms/step)')
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
