#!/usr/bin/env python
"""Measure the overlapped eval pipeline (train/evaluation.py) on the real chip.

The reference's in-training eval alternates device chains with host chemistry
strictly serially (src/lightning.py:322-403). sample_and_analyze(overlap=True)
runs the per-result chemistry on a worker thread while the main thread blocks
on the next device chain, so eval wall-clock approaches
max(device, chemistry) instead of their sum — the host-device pipeline
balance called out as hard part 7 in SURVEY.md §7.

Times BOTH modes on the flagship ZINC shape (8x128 EGNN, T=500 chains,
B=128, N=32) with ONE shared sampler (the chain program compiles once) and
writes docs/eval_overlap.json.

    nohup python scripts/bench_eval_overlap.py --out docs/eval_overlap.json &
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--n-batches', type=int, default=4)
    p.add_argument('--n-samples', type=int, default=2)
    p.add_argument('--timesteps', type=int, default=500)
    p.add_argument('--hidden', type=int, default=128)
    p.add_argument('--layers', type=int, default=8)
    p.add_argument('--out', default=None)
    args = p.parse_args()

    import jax
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)
    from difflinker_tpu.data.datasets import synthetic_dataset
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.evaluation import sample_and_analyze
    from difflinker_tpu.train.trainer import Trainer
    try:
        from difflinker_tpu.cli.common import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass

    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2,
                          hidden_nf=args.hidden, n_layers=args.layers,
                          norm_constant=1e-6, dtype='bfloat16'),
        diffusion=DiffusionConfig(timesteps=args.timesteps),
        data=DataConfig(),
        train=TrainConfig(batch_size=args.batch))
    trainer = Trainer(cfg)
    params = trainer.edm.init_params(jax.random.PRNGKey(0))
    n_mols = args.batch * args.n_batches
    ds = synthetic_dataset(n_mols, seed=0)
    # one shape -> one compiled chain serves every call in both modes
    n_pad = max(s['positions'].shape[0] for s in ds.samples) + 12
    sampler = LinkerSampler(cfg, params, trainer.edm,
                            pad_batch_to=args.batch, pad_nodes_to=n_pad)

    def run(overlap):
        t0 = time.perf_counter()
        m = sample_and_analyze(
            sampler, ds.iter_batches(args.batch, group_by_bucket=False),
            jax.random.PRNGKey(1), n_samples=args.n_samples,
            overlap=overlap)
        return time.perf_counter() - t0, m

    # warmup: compile + load the chain program once (tunneled load dominates)
    t_compile, _ = run(False)
    print(f'warmup (incl. chain compile/load): {t_compile:.1f}s', flush=True)

    t_serial, m_serial = run(False)
    t_overlap, m_overlap = run(True)
    for k, v in m_serial.items():
        assert abs(m_overlap[k] - v) < 1e-12, (k, v, m_overlap[k])

    # component anatomy: one device call vs the in-loop chemistry for it —
    # shows how much of the serial loop overlap can hide
    from difflinker_tpu.train.evaluation import _chem_for_result
    from difflinker_tpu.chem.molgraph import build_molecules
    batch = next(ds.iter_batches(args.batch, group_by_bucket=False))
    t0 = time.perf_counter()
    out = sampler.sample(batch, jax.random.PRNGKey(5))
    t_device = time.perf_counter() - t0
    true_b = build_molecules(batch['one_hot'], batch['positions'],
                             batch['atom_mask'], False)
    frag_b = build_molecules(batch['one_hot'], batch['positions'],
                             batch['fragment_mask'], False)
    t0 = time.perf_counter()
    _chem_for_result(out, true_b, frag_b, False, False)
    t_chem = time.perf_counter() - t0

    calls = args.n_batches * args.n_samples
    report = {
        'shape': {'batch': args.batch, 'n_batches': args.n_batches,
                  'n_samples_per_input': args.n_samples,
                  'timesteps': args.timesteps,
                  'model': f'{args.layers}x{args.hidden} bf16'},
        'serial_s': round(t_serial, 2),
        'overlap_s': round(t_overlap, 2),
        'speedup': round(t_serial / t_overlap, 3),
        'linkers_per_sec_serial': round(calls * args.batch / t_serial, 1),
        'linkers_per_sec_overlap': round(calls * args.batch / t_overlap, 1),
        'per_call_device_s': round(t_device, 3),
        'per_call_chem_s': round(t_chem, 3),
        'chem_fraction_of_loop': round(t_chem / (t_chem + t_device), 4),
        'metrics_identical': True,
        'backend': str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
