#!/usr/bin/env python
"""Measure the serving subsystem (sample/service.py) on the real chip.

Two questions a deployment cares about:

  1. **Saturated throughput tax** — when requests flood in, the service
     co-batches them into full chain calls; how many rows/s does it sustain
     vs the same sampler driven offline with pre-assembled full batches?
     The gap is the batching/collate/routing overhead.
  2. **Single-request latency** — one idle-arrival request pays the batching
     window + one (wrap-padded) chain; how far is that from the raw chain
     time?

Runs on the bundled zinc demo weights at the flagship serving shape
(B=128-row chains, N=32 bucket, T respaced to 50 — the measured
quality-flat operating point) and writes docs/serving_throughput.json.

    nohup python scripts/bench_service.py --out docs/serving_throughput.json &
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--params', default='examples/params/zinc_h256.npz')
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--bucket', type=int, default=32)
    p.add_argument('--steps', type=int, default=50)
    p.add_argument('--waves', type=int, default=4,
                   help='full-batch waves for the saturated measurement')
    p.add_argument('--n-samples', type=int, default=8,
                   help='rows per request (batch/n_samples requests per wave)')
    p.add_argument('--fast-steps', type=int, default=10,
                   help='per-request fast-lane chain length (ddim)')
    p.add_argument('--out', default='docs/serving_throughput.json')
    args = p.parse_args()

    import numpy as np
    import jax
    from difflinker_tpu.cli import common
    from difflinker_tpu.demo import load_demo_model
    from difflinker_tpu.data.collate import collate
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.sample.service import SamplingService

    common.enable_compilation_cache()
    cfg, params, _ = load_demo_model(args.params)
    cfg = common.apply_respacing(cfg, argparse.Namespace(
        steps=args.steps, respace_mode='subsequence', resample_steps=1,
        noise_scale=1.0))

    rng = np.random.default_rng(0)

    def raw_sample(seed):
        n = int(rng.integers(8, 13))
        r = np.random.default_rng(seed)
        return {
            'uuid': seed, 'name': f'req{seed}',
            'positions': (r.standard_normal((n, 3)) * 2).astype(np.float32),
            'one_hot': np.eye(cfg.model.in_node_nf, dtype=np.float32)[
                r.integers(0, cfg.model.in_node_nf, n)],
            'charges': np.full(n, 6, np.float32),
            'anchors': np.eye(n, dtype=np.float32)[[0]].reshape(n)
                       + np.eye(n, dtype=np.float32)[[n - 1]].reshape(n),
            'fragment_mask': np.ones(n, np.float32),
            'linker_mask': np.zeros(n, np.float32),
            'num_atoms': n,
        }

    n_req = args.batch // args.n_samples
    requests = [raw_sample(i) for i in range(n_req)]
    sizes = {i: int(rng.integers(3, 9)) for i in range(n_req)}

    # --- offline reference: the same rows as ONE pre-assembled batch -------
    sampler = LinkerSampler(cfg, params, pad_batch_to=args.batch,
                            pad_nodes_to=args.bucket)
    flat = [dict(requests[i]) for i in range(n_req)
            for _ in range(args.n_samples)]
    flat_sizes = np.asarray([sizes[i] for i in range(n_req)
                             for _ in range(args.n_samples)], np.int32)
    batch = collate(flat)
    t0 = time.monotonic()
    sampler.sample(batch, jax.random.PRNGKey(0),
                   size_spec=lambda _b: flat_sizes)
    compile_s = time.monotonic() - t0
    offline = []
    for w in range(args.waves):
        t0 = time.monotonic()
        out = sampler.sample(batch, jax.random.PRNGKey(w + 1),
                             size_spec=lambda _b: flat_sizes)
        offline.append(time.monotonic() - t0)
        assert not out['nan_flag'].any()
    offline_s = min(offline)
    offline_rows_s = args.batch / offline_s

    # --- saturated service: the same rows as concurrent requests -----------
    svc = SamplingService(cfg, params, batch_size=args.batch,
                          max_wait_s=0.2, node_buckets=(args.bucket,))
    # warm the service's own sampler (first call pays compile/load)
    svc.generate(requests[0], n_samples=args.n_samples,
                 size_spec=sizes[0])
    waves = []
    for w in range(args.waves):
        t0 = time.monotonic()
        futs = [svc.submit(requests[i], n_samples=args.n_samples,
                           size_spec=sizes[i]) for i in range(n_req)]
        outs = [f.result(timeout=600) for f in futs]
        waves.append(time.monotonic() - t0)
        assert not any(o['nan_flag'].any() for o in outs)
    served_s = min(waves)
    served_rows_s = args.batch / served_s
    n_batches = svc.stats['batches']

    # --- single-request latency --------------------------------------------
    lat = []
    for i in range(5):
        t0 = time.monotonic()
        svc.generate(requests[i % n_req], n_samples=args.n_samples,
                     size_spec=sizes[i % n_req])
        lat.append(time.monotonic() - t0)

    # --- per-request fast lane (steps/sampler override, VERDICT r4 item 6) --
    # a latency-sensitive client passes steps=<short>/sampler='ddim' on its
    # OWN requests; the first pays that variant's compile, the rest are warm
    t0 = time.monotonic()
    svc.generate(requests[0], n_samples=args.n_samples, size_spec=sizes[0],
                 steps=args.fast_steps, sampler='ddim')
    fast_compile_s = time.monotonic() - t0
    fast_lat = []
    for i in range(5):
        t0 = time.monotonic()
        svc.generate(requests[i % n_req], n_samples=args.n_samples,
                     size_spec=sizes[i % n_req],
                     steps=args.fast_steps, sampler='ddim')
        fast_lat.append(time.monotonic() - t0)

    # --- low-temperature fast lane (round 5): ancestral + noise_scale 0.7
    # at the same step count — the QUALITY-recommended short chain
    # (BASELINE.md round 5: at T=10 ancestral/0.7 scores 67.2% V+C where
    # ddim scores 21.5% on the same model)
    t0 = time.monotonic()
    svc.generate(requests[0], n_samples=args.n_samples, size_spec=sizes[0],
                 steps=args.fast_steps, noise_scale=0.7)
    cold_compile_s = time.monotonic() - t0
    cold_lat = []
    for i in range(5):
        t0 = time.monotonic()
        svc.generate(requests[i % n_req], n_samples=args.n_samples,
                     size_spec=sizes[i % n_req],
                     steps=args.fast_steps, noise_scale=0.7)
        cold_lat.append(time.monotonic() - t0)
    percentiles = svc.latency_percentiles()
    svc.close()

    result = {
        'shape': {'batch': args.batch, 'bucket': args.bucket,
                  'steps': args.steps, 'n_requests_per_wave': n_req,
                  'n_samples_per_request': args.n_samples},
        'first_call_compile_s': round(compile_s, 2),
        'offline_rows_per_s': round(offline_rows_s, 2),
        'served_rows_per_s': round(served_rows_s, 2),
        'serving_efficiency': round(served_rows_s / offline_rows_s, 4),
        'offline_wave_s': [round(t, 3) for t in offline],
        'served_wave_s': [round(t, 3) for t in waves],
        'service_chain_calls_total': n_batches,
        'single_request_latency_s': {
            'min': round(min(lat), 3), 'max': round(max(lat), 3),
            'mean': round(sum(lat) / len(lat), 3)},
        'single_request_vs_offline_chain':
            round(min(lat) / offline_s, 3),
        'service_latency_percentiles': percentiles,
        'fast_lane': {
            'steps': args.fast_steps, 'sampler': 'ddim',
            'first_request_compile_s': round(fast_compile_s, 2),
            'warm_latency_s': {
                'min': round(min(fast_lat), 3), 'max': round(max(fast_lat), 3),
                'mean': round(sum(fast_lat) / len(fast_lat), 3)},
            'speedup_vs_default_lane':
                round(min(lat) / min(fast_lat), 2),
        },
        'fast_lane_lowtemp': {
            'steps': args.fast_steps, 'sampler': 'ancestral',
            'noise_scale': 0.7,
            'first_request_compile_s': round(cold_compile_s, 2),
            'warm_latency_s': {
                'min': round(min(cold_lat), 3), 'max': round(max(cold_lat), 3),
                'mean': round(sum(cold_lat) / len(cold_lat), 3)},
            'speedup_vs_default_lane':
                round(min(lat) / min(cold_lat), 2),
        },
    }
    print(json.dumps(result, indent=2))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)


if __name__ == '__main__':
    main()
