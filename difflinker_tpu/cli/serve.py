"""JSON-lines linker-generation server (the serving counterpart of
cli.generate — same model loading and output protocol, but long-lived:
warm compiled chains, dynamic request batching, results streamed back as
they finish).

Protocol — one JSON object per stdin line:

    {"fragments": "frags.sdf",     # sdf/mol/xyz fragment file (required)
     "n_samples": 5,               # samplings of this fragment set
     "linker_size": "prior",      # int | "lo,hi" | "prior" | "ground_truth"
     "anchors": "1,4",            # optional 1-based anchor indices
     "pocket": "pocket.pdb",      # optional pre-cut pocket PDB, or
     "protein": "prot.pdb",       # optional full protein PDB (6Å extraction)
     "backbone": false,            # keep only N/CA/C/O pocket atoms
     "steps": 50,                  # optional per-request chain length
                                   # (exact-subsequence respacing — the fast
                                   # lane; first use compiles, then warm)
     "sampler": "ddim",           # optional per-request integrator override
     "noise_scale": 0.7,           # optional low-temperature override
                                   # (ancestral only; BASELINE.md round 5:
                                   # steps=50 + 0.5 beats the full chain)
     "out": "output"}              # output dir (default --out)

Pocket-conditioned serving (a pocket model + "pocket"/"protein" requests)
writes outputs in the protein frame with the pocket rows stripped — the
same conventions as cli.generate_with_protein / _with_pocket.

One JSON line per request on stdout, in submission order:

    {"name": ..., "files": ["out/<name>_r<request#>_0.sdf", ...], "nan": 0,
     "linker_sizes": [...], "seconds": 1.2}

Example:

    cat requests.jsonl | python -m difflinker_tpu.cli.serve --run RUN_DIR
    # or interactively: type one request per line, read one result per line

Requests arriving within --max-wait-ms of each other co-batch into one
chain call per node bucket (sample/service.py); a request needing more
nodes than the largest --bucket runs at its natural shape.
"""
from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time

from difflinker_tpu.cli import common
from difflinker_tpu.cli.sample import load_model, parse_size_spec


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--run', type=str)
    p.add_argument('--ckpt', type=str)
    p.add_argument('--params', type=str,
                   help='bundled demo-weights .npz (examples/params/*.npz)')
    p.add_argument('--size-model', type=str, default=None,
                   help='SizeClassifier .ckpt used when a request omits '
                        'linker_size')
    p.add_argument('--out', type=str, default='output',
                   help='default output dir (overridable per request)')
    p.add_argument('--batch-size', type=int, default=32,
                   help='rows per compiled chain call')
    p.add_argument('--max-wait-ms', type=float, default=50.0,
                   help='batching window after the first queued request')
    p.add_argument('--buckets', type=str, default='32,64,128',
                   help='comma-separated padded node sizes (one warm chain '
                        'each)')
    p.add_argument('--seed', type=int, default=0)
    common.add_respacing_args(p)
    common.add_mesh_args(p)
    return p


def _default_size_spec(args):
    if args.size_model:
        from difflinker_tpu.cli.sample import load_size_spec
        return load_size_spec(args.size_model)
    return 'prior'


def _write_outputs(req_meta, result, is_geom):
    from difflinker_tpu.io.xyz import save_xyz_file, xyz_to_sdf
    out_dir = req_meta['out']
    os.makedirs(out_dir, exist_ok=True)
    node_mask, positions = result['node_mask'], result['positions']
    if req_meta.get('center') is not None:
        # pocket request: back to the protein frame, pocket rows stripped
        # (sample.py:141-164 / generate_with_protein.py conventions)
        node_mask = node_mask - result['pocket_mask']
        positions = positions + req_meta['center']
    n = positions.shape[0]
    names = [f'{req_meta["prefix"]}_{i}' for i in range(n)]
    paths = save_xyz_file(out_dir, result['one_hot'], positions,
                          node_mask, names=names, is_geom=is_geom)
    files = []
    for p in paths:
        xyz_to_sdf(p, p[:-4] + '.sdf')
        files.append(p[:-4] + '.sdf')
    return files


def main(argv=None):
    args = build_argparser().parse_args(argv)
    common.enable_compilation_cache()
    cfg, params = load_model(args)
    cfg = common.apply_respacing(cfg, args)
    is_geom = cfg.data.is_geom

    from difflinker_tpu.sample.service import (SamplingService,
                                               pocket_sample_from_files,
                                               sample_from_file)
    service = SamplingService(
        cfg, params, batch_size=args.batch_size,
        max_wait_s=args.max_wait_ms / 1000.0,
        node_buckets=[int(b) for b in args.buckets.split(',')],
        mesh=common.build_mesh(args), seed=args.seed)
    default_spec = _default_size_spec(args)

    results: queue.Queue = queue.Queue()
    stop = object()

    def writer():
        """Single owner of stdout: prints one JSON line per request, in
        submission order (bad requests included — they ride the same queue,
        so lines never interleave or reorder)."""
        while True:
            item = results.get()
            if item is stop:
                return
            meta, fut, t0 = item
            try:
                if fut is None:  # request failed before submission
                    raise ValueError(meta['error'])
                res = fut.result()
                files = _write_outputs(meta, res, is_geom)
                print(json.dumps({
                    'name': meta['name'], 'files': files,
                    'nan': int(res['nan_flag'].sum()),
                    'linker_sizes': [int(s) for s in res['linker_sizes']],
                    'seconds': round(time.monotonic() - t0, 3)}), flush=True)
            except Exception as e:
                print(json.dumps({'name': meta.get('name'),
                                  'error': str(e)}), flush=True)

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()

    n_requests = 0
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            anchors = [int(a) for a in str(req['anchors']).split(',')
                       ] if req.get('anchors') else None
            center = None
            if req.get('pocket') or req.get('protein'):
                sample, center = pocket_sample_from_files(
                    req['fragments'], pocket=req.get('pocket'),
                    protein=req.get('protein'),
                    backbone=bool(req.get('backbone')),
                    anchors=anchors, is_geom=is_geom)
            else:
                sample = sample_from_file(req['fragments'], is_geom=is_geom,
                                          anchors=anchors)
            spec = (parse_size_spec(str(req['linker_size']))
                    if 'linker_size' in req else default_spec)
            fut = service.submit(
                sample, n_samples=int(req.get('n_samples', 5)),
                size_spec=spec,
                # `is not None`, not truthiness: steps=0 / noise_scale=0.0
                # must reach submit()'s validation and come back as an error
                # line, not be silently swapped for the service defaults
                steps=(int(req['steps'])
                       if req.get('steps') is not None else None),
                sampler=req.get('sampler'),
                noise_scale=(float(req['noise_scale'])
                             if req.get('noise_scale') is not None else None))
            # r<N> prefix keeps outputs of requests sharing a fragment
            # basename (and out dir) from overwriting each other
            meta = {'name': sample['name'],
                    'prefix': f'{sample["name"]}_r{n_requests}',
                    'out': req.get('out', args.out), 'center': center}
            results.put((meta, fut, time.monotonic()))
        except Exception as e:
            results.put(({'name': None, 'error': f'bad request: {e}'},
                         None, time.monotonic()))
        n_requests += 1

    results.put(stop)
    wt.join()
    service.close()
    s = service.stats
    lat = service.latency_percentiles()
    # stdout carries the JSON result protocol — the summary goes to stderr
    print(f'served {n_requests} requests, {s["rows"]} rows in '
          f'{s["batches"]} chain calls ({s["padded_rows"]} padded rows, '
          f'{s["chain_seconds"]:.1f}s on device; latency '
          f'p50={lat.get("p50_s", "-")}s p95={lat.get("p95_s", "-")}s)',
          file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
