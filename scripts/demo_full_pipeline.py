#!/usr/bin/env python
"""Full-pipeline showcase at realistic scale, through the real CLI mains:

    trained model (.npz from demo_learning --save-params)
      -> packaged as a native run dir
    val set written as a reference-format .pt (torch pickle — exercises the
      same loader the released zinc_final_*.pt artifacts would use)
      -> cli.sample  (--steps respacing, batch-padded buckets, uuid dirs)
      -> cli.run_obabel (xyz -> sdf)
      -> cli.reformat (largest component, .smi dataset)
      -> cli.compute_metrics (RDKit branch) or the native aggregate

Mirrors the reference user journey sample.py:84-164 ->
reformat_data_obabel.py:21-138 -> compute_metrics.py:443-451 at a scale the
tiny tests/test_cli_pipeline.py doesn't reach, and records per-stage wall
time (the TPU/CPU pipeline balance).

    python scripts/demo_full_pipeline.py --params /tmp/respace_model.npz \
        --inputs 256 --n-samples 5 --steps 100 --out docs/pipeline_showcase.json
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def package_run_dir(params_path: str, run_dir: str):
    """Materialise (config.json + orbax checkpoint) from a saved .npz so the
    sampling CLIs can load it like any trained run."""
    import jax
    from difflinker_tpu.demo import recipe_config
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.io import checkpoints as ckpt_lib

    with open(params_path + '.config.json') as f:
        mc = json.load(f)
    # recipe_config is the single meta->recipe mapping (difflinker_tpu/demo.py)
    # so pocket/multifrag/vlb artifacts package with their true recipe too
    cfg = recipe_config(mc, exp_name='pipeline_showcase')
    params_like = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(0))
    params = ckpt_lib.load_params_npz(params_path, params_like)
    ckpt_lib.save_config(cfg, run_dir)
    mgr = ckpt_lib.CheckpointManager(run_dir)
    mgr.save(0, {'params': params})
    mgr.close()
    return cfg


def write_reference_pt(data_dir: str, prefix: str, n: int):
    """Dump the synthetic val set as a reference-format torch pickle
    (list of per-molecule dicts of tensors, src/datasets.py:88-98)."""
    import torch
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset

    ds = synthetic_molecule_dataset(n, seed=1)
    out = []
    for s in ds.samples:
        out.append({k: (torch.as_tensor(v) if isinstance(v, np.ndarray)
                        else v) for k, v in s.items()})
    os.makedirs(data_dir, exist_ok=True)
    torch.save(out, os.path.join(data_dir, f'{prefix}.pt'))
    return ds


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--params', required=True)
    ap.add_argument('--inputs', type=int, default=256)
    ap.add_argument('--n-samples', type=int, default=5)
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--batch-size', type=int, default=64)
    ap.add_argument('--pad-nodes', type=int, default=None,
                    help='single-shape sampling (cli.sample --pad-nodes)')
    ap.add_argument('--workdir', type=str, default=None)
    ap.add_argument('--out', type=str, default=None)
    args = ap.parse_args()

    from difflinker_tpu.cli import reformat as reformat_cli
    from difflinker_tpu.cli import run_obabel as run_obabel_cli
    from difflinker_tpu.cli import sample as sample_cli

    work = args.workdir or tempfile.mkdtemp(prefix='pipeline_showcase_')
    os.makedirs(work, exist_ok=True)
    timings, t0 = {}, time.time()

    run_dir = os.path.join(work, 'run')
    package_run_dir(args.params, run_dir)
    data_dir = os.path.join(work, 'data')
    val = write_reference_pt(data_dir, 'showcase_test', args.inputs)
    timings['setup_s'] = round(time.time() - t0, 1)

    t = time.time()
    t_sample0 = t
    samples = os.path.join(work, 'samples')
    argv = ['--run', run_dir, '--data', data_dir,
            '--prefix', 'showcase_test',
            '--n-samples', str(args.n_samples),
            '--batch-size', str(args.batch_size),
            '--steps', str(args.steps), '--out', samples]
    if args.pad_nodes:
        argv += ['--pad-nodes', str(args.pad_nodes)]
    rc = sample_cli.main(argv)
    assert rc == 0, 'cli.sample failed'
    sample_dt = time.time() - t_sample0
    timings['sample_s'] = round(sample_dt, 1)

    t = time.time()
    rc = run_obabel_cli.main(['--samples', samples])
    assert rc == 0, 'cli.run_obabel failed'
    timings['obabel_s'] = round(time.time() - t, 1)

    t = time.time()
    # ground-truth table, one "molecule fragments" row per uuid (the
    # reformat contract, reformat_data_obabel.py:115) — without RDKit the
    # native WL-hash identities stand in for SMILES
    from difflinker_tpu.chem.molgraph import build_molecules
    from difflinker_tpu.chem import metrics as chem_metrics
    rows, gt = [], {}
    for s in val.samples:
        frag = build_molecules(s['one_hot'][None], s['positions'][None],
                               s['fragment_mask'][None, :, None])[0]
        true = build_molecules(s['one_hot'][None], s['positions'][None],
                               np.ones((1, len(s['positions']), 1)))[0]
        gt[str(s['uuid'])] = (true, frag)
        rows.append(f'{chem_metrics.canonical_key(true)} '
                    f'{chem_metrics.canonical_key(frag)}')
    table = os.path.join(work, 'true.smi')
    with open(table, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    fmt = os.path.join(work, 'fmt')
    rc = reformat_cli.main(['--samples', samples, '--true-smiles', table,
                            '--out', fmt, '--name', 'showcase'])
    assert rc == 0, 'cli.reformat failed'
    timings['reformat_s'] = round(time.time() - t, 1)

    t = time.time()
    # metric aggregate over the sampled molecules vs ground truth (the
    # (true, frag) MolGraphs were already built for the table stage)
    from difflinker_tpu.chem import delinker
    pred_mols, true_mols, frag_mols = [], [], []
    for s in val.samples:
        u = str(s['uuid'])
        true, frag = gt[u]
        for i in range(args.n_samples):
            xyz = os.path.join(samples, u, f'{i}_.xyz')
            from difflinker_tpu.io.xyz import load_molecule_xyz
            pos, one_hot, _ = load_molecule_xyz(xyz, is_geom=False)
            pred_mols.append(build_molecules(
                one_hot[None], pos[None],
                np.ones((1, len(pos), 1)))[0])
            true_mols.append(true)
            frag_mols.append(frag)
    agg = chem_metrics.compute_metrics(pred_mols, true_mols)
    dl = delinker.get_delinker_metrics(pred_mols, true_mols, frag_mols)
    timings['metrics_s'] = round(time.time() - t, 1)

    report = {
        'inputs': args.inputs, 'n_samples': args.n_samples,
        'steps': args.steps, 'linkers': args.inputs * args.n_samples,
        'timings': timings,
        'sample_linkers_per_s': round(
            args.inputs * args.n_samples / max(sample_dt, 1e-9), 2),
        'metrics': {k: round(float(v), 4) for k, v in
                    {**agg, **dl}.items()},
    }
    print(json.dumps(report, indent=2), flush=True)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
    if args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
