"""CLI smoke tests: every entry point parses --help (catches import/arg
errors), the rdkit gate exits cleanly, and the real HSP90 case-study inputs
parse through the native SDF/PDB readers."""
import os
import subprocess
import sys

import numpy as np
import pytest

CLIS = ['train', 'sample', 'generate', 'generate_with_protein',
        'generate_with_pocket', 'sample_trajectories', 'train_size_gnn',
        'compute_metrics', 'reformat', 'run_obabel', 'prepare_data',
        'export_checkpoint', 'serve', 'distill']


@pytest.mark.parametrize('name', CLIS)
def test_cli_help(name):
    res = subprocess.run(
        [sys.executable, '-m', f'difflinker_tpu.cli.{name}', '--help'],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-800:]
    assert 'usage' in res.stdout.lower()


def test_compute_metrics_requires_rdkit(tmp_path):
    from difflinker_tpu.chem.molgraph import HAS_RDKIT
    if HAS_RDKIT:
        pytest.skip('rdkit installed; gate not reachable')
    smi = tmp_path / 's.smi'
    smi.write_text('CC CCO CCO C\n')
    linkers = tmp_path / 'l.smi'
    linkers.write_text('C\n')
    from difflinker_tpu.cli.compute_metrics import main
    rc = main(['--smi', str(smi), '--train-linkers', str(linkers)])
    assert rc == 2


HSP90 = '/root/reference/case_studies/hsp90'


@pytest.mark.skipif(not os.path.isdir(HSP90), reason='reference not mounted')
def test_case_study_inputs_parse():
    """Real-world inputs: OpenBabel-written SDF fragments + a 1.6k-atom
    protein PDB through the native readers and pocket extraction."""
    from difflinker_tpu.chem.io_rdkit import parse_molecule, read_molecule
    from difflinker_tpu.chem.pdb import extract_pocket, parse_pdb

    mol = read_molecule(os.path.join(HSP90, '3hz1_modified_fragments_obabel.sdf'))
    pos, one_hot, charges = parse_molecule(mol, is_geom=True)
    assert pos.shape == (23, 3)
    assert one_hot.shape == (23, 9)
    assert set(one_hot.argmax(-1)) <= set(range(9))

    atoms = parse_pdb(os.path.join(HSP90, '3hz1_protein.pdb'))
    assert len(atoms) > 1500

    pk_pos, pk_oh, pk_q = extract_pocket(pos, os.path.join(HSP90, '3hz1_protein.pdb'))
    assert 50 < len(pk_q) < 500
    # every pocket atom within ~6A+residue-extent of the fragments
    d = np.linalg.norm(pk_pos[:, None] - pos[None], axis=-1).min(1)
    assert d.min() <= 6.0
    # backbone-only is a subset
    bb_pos, _, _ = extract_pocket(pos, os.path.join(HSP90, '3hz1_protein.pdb'),
                                  backbone_atoms_only=True)
    assert len(bb_pos) < len(pk_pos)


def test_sample_reformat_naming_contract(tmp_path):
    """End-to-end sample -> reformat on CPU: per-sample SDFs must be distinct
    files (regression for the '{uuid}_' stem collision)."""
    import json
    import jax
    from difflinker_tpu.cli import sample as sample_cli
    from difflinker_tpu.cli import reformat as reformat_cli
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)
    from difflinker_tpu.io import checkpoints as ckpt_lib
    from difflinker_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=8,
                          n_layers=1, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=3),
        data=DataConfig(), train=TrainConfig(batch_size=2))
    run_dir = str(tmp_path / 'run')
    ckpt_lib.save_config(cfg, run_dir)
    trainer = Trainer(cfg)
    mgr = ckpt_lib.CheckpointManager(run_dir)
    mgr.save(1, trainer.init_state(jax.random.PRNGKey(0)))
    mgr.close()

    out = str(tmp_path / 'samples')
    rc = sample_cli.main(['--run', run_dir, '--synthetic', '2',
                          '--n-samples', '2', '--batch-size', '2',
                          '--out', out])
    assert rc == 0
    files = sorted(os.listdir(os.path.join(out, '0')))
    assert files == ['0_.xyz', '1_.xyz', 'frag_.xyz', 'true_.xyz']

    smi_table = str(tmp_path / 'true.smi')
    with open(smi_table, 'w') as f:
        f.write('CCO CC\nCCO CC\n')
    fmt = str(tmp_path / 'fmt')
    rc = reformat_cli.main(['--samples', out, '--true-smiles', smi_table,
                            '--out', fmt, '--name', 'd'])
    assert rc == 0
    rows = open(os.path.join(fmt, 'd.smi')).read().splitlines()
    assert len(rows) == 4  # 2 uuids x 2 samples
    sdfs = sorted(os.listdir(os.path.join(out, '0', 'obabel')))
    assert sdfs == ['0_.sdf', '1_.sdf']


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax
    from difflinker_tpu.cli import common

    d = str(tmp_path / 'xla')
    monkeypatch.setenv('DIFFLINKER_COMPILE_CACHE', d)
    assert common.enable_compilation_cache() == d
    assert jax.config.jax_compilation_cache_dir == d
    assert os.path.isdir(d)

    monkeypatch.setenv('DIFFLINKER_COMPILE_CACHE', 'off')
    assert common.enable_compilation_cache() is None

    # '1'/'on' mean enable-with-default-path, not a dir literally named '1'
    monkeypatch.setenv('DIFFLINKER_COMPILE_CACHE', '1')
    got = common.enable_compilation_cache(cache_dir=str(tmp_path / 'dflt'))
    assert got == str(tmp_path / 'dflt')


def test_load_model_prefers_ema_params(tmp_path):
    """A run trained with --ema serves its EMA weights to the sampling CLIs
    (the EMA tree is otherwise write-only state)."""
    import argparse
    import jax
    import jax.numpy as jnp
    from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)
    from difflinker_tpu.io import checkpoints as ckpt_lib
    from difflinker_tpu.train.trainer import Trainer
    from difflinker_tpu.cli.sample import load_model

    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=8,
                          n_layers=1, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=4),
        data=DataConfig(), train=TrainConfig(batch_size=2))
    trainer = Trainer(cfg, ema_beta=0.9)
    state = trainer.init_state(jax.random.PRNGKey(0))
    # make EMA distinguishable from the live params
    state['ema_params'] = jax.tree.map(lambda a: a + 1.0, state['params'])
    run = str(tmp_path / 'run')
    ckpt_lib.save_config(cfg, run)
    mgr = ckpt_lib.CheckpointManager(run)
    mgr.save(1, state)
    mgr.close()

    _, params = load_model(argparse.Namespace(ckpt=None, run=run))
    ref = jax.tree.leaves(state['ema_params'])
    got = jax.tree.leaves(params)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_load_model_from_bundled_params(tmp_path):
    """--params serves a demo-weights npz (examples/params/*) to the
    sampling CLIs, with the recipe rebuilt from the sidecar config.json."""
    import argparse
    import json
    import jax
    from difflinker_tpu.cli.sample import load_model
    from difflinker_tpu.demo import recipe_config
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.io.checkpoints import save_params_npz
    import pytest

    meta = {'hidden': 8, 'layers': 1, 'timesteps': 4}
    cfg = recipe_config(meta)
    params = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(0))
    path = str(tmp_path / 'demo.npz')
    save_params_npz(params, path)
    with open(path + '.config.json', 'w') as f:
        json.dump(meta, f)

    got_cfg, got = load_model(
        argparse.Namespace(ckpt=None, run=None, params=path))
    assert got_cfg.model.hidden_nf == 8
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # no source at all: a clean CLI error, not an AttributeError
    with pytest.raises(SystemExit, match='--run / --ckpt / --params'):
        load_model(argparse.Namespace(ckpt=None, run=None, params=None))


def test_generate_with_pocket_main_reaches_run(tmp_path, monkeypatch):
    """main() executes past arg parsing (regression: a missing `common`
    import made every real invocation NameError before reaching run())."""
    import difflinker_tpu.cli.generate_with_pocket as gwp
    called = {}
    monkeypatch.setattr(gwp, 'run',
                        lambda args, pocket_is_precut: called.update(
                            pocket=pocket_is_precut) or 0)
    rc = gwp.main(['--fragments', 'f.sdf', '--pocket', 'p.pdb',
                   '--run', str(tmp_path), '--anchors', '1,2'])
    assert rc == 0 and called == {'pocket': True}


def test_pocket_cli_vocab_mismatch_is_a_clear_error(tmp_path):
    """A ZINC-vocab (in_node_nf=8) model against the pocket CLIs' GEOM-parsed
    inputs must exit with a vocab-mismatch message, not an opaque XLA
    broadcast error deep inside the jitted chain."""
    import json
    import jax
    from difflinker_tpu.demo import recipe_config
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.io.checkpoints import save_params_npz
    import difflinker_tpu.cli.generate_with_pocket as gwp

    meta = {'hidden': 8, 'layers': 1, 'timesteps': 4, 'pocket': True}
    cfg = recipe_config(meta)
    assert cfg.model.in_node_nf == 8  # the sidecar default (ZINC vocab)
    params = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(0))
    npz = str(tmp_path / 'pocket8.npz')
    save_params_npz(params, npz)
    with open(npz + '.config.json', 'w') as f:
        json.dump(meta, f)

    frags = tmp_path / 'frags.xyz'
    frags.write_text('2\nfrags\nC 0.0 0.0 0.0\nO 1.5 0.0 0.0\n')
    pocket = tmp_path / 'pocket.pdb'
    pocket.write_text(
        'ATOM      1   N  POC A   1       4.000   0.000   0.000'
        '  1.00  0.00           N\nEND\n')

    with pytest.raises(SystemExit, match='vocab mismatch'):
        gwp.main(['--fragments', str(frags), '--pocket', str(pocket),
                  '--params', npz, '--n-samples', '1',
                  '--out', str(tmp_path / 'out')])


def test_generate_with_pocket_pad_nodes_end_to_end(tmp_path):
    """--pad-nodes drives the CLI through one shared chain shape (the lever
    that collapses per-complex compiles, CLAUDE.md): a tiny GEOM-vocab pocket
    model generates real outputs with every template padded to the flag."""
    import json
    import jax
    from difflinker_tpu.demo import recipe_config
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.io.checkpoints import save_params_npz
    import difflinker_tpu.cli.generate_with_pocket as gwp

    meta = {'hidden': 16, 'layers': 1, 'timesteps': 4, 'pocket': True,
            'in_node_nf': 9}
    cfg = recipe_config(meta)
    params = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(0))
    npz = str(tmp_path / 'pocket9.npz')
    save_params_npz(params, npz)
    with open(npz + '.config.json', 'w') as f:
        json.dump(meta, f)

    frags = tmp_path / 'frags.xyz'
    frags.write_text('2\nfrags\nC 0.0 0.0 0.0\nO 4.5 0.0 0.0\n')
    pocket = tmp_path / 'pocket.pdb'
    pocket.write_text(
        'ATOM      1   N  POC A   1       2.000   3.000   0.000'
        '  1.00  0.00           N\nEND\n')

    out = tmp_path / 'out'
    rc = gwp.main(['--fragments', str(frags), '--pocket', str(pocket),
                   '--params', npz, '--n-samples', '2', '--linker-size', '3',
                   '--anchors', '1,2', '--pad-nodes', '24',
                   '--sampler', 'ddim', '--out', str(out)])
    assert rc == 0
    xyz = sorted(p for p in out.iterdir() if p.suffix == '.xyz')
    assert len(xyz) == 2
    # outputs carry fragments+linker only (pocket stripped), unpadded
    text = xyz[0].read_text().strip().split('\n')
    assert int(text[0]) == 2 + 3  # frag atoms + linker size
