"""Evaluation harness + visualizer: sample_and_analyze over synthetic data,
best-epoch selection, png/gif rendering of a denoising chain."""
import os

import numpy as np
import jax
import pytest

from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                   ExperimentConfig, ModelConfig, TrainConfig)
from difflinker_tpu.data.datasets import synthetic_dataset
from difflinker_tpu.sample.sampler import LinkerSampler
from difflinker_tpu.train.evaluation import (best_validation_metrics,
                                             sample_and_analyze)
from difflinker_tpu.train.trainer import Trainer


@pytest.fixture(scope='module')
def setup():
    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=16,
                          n_layers=1, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=6),
        data=DataConfig(),
        train=TrainConfig(batch_size=4, n_stability_samples=2))
    trainer = Trainer(cfg)
    params = trainer.edm.init_params(jax.random.PRNGKey(0))
    return cfg, trainer, params


def test_sample_and_analyze(setup):
    cfg, trainer, params = setup
    ds = synthetic_dataset(4, seed=0)
    sampler = LinkerSampler(cfg, params, trainer.edm)
    metrics = sample_and_analyze(
        sampler, ds.iter_batches(4, group_by_bucket=False),
        jax.random.PRNGKey(1), n_samples=2)
    for key in ('validity', 'validity_and_connectivity', 'uniqueness',
                'novelty', 'DeLinker/validity'):
        assert key in metrics
        assert 0 <= metrics[key] <= 1 or key == 'energies'


def test_sample_and_analyze_overlap_matches_serial(setup):
    """The overlapped host-device eval pipeline (chemistry on a worker thread
    while the main thread blocks on the next device chain) gathers results in
    submission order — metrics are identical to strictly serial execution."""
    cfg, trainer, params = setup
    ds = synthetic_dataset(4, seed=0)
    sampler = LinkerSampler(cfg, params, trainer.edm)
    serial = sample_and_analyze(
        sampler, ds.iter_batches(4, group_by_bucket=False),
        jax.random.PRNGKey(1), n_samples=2, overlap=False)
    overlapped = sample_and_analyze(
        sampler, ds.iter_batches(4, group_by_bucket=False),
        jax.random.PRNGKey(1), n_samples=2, overlap=True)
    assert set(serial) == set(overlapped)
    for k, v in serial.items():
        assert overlapped[k] == pytest.approx(v), k


def test_best_validation_metrics():
    history = {
        'validity_and_connectivity/val': [0.1, 0.5, 0.3],
        'uniqueness/val': [0.9, 0.8, 0.7],
        'loss/train': [1, 2, 3],
    }
    best, epoch = best_validation_metrics(history)
    assert epoch == 1
    assert best['uniqueness/val'] == 0.8
    assert 'loss/train' not in best


def test_visualize_chain(tmp_path, setup):
    cfg, trainer, params = setup
    ds = synthetic_dataset(1, seed=2)
    batch = next(ds.iter_batches(1, group_by_bucket=False))
    sampler = LinkerSampler(cfg, params, trainer.edm)
    out = sampler.sample(batch, jax.random.PRNGKey(3), size_spec=4,
                         keep_frames=3)

    from difflinker_tpu.io.xyz import save_xyz_file
    from difflinker_tpu.io.visualizer import plot_data3d, visualize_chain

    mol_dir = str(tmp_path / 'mol')
    node_mask = np.repeat(out['node_mask'][0][None], 3, axis=0)
    save_xyz_file(mol_dir, out['chain'][:, 0, :, 3:11], out['chain'][:, 0, :, :3],
                  node_mask, names=[f'm_{j}' for j in range(3)], is_geom=False)
    gif = visualize_chain(mol_dir, is_geom=False)
    assert os.path.exists(gif) and os.path.getsize(gif) > 0
    pngs = [f for f in os.listdir(mol_dir) if f.endswith('.png')]
    assert len(pngs) == 3
