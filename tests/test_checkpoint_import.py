"""File-level Lightning-checkpoint import: build a .ckpt exactly shaped like
the released ones (hyper_parameters + `edm.*`-prefixed state_dict from the
real torch reference modules), load it through load_ddpm_checkpoint, and
verify the imported model reproduces the torch forward pass."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from src.egnn import Dynamics as TorchDynamics  # noqa: E402
from src.edm import EDM as TorchEDM  # noqa: E402

from difflinker_tpu.config import CenterOfMass, DatasetFamily  # noqa: E402
from difflinker_tpu.io.lightning_import import load_ddpm_checkpoint  # noqa: E402
from difflinker_tpu.models.dynamics import dynamics_apply  # noqa: E402

from conftest import make_batch  # noqa: E402

HPARAMS = {
    'in_node_nf': 8, 'n_dims': 3, 'context_node_nf': 2, 'hidden_nf': 32,
    'activation': 'silu', 'tanh': False, 'n_layers': 2, 'attention': False,
    'norm_constant': 1e-6, 'inv_sublayers': 2, 'sin_embedding': False,
    'normalization_factor': 100, 'aggregation_method': 'sum',
    'diffusion_steps': 40, 'diffusion_noise_schedule': 'polynomial_2',
    'diffusion_noise_precision': 1e-5, 'diffusion_loss_type': 'l2',
    'normalize_factors': [1, 4, 10], 'include_charges': False,
    'model': 'egnn_dynamics', 'data_path': 'datasets',
    'train_data_prefix': 'zinc_final_train',
    'val_data_prefix': 'zinc_final_val', 'batch_size': 128, 'lr': 2e-4,
    'torch_device': 'cpu', 'test_epochs': 20, 'n_stability_samples': 10,
    'center_of_mass': 'fragments', 'inpainting': False,
    'anchors_context': True,
}


def _make_reference_ckpt(path):
    torch.manual_seed(0)
    dyn = TorchDynamics(
        n_dims=3, in_node_nf=8, context_node_nf=2, hidden_nf=32,
        activation=torch.nn.SiLU(), n_layers=2, attention=False,
        condition_time=True, tanh=False, norm_constant=1e-6, inv_sublayers=2,
        sin_embedding=False, normalization_factor=100,
        aggregation_method='sum', model='egnn_dynamics')
    edm = TorchEDM(dynamics=dyn, in_node_nf=8, n_dims=3, timesteps=40,
                   noise_schedule='polynomial_2', noise_precision=1e-5,
                   loss_type='l2', norm_values=(1, 4, 10),
                   norm_biases=(None, 0, 0))
    sd = {f'edm.{k}': v for k, v in edm.state_dict().items()}
    torch.save({'hyper_parameters': dict(HPARAMS), 'state_dict': sd,
                'epoch': 123}, path)
    return edm


def test_load_ddpm_checkpoint(tmp_path, rng):
    path = str(tmp_path / 'zinc_difflinker.ckpt')
    tedm = _make_reference_ckpt(path)

    cfg, params = load_ddpm_checkpoint(path)
    assert cfg.model.hidden_nf == 32
    assert cfg.diffusion.timesteps == 40
    assert cfg.data.family == DatasetFamily.ZINC
    assert cfg.train.center_of_mass == CenterOfMass.FRAGMENTS

    batch = make_batch(rng, B=2, N=12, nf=8, n_frag=5, n_real=10)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)
    xh = np.concatenate([batch['positions'], batch['one_hot']], -1)
    t = np.full((2, 1), 0.5, np.float32)
    B, N = 2, 12
    with torch.no_grad():
        ref = tedm.dynamics.forward(
            t=torch.tensor(t), xh=torch.tensor(xh),
            node_mask=torch.tensor(batch['atom_mask']),
            linker_mask=torch.tensor(batch['linker_mask']),
            edge_mask=torch.tensor(batch['edge_mask'].reshape(B * N * N, 1)),
            context=torch.tensor(context)).numpy()
    ours, _ = dynamics_apply(
        params['dynamics'], jnp.asarray(t), jnp.asarray(xh),
        jnp.asarray(batch['atom_mask']), jnp.asarray(batch['linker_mask']),
        jnp.asarray(batch['edge_mask']), jnp.asarray(context), cfg=cfg.model)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-3)


HSP90_SDF = '/root/reference/case_studies/hsp90/3hz1_modified_fragments_obabel.sdf'


@pytest.mark.skipif(not __import__('os').path.exists(HSP90_SDF),
                    reason='reference case study not mounted')
def test_generate_cli_checkpoint_dress_rehearsal(tmp_path):
    """The released-checkpoint user journey end-to-end (reference
    generate.py:62-180): a Lightning-format .ckpt built from the reference's
    own torch modules is driven through `cli.generate` main() on the real
    HSP90 fragment SDF — load ckpt, read sdf, sample, un-center, write
    xyz+sdf — then eps-hat of the denoiser is cross-checked against torch on
    the exact generation template."""
    import os
    path = str(tmp_path / 'zinc_difflinker.ckpt')
    tedm = _make_reference_ckpt(path)

    out = str(tmp_path / 'gen')
    from difflinker_tpu.cli.generate import main as gen_main
    rc = gen_main(['--fragments', HSP90_SDF, '--ckpt', path,
                   '--linker-size', '5', '--n-samples', '3', '--steps', '8',
                   '--out', out])
    assert rc == 0
    files = sorted(os.listdir(out))
    assert [f for f in files if f.endswith('.xyz')] == [
        '3hz1_modified_fragments_obabel_0_.xyz',
        '3hz1_modified_fragments_obabel_1_.xyz',
        '3hz1_modified_fragments_obabel_2_.xyz']
    assert len([f for f in files if f.endswith('.sdf')]) == 3

    # un-centering: the 23 fragment atoms come back at their (centered) input
    # coordinates; 5 generated linker atoms follow (generate.py:167-175)
    from difflinker_tpu.chem.io_rdkit import parse_molecule, read_molecule
    frag_pos, _, _ = parse_molecule(read_molecule(HSP90_SDF), is_geom=False)
    frag_pos = frag_pos - frag_pos.mean(0, keepdims=True)
    lines = open(os.path.join(out, files[1])).read().splitlines()
    assert int(lines[0]) == 23 + 5
    got = np.asarray([[float(v) for v in ln.split()[1:4]]
                      for ln in lines[2:]], np.float32)
    np.testing.assert_allclose(got[:23], frag_pos, atol=1e-3)
    # random-init weights produce wild (finite) linker positions; only the
    # plumbing is under test here
    assert np.isfinite(got[23:]).all()

    # eps-hat cross-check on the exact template the CLI built
    from difflinker_tpu.cli.generate import (build_argparser,
                                             fragment_sample_dict)
    from difflinker_tpu.data.collate import (
        collate, create_templates_for_linker_generation)
    args = build_argparser().parse_args(
        ['--fragments', HSP90_SDF, '--ckpt', path])
    sample = fragment_sample_dict(args, is_geom=False)
    batch = collate([dict(sample) for _ in range(2)])
    template = create_templates_for_linker_generation(
        batch, np.asarray([5, 5]))
    B, N = template['positions'].shape[:2]
    context = np.concatenate([template['anchors'],
                              template['fragment_mask']], -1)
    xh = np.concatenate([template['positions'], template['one_hot']],
                        -1).astype(np.float32)
    t = np.full((B, 1), 0.5, np.float32)
    with torch.no_grad():
        ref = tedm.dynamics.forward(
            t=torch.tensor(t), xh=torch.tensor(xh),
            node_mask=torch.tensor(template['atom_mask']),
            linker_mask=torch.tensor(template['linker_mask']),
            edge_mask=torch.tensor(
                template['edge_mask'].reshape(B * N * N, 1)),
            context=torch.tensor(context)).numpy()
    cfg, params = load_ddpm_checkpoint(path)
    ours, _ = dynamics_apply(
        params['dynamics'], jnp.asarray(t), jnp.asarray(xh),
        jnp.asarray(template['atom_mask']),
        jnp.asarray(template['linker_mask']),
        jnp.asarray(template['edge_mask']), jnp.asarray(context),
        cfg=cfg.model)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-3)


def test_gamma_mismatch_detection(tmp_path):
    path = str(tmp_path / 'bad.ckpt')
    _make_reference_ckpt(path)
    ckpt = torch.load(path, weights_only=False)
    ckpt['state_dict']['edm.gamma.gamma'] += 0.5  # corrupt the table
    torch.save(ckpt, path)
    with pytest.raises(ValueError, match='gamma table'):
        load_ddpm_checkpoint(path)


def test_load_learned_gamma_checkpoint(tmp_path):
    """Checkpoints trained with noise_schedule='learned' carry GammaNetwork
    weights instead of a table; the importer must convert them."""
    from src.noise import GammaNetwork  # noqa: E402 (reference)
    torch.manual_seed(1)
    dyn = TorchDynamics(
        n_dims=3, in_node_nf=8, context_node_nf=2, hidden_nf=16,
        activation=torch.nn.SiLU(), n_layers=1, attention=False,
        condition_time=True, tanh=False, norm_constant=1e-6, inv_sublayers=2,
        sin_embedding=False, normalization_factor=100,
        aggregation_method='sum', model='egnn_dynamics')
    edm = TorchEDM(dynamics=dyn, in_node_nf=8, n_dims=3, timesteps=40,
                   noise_schedule='learned', loss_type='vlb',
                   norm_values=(1, 4, 10), norm_biases=(None, 0, 0))
    assert isinstance(edm.gamma, GammaNetwork)
    hp = dict(HPARAMS)
    hp.update(hidden_nf=16, n_layers=1,
              diffusion_noise_schedule='learned', diffusion_loss_type='vlb')
    path = str(tmp_path / 'learned.ckpt')
    sd = {f'edm.{k}': v for k, v in edm.state_dict().items()}
    torch.save({'hyper_parameters': hp, 'state_dict': sd}, path)

    cfg, params = load_ddpm_checkpoint(path)
    assert cfg.diffusion.noise_schedule == 'learned'
    assert 'gamma' in params

    from difflinker_tpu.diffusion.schedules import gamma_network_apply
    t = np.linspace(0, 1, 9, dtype=np.float32).reshape(-1, 1)
    with torch.no_grad():
        ref = edm.gamma(torch.tensor(t)).numpy()
    got = np.asarray(gamma_network_apply(params['gamma'], jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_load_size_spec_from_reference_ckpt(tmp_path, rng):
    """A reference-format SizeClassifier .ckpt drives cli.sample's
    --linker-size-model path: load_size_spec builds the fragment-edges graph
    itself and its sizes match the torch model's argmax decode."""
    import sys
    sys.path.insert(0, '/root/reference')
    import torch
    from src.linker_size import SizeGNN as TorchSizeGNN

    from conftest import make_batch
    from difflinker_tpu import constants
    from difflinker_tpu.cli.sample import load_size_spec
    from difflinker_tpu.data.collate import reference_edge_mask

    torch.manual_seed(7)
    tmodel = TorchSizeGNN(in_node_nf=8, hidden_nf=24, out_node_nf=10,
                          n_layers=2, normalization='batch_norm').eval()
    ckpt = {
        'hyper_parameters': {'in_node_nf': 8, 'hidden_nf': 24,
                             'out_node_nf': 10, 'n_layers': 2,
                             'normalization': 'batch_norm'},
        'state_dict': {f'gnn.{k}': v for k, v in
                       tmodel.state_dict().items()},
    }
    path = tmp_path / 'size_classifier.ckpt'
    torch.save(ckpt, str(path))

    batch = make_batch(rng, B=4, N=16, nf=8, n_frag=7, n_real=13)
    fn = load_size_spec(str(path))
    sizes = fn(batch)
    assert sizes.shape == (4,)
    assert all(int(s) in list(constants.ZINC_TRAIN_LINKER_ID2SIZE)
               for s in sizes)

    # cross-check against the torch forward on the fragment-edges graph
    from test_parity_size_gnn import _torch_forward
    tb = dict(batch)
    tb['edge_mask'] = reference_edge_mask(batch['fragment_mask'][..., 0])
    logits = _torch_forward(tmodel, tb, 8)
    want = np.asarray([constants.ZINC_TRAIN_LINKER_ID2SIZE[int(i)]
                       for i in logits.argmax(-1)])
    np.testing.assert_array_equal(sizes, want)
