"""Reverse checkpoint interop: params trained here -> reference-format
Lightning .ckpt (io/lightning_export.py). Proof levels: (a) our own
load_ddpm_checkpoint roundtrips bitwise, (b) the reference's torch modules
load the exported state_dict with strict=True and reproduce the forward
pass, (c) learned-gamma checkpoints export too."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from difflinker_tpu.config import (DataConfig, DiffusionConfig,  # noqa: E402
                                   ExperimentConfig, ModelConfig, TrainConfig)
from difflinker_tpu.diffusion.edm import make_edm  # noqa: E402
from difflinker_tpu.io.lightning_export import (  # noqa: E402
    hparams_from_config, save_ddpm_checkpoint)
from difflinker_tpu.io.lightning_import import load_ddpm_checkpoint  # noqa: E402
from difflinker_tpu.models.dynamics import dynamics_apply  # noqa: E402

from conftest import make_batch  # noqa: E402


def _assert_tree_equal(tree_a, tree_b):
    """Bitwise leaf equality with a leaf-count guard (a bare zip would
    silently truncate if an importer ever dropped leaves)."""
    leaves_a = jax.tree.leaves(tree_a)
    leaves_b = jax.tree.leaves(tree_b)
    assert len(leaves_a) == len(leaves_b), (len(leaves_a), len(leaves_b))
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def _cfg(**diff_kw):
    return ExperimentConfig(
        exp_name='export_test',
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                          n_layers=2, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=40, **diff_kw),
        data=DataConfig(data_path='datasets',
                        train_prefix='zinc_final_train',
                        val_prefix='zinc_final_val'),
        train=TrainConfig())


def test_export_roundtrips_through_import(tmp_path):
    cfg = _cfg()
    params = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(3))
    path = str(tmp_path / 'exported.ckpt')
    save_ddpm_checkpoint(path, cfg, params, epoch=7)

    cfg2, params2 = load_ddpm_checkpoint(path)
    assert cfg2.model.hidden_nf == cfg.model.hidden_nf
    assert cfg2.diffusion.timesteps == cfg.diffusion.timesteps
    assert cfg2.data.train_prefix == cfg.data.train_prefix
    a, b = jax.tree.leaves(params['dynamics']), \
        jax.tree.leaves(params2['dynamics'])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def test_reference_modules_load_export_strict(tmp_path):
    """The strongest interop claim: the reference's own DDPM-shaped torch
    modules accept the exported state_dict with strict=True (every key and
    shape matches the published layout) and reproduce our forward pass."""
    from src.egnn import Dynamics as TorchDynamics
    from src.edm import EDM as TorchEDM

    cfg = _cfg()
    params = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(5))
    path = str(tmp_path / 'exported.ckpt')
    save_ddpm_checkpoint(path, cfg, params)
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    hp = ckpt['hyper_parameters']

    dyn = TorchDynamics(
        n_dims=hp['n_dims'], in_node_nf=hp['in_node_nf'],
        context_node_nf=hp['context_node_nf'], hidden_nf=hp['hidden_nf'],
        activation=torch.nn.SiLU(), n_layers=hp['n_layers'],
        attention=hp['attention'], condition_time=True, tanh=hp['tanh'],
        norm_constant=hp['norm_constant'],
        inv_sublayers=hp['inv_sublayers'],
        sin_embedding=hp['sin_embedding'],
        normalization_factor=hp['normalization_factor'],
        aggregation_method=hp['aggregation_method'], model=hp['model'])
    tedm = TorchEDM(dynamics=dyn, in_node_nf=hp['in_node_nf'],
                    n_dims=hp['n_dims'], timesteps=hp['diffusion_steps'],
                    noise_schedule=hp['diffusion_noise_schedule'],
                    noise_precision=hp['diffusion_noise_precision'],
                    loss_type=hp['diffusion_loss_type'],
                    norm_values=tuple(hp['normalize_factors']),
                    norm_biases=(None, 0, 0))
    sd = {k[len('edm.'):]: v for k, v in ckpt['state_dict'].items()}
    tedm.load_state_dict(sd, strict=True)

    rng = np.random.default_rng(0)
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


def test_export_learned_gamma(tmp_path):
    cfg = _cfg(noise_schedule='learned', loss_type='vlb')
    params = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(9))
    path = str(tmp_path / 'learned.ckpt')
    save_ddpm_checkpoint(path, cfg, params)

    # the reference GammaNetwork strict-loads the gamma entries
    from src.noise import GammaNetwork
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    gnet = GammaNetwork()
    gsd = {k[len('edm.gamma.'):]: v for k, v in ckpt['state_dict'].items()
           if k.startswith('edm.gamma.')}
    gnet.load_state_dict(gsd, strict=True)

    # and our importer round-trips the whole model
    cfg2, params2 = load_ddpm_checkpoint(path)
    assert cfg2.diffusion.noise_schedule == 'learned'
    _assert_tree_equal(params, params2)


def test_hparams_ctor_complete():
    """DDPM(**hparams) must construct on the reference side — ctor
    completeness of the exported hyper_parameters (src/lightning.py:39-48).
    pytorch_lightning is absent in this image, so the ctor signature is
    parsed from the reference source instead of imported."""
    import ast
    with open('/root/reference/src/lightning.py') as f:
        tree = ast.parse(f.read())
    ddpm = next(n for n in tree.body
                if isinstance(n, ast.ClassDef) and n.name == 'DDPM')
    init = next(n for n in ddpm.body
                if isinstance(n, ast.FunctionDef) and n.name == '__init__')
    args = [a.arg for a in init.args.args if a.arg != 'self']
    n_required = len(args) - len(init.args.defaults)
    hp = hparams_from_config(_cfg())
    missing = [n for n in args[:n_required] if n not in hp]
    assert not missing, missing
    extra = [n for n in hp if n not in args]
    assert not extra, extra


def test_export_size_checkpoint(tmp_path):
    """Size-predictor export: our load_size_checkpoint roundtrips and the
    reference's SizeGNN strict-loads the exported state_dict."""
    from difflinker_tpu.io.lightning_export import save_size_checkpoint
    from difflinker_tpu.io.lightning_import import load_size_checkpoint
    from difflinker_tpu.models.size_gnn import SizePredictor

    pred = SizePredictor(in_node_nf=9, hidden_nf=16, out_node_nf=10,
                         n_layers=3, task='classification')
    params, state = pred.init(jax.random.PRNGKey(2))
    path = str(tmp_path / 'size.ckpt')
    save_size_checkpoint(path, pred, params, state)

    hp, params2, state2 = load_size_checkpoint(path)
    assert hp['task'] == 'classification' and hp['n_layers'] == 3
    assert hp['linker_id2size'][0] == 3
    _assert_tree_equal((params, state), (params2, state2))

    from src.linker_size import SizeGNN as TorchSizeGNN
    gnn = TorchSizeGNN(in_node_nf=9, hidden_nf=16, out_node_nf=10,
                       n_layers=3, normalization='batch_norm', device='cpu')
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    gnn.load_state_dict({k[len('gnn.'):]: v
                         for k, v in ckpt['state_dict'].items()},
                        strict=True)


def test_export_size_checkpoint_with_pocket(tmp_path):
    """A with_pocket size model (the reference's pocket size-prediction
    path, src/linker_size_lightning.py:83-97) records the flag in hparams
    so cli.sample.load_size_spec rebuilds a fragment_only_mask-keyed
    predictor; no-pocket exports keep hparams reference-ctor-clean."""
    from difflinker_tpu.io.lightning_export import save_size_checkpoint
    from difflinker_tpu.io.lightning_import import load_size_checkpoint
    from difflinker_tpu.models.size_gnn import SizePredictor

    pred = SizePredictor(in_node_nf=9, hidden_nf=16, out_node_nf=10,
                         n_layers=2, task='classification', with_pocket=True)
    params, state = pred.init(jax.random.PRNGKey(3))
    path = str(tmp_path / 'size_pocket.ckpt')
    save_size_checkpoint(path, pred, params, state)
    hp, _, _ = load_size_checkpoint(path)
    assert hp['with_pocket'] is True

    no_pocket = SizePredictor(in_node_nf=9, hidden_nf=16, out_node_nf=10,
                              n_layers=2, task='classification')
    path2 = str(tmp_path / 'size_plain.ckpt')
    save_size_checkpoint(path2, no_pocket, *no_pocket.init(jax.random.PRNGKey(4)))
    hp2, _, _ = load_size_checkpoint(path2)
    assert 'with_pocket' not in hp2


def test_export_size_cli_from_npz(tmp_path):
    """cli.export_checkpoint --size-npz: a train_size_gnn artifact (npz +
    recipe sidecar) exports to a .ckpt our size importer accepts."""
    import json
    from difflinker_tpu.cli import export_checkpoint
    from difflinker_tpu.io.checkpoints import save_params_npz
    from difflinker_tpu.io.lightning_import import load_size_checkpoint
    from difflinker_tpu.models.size_gnn import SizePredictor

    pred = SizePredictor(in_node_nf=8, hidden_nf=16, out_node_nf=10,
                         n_layers=2, task='ordinal')
    params, state = pred.init(jax.random.PRNGKey(4))
    npz = str(tmp_path / 'size_gnn_ordinal.npz')
    save_params_npz({'params': params, 'bn_state': state}, npz)
    with open(npz + '.config.json', 'w') as f:
        json.dump({'task': 'ordinal', 'hidden': 16, 'layers': 2,
                   'in_node_nf': 8, 'out_node_nf': 10, 'geom': False}, f)
    out = str(tmp_path / 'size.ckpt')
    assert export_checkpoint.main(['--size-npz', npz, '--out', out]) == 0
    hp, params2, state2 = load_size_checkpoint(out)
    assert hp['task'] == 'ordinal'
    _assert_tree_equal((params, state), (params2, state2))
