"""Convert PyTorch(-Lightning) DiffLinker checkpoints into param pytrees.

The reference publishes `.ckpt` files (torch pickles with `hyper_parameters`
and `state_dict`; README.md:76-86) whose state_dict keys look like

    edm.gamma.gamma                                  (T+1,) gamma table
    edm.dynamics.dynamics.embedding.weight           EGNN input embedding
    edm.dynamics.dynamics.e_block_3.gcl_1.edge_mlp.0.weight
    edm.dynamics.dynamics.e_block_3.gcl_equiv.coord_mlp.4.weight
    ...

This module maps them onto our pytrees (models/egnn.py). Torch Linear weights
are stored (out, in) and ours (in, out), so every weight is transposed. The
same converter handles bare `state_dict`s from the reference's raw modules
(used by the golden parity tests) via the `prefix` argument.

torch is only imported inside functions — the rest of the framework never
depends on it.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    # copy: .numpy() views torch memory, and CPU jax can keep numpy buffers
    # zero-copy — without the copy, later in-place torch mutations (e.g.
    # BatchNorm running-stat updates) would leak into converted params
    return np.array(t.detach().cpu().numpy())


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    p = {'w': jnp.asarray(_np(sd[f'{prefix}.weight']).T)}
    if bias and f'{prefix}.bias' in sd:
        p['b'] = jnp.asarray(_np(sd[f'{prefix}.bias']))
    return p


def _batch_norm(sd: Mapping, prefix: str):
    params = {'scale': jnp.asarray(_np(sd[f'{prefix}.weight'])),
              'bias': jnp.asarray(_np(sd[f'{prefix}.bias']))}
    state = {'mean': jnp.asarray(_np(sd[f'{prefix}.running_mean'])),
             'var': jnp.asarray(_np(sd[f'{prefix}.running_var'])),
             'count': jnp.asarray(_np(sd[f'{prefix}.num_batches_tracked']))}
    return params, state


def convert_gcl(sd: Mapping, prefix: str, attention: bool = False,
                normalization: str = None):
    """GCL (src/egnn.py:10-43): edge_mlp = Sequential(Linear, act, Linear, act);
    node_mlp = Sequential(Linear[, BN], act, Linear[, BN])."""
    p = {
        'edge_mlp': {'lin0': _linear(sd, f'{prefix}.edge_mlp.0'),
                     'lin1': _linear(sd, f'{prefix}.edge_mlp.2')},
    }
    state = {}
    if normalization == 'batch_norm':
        p['node_mlp'] = {'lin0': _linear(sd, f'{prefix}.node_mlp.0'),
                         'lin1': _linear(sd, f'{prefix}.node_mlp.3')}
        p['bn0'], state['bn0'] = _batch_norm(sd, f'{prefix}.node_mlp.1')
        p['bn1'], state['bn1'] = _batch_norm(sd, f'{prefix}.node_mlp.4')
    else:
        p['node_mlp'] = {'lin0': _linear(sd, f'{prefix}.node_mlp.0'),
                         'lin1': _linear(sd, f'{prefix}.node_mlp.2')}
    if attention:
        p['att_mlp'] = _linear(sd, f'{prefix}.att_mlp.0')
    return p, state


def convert_coord_update(sd: Mapping, prefix: str):
    """EquivariantUpdate.coord_mlp = Sequential(Linear, act, Linear, act,
    Linear(bias=False)) (src/egnn.py:92-97)."""
    return {'lin0': _linear(sd, f'{prefix}.coord_mlp.0'),
            'lin1': _linear(sd, f'{prefix}.coord_mlp.2'),
            'lin_out': _linear(sd, f'{prefix}.coord_mlp.4', bias=False)}


def convert_egnn(sd: Mapping, prefix: str, n_layers: int, inv_sublayers: int,
                 attention: bool):
    dot = '.' if prefix else ''
    blocks = []
    for i in range(n_layers):
        bp = f'{prefix}{dot}e_block_{i}'
        gcls = [convert_gcl(sd, f'{bp}.gcl_{j}', attention=attention)[0]
                for j in range(inv_sublayers)]
        blocks.append({'gcls': gcls,
                       'coord': convert_coord_update(sd, f'{bp}.gcl_equiv')})
    return {
        'embedding': _linear(sd, f'{prefix}{dot}embedding'),
        'embedding_out': _linear(sd, f'{prefix}{dot}embedding_out'),
        'blocks': blocks,
    }


def convert_gnn(sd: Mapping, prefix: str, n_layers: int, attention: bool,
                normalization: str = None):
    dot = '.' if prefix else ''
    gcls, states = [], []
    for i in range(n_layers):
        gp, gs = convert_gcl(sd, f'{prefix}{dot}gcl_{i}', attention=attention,
                             normalization=normalization)
        gcls.append(gp)
        states.append(gs)
    params = {
        'embedding': _linear(sd, f'{prefix}{dot}embedding'),
        'embedding_out': _linear(sd, f'{prefix}{dot}embedding_out'),
        'gcls': gcls,
    }
    return params, {'gcls': states}


def convert_dynamics(sd: Mapping, prefix: str, *, model: str, n_layers: int,
                     inv_sublayers: int, attention: bool,
                     normalization: str = None):
    dot = '.' if prefix else ''
    if model == 'egnn_dynamics':
        return {'egnn': convert_egnn(sd, f'{prefix}{dot}dynamics', n_layers,
                                     inv_sublayers, attention)}
    params, state = convert_gnn(sd, f'{prefix}{dot}dynamics', n_layers,
                                attention, normalization)
    return {'gnn': params, 'gnn_state': state}


def convert_gamma_network(sd: Mapping, prefix: str):
    """GammaNetwork (src/noise.py:131-143). PositiveLinear stores the raw
    (pre-softplus) weight, exactly like ours."""
    dot = '.' if prefix else ''
    return {
        'l1': _linear(sd, f'{prefix}{dot}l1'),
        'l2': _linear(sd, f'{prefix}{dot}l2'),
        'l3': _linear(sd, f'{prefix}{dot}l3'),
        'gamma_0': jnp.asarray(_np(sd[f'{prefix}{dot}gamma_0'])),
        'gamma_1': jnp.asarray(_np(sd[f'{prefix}{dot}gamma_1'])),
    }


def convert_size_gnn(sd: Mapping, prefix: str, n_layers: int,
                     normalization: str = 'batch_norm'):
    """SizeGNN (src/linker_size.py:45-91): embedding_in, gcl1,
    gcl_layers.{0..n-2}, embedding_out."""
    dot = '.' if prefix else ''
    gcls, states = [], []
    gp, gs = convert_gcl(sd, f'{prefix}{dot}gcl1', normalization=normalization)
    gcls.append(gp)
    states.append(gs)
    for i in range(n_layers - 1):
        gp, gs = convert_gcl(sd, f'{prefix}{dot}gcl_layers.{i}',
                             normalization=normalization)
        gcls.append(gp)
        states.append(gs)
    params = {
        'embedding_in': _linear(sd, f'{prefix}{dot}embedding_in'),
        'embedding_out': _linear(sd, f'{prefix}{dot}embedding_out'),
        'gcls': gcls,
    }
    return params, {'gcls': states}


# ---------------------------------------------------------------------------
# Full-checkpoint loaders
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> dict:
    import torch
    return torch.load(path, map_location='cpu', weights_only=False)


def config_from_ddpm_hparams(hp: Mapping):
    """Build an ExperimentConfig from the Lightning DDPM hyper_parameters dict
    (saved by save_hyperparameters(), src/lightning.py:51; ctor args at
    :39-48)."""
    from difflinker_tpu.config import (
        CenterOfMass, DataConfig, DiffusionConfig, ExperimentConfig,
        GraphType, ModelConfig, TrainConfig, _family_from_prefix)

    prefix = hp.get('train_data_prefix', '')
    family, pocket = _family_from_prefix(prefix)
    graph_type = hp.get('graph_type')
    if graph_type is None:
        graph_type = '4A' if '.' in prefix else 'FC'

    model = ModelConfig(
        in_node_nf=hp['in_node_nf'],
        context_node_nf=hp['context_node_nf'],
        n_dims=hp.get('n_dims', 3),
        hidden_nf=hp['hidden_nf'],
        n_layers=hp['n_layers'],
        inv_sublayers=hp.get('inv_sublayers', 2),
        attention=hp.get('attention', False),
        tanh=hp.get('tanh', False),
        norm_constant=hp.get('norm_constant', 1.0),
        sin_embedding=hp.get('sin_embedding', False),
        normalization_factor=hp.get('normalization_factor', 100),
        aggregation_method=hp.get('aggregation_method', 'sum'),
        activation=hp.get('activation', 'silu') if isinstance(hp.get('activation'), str) else 'silu',
        condition_time=hp.get('condition_time', True),
        model=hp.get('model', 'egnn_dynamics'),
        normalization=hp.get('normalization'),
        centering=hp.get('inpainting', False),
        graph_type=GraphType(graph_type),
    )
    diffusion = DiffusionConfig(
        timesteps=hp['diffusion_steps'],
        noise_schedule=hp['diffusion_noise_schedule'],
        noise_precision=hp['diffusion_noise_precision'],
        loss_type=hp['diffusion_loss_type'],
        norm_values=tuple(hp['normalize_factors']),
        inpainting=hp.get('inpainting', False),
    )
    data = DataConfig(
        data_path=hp.get('data_path', 'datasets'),
        train_prefix=prefix,
        val_prefix=hp.get('val_data_prefix', ''),
        family=family, pocket_mode=pocket,
        include_charges=hp.get('include_charges', False),
    )
    train = TrainConfig(
        lr=hp.get('lr', 2e-4),
        batch_size=hp.get('batch_size', 128),
        test_epochs=hp.get('test_epochs', 20),
        n_stability_samples=hp.get('n_stability_samples', 10),
        center_of_mass=CenterOfMass(hp.get('center_of_mass', 'fragments')),
        anchors_context=hp.get('anchors_context', True),
        data_augmentation=hp.get('data_augmentation', False),
    )
    return ExperimentConfig(exp_name='imported', model=model,
                            diffusion=diffusion, data=data, train=train)


def load_ddpm_checkpoint(path: str):
    """Load a reference DiffLinker `.ckpt` → (ExperimentConfig, edm_params).

    Verifies that the baked gamma table in the checkpoint matches the table we
    reconstruct from the schedule config (parity guard for src/noise.py:92-124).
    """
    ckpt = load_torch_checkpoint(path)
    cfg = config_from_ddpm_hparams(ckpt['hyper_parameters'])
    sd = ckpt['state_dict']

    params = {'dynamics': convert_dynamics(
        sd, 'edm.dynamics', model=cfg.model.model, n_layers=cfg.model.n_layers,
        inv_sublayers=cfg.model.inv_sublayers, attention=cfg.model.attention,
        normalization=cfg.model.normalization)}

    if cfg.diffusion.noise_schedule == 'learned':
        params['gamma'] = convert_gamma_network(sd, 'edm.gamma')
    else:
        from difflinker_tpu.diffusion.schedules import gamma_lookup_table
        ours = gamma_lookup_table(cfg.diffusion.noise_schedule,
                                  cfg.diffusion.timesteps,
                                  cfg.diffusion.noise_precision)
        theirs = _np(sd['edm.gamma.gamma'])
        if not np.allclose(ours, theirs, atol=1e-5):
            raise ValueError(
                'reconstructed gamma table mismatches the checkpoint '
                f'(max err {np.abs(ours - theirs).max()}); check schedule config')
    return cfg, params


def load_size_checkpoint(path: str):
    """Load a reference SizeClassifier/Ordinal/Regressor `.ckpt` →
    (hparams dict, params, bn_state)."""
    ckpt = load_torch_checkpoint(path)
    hp = ckpt['hyper_parameters']
    sd = ckpt['state_dict']
    params, state = convert_size_gnn(sd, 'gnn', hp['n_layers'],
                                     normalization=hp.get('normalization', 'batch_norm'))
    return hp, params, state
