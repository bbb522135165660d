"""Export param pytrees as reference-format PyTorch-Lightning checkpoints.

The inverse of io/lightning_import.py: models trained in this framework can
be handed back to the reference DiffLinker ecosystem (its `generate.py`,
`sample.py`, eval stack, or any torch tooling) as a `.ckpt` torch pickle
with `hyper_parameters` + an `edm.*`-prefixed `state_dict` — the exact
layout the published checkpoints use (reference README.md:76-86,
src/lightning.py:39-51 `save_hyperparameters`). Tested by constructing the
reference's own `DDPM`-shaped modules and `load_state_dict(strict=True)`
(tests/test_checkpoint_export.py).

Torch Linear weights are stored (out, in) and ours (in, out), so every
weight is transposed — the mirror of the import path. torch is only
imported inside functions.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(a):
    import torch
    return torch.tensor(np.asarray(a))


def _linear(sd: Dict, prefix: str, p: Dict) -> None:
    sd[f'{prefix}.weight'] = _t(p['w']).T.contiguous()
    if 'b' in p:
        sd[f'{prefix}.bias'] = _t(p['b'])


def _batch_norm(sd: Dict, prefix: str, p: Dict, state: Dict) -> None:
    import torch
    sd[f'{prefix}.weight'] = _t(p['scale'])
    sd[f'{prefix}.bias'] = _t(p['bias'])
    sd[f'{prefix}.running_mean'] = _t(state['mean'])
    sd[f'{prefix}.running_var'] = _t(state['var'])
    sd[f'{prefix}.num_batches_tracked'] = _t(state['count']).to(torch.int64)


def _gcl(sd: Dict, prefix: str, p: Dict, state: Dict = None,
         normalization: str = None) -> None:
    """Inverse of lightning_import.convert_gcl (reference src/egnn.py:10-43:
    edge_mlp = Sequential(Linear, act, Linear, act); node_mlp =
    Sequential(Linear[, BN], act, Linear[, BN]))."""
    _linear(sd, f'{prefix}.edge_mlp.0', p['edge_mlp']['lin0'])
    _linear(sd, f'{prefix}.edge_mlp.2', p['edge_mlp']['lin1'])
    if normalization == 'batch_norm':
        _linear(sd, f'{prefix}.node_mlp.0', p['node_mlp']['lin0'])
        _linear(sd, f'{prefix}.node_mlp.3', p['node_mlp']['lin1'])
        _batch_norm(sd, f'{prefix}.node_mlp.1', p['bn0'], state['bn0'])
        _batch_norm(sd, f'{prefix}.node_mlp.4', p['bn1'], state['bn1'])
    else:
        _linear(sd, f'{prefix}.node_mlp.0', p['node_mlp']['lin0'])
        _linear(sd, f'{prefix}.node_mlp.2', p['node_mlp']['lin1'])
    if 'att_mlp' in p:
        _linear(sd, f'{prefix}.att_mlp.0', p['att_mlp'])


def _coord_update(sd: Dict, prefix: str, p: Dict) -> None:
    _linear(sd, f'{prefix}.coord_mlp.0', p['lin0'])
    _linear(sd, f'{prefix}.coord_mlp.2', p['lin1'])
    _linear(sd, f'{prefix}.coord_mlp.4', p['lin_out'])


def state_dict_from_dynamics(params: Dict, prefix: str, *, model: str,
                             normalization: str = None) -> Dict:
    """params['dynamics'] -> torch state_dict entries under `prefix`
    (e.g. 'edm.dynamics.dynamics')."""
    sd: Dict = {}
    if model == 'egnn_dynamics':
        egnn = params['egnn']
        _linear(sd, f'{prefix}.embedding', egnn['embedding'])
        _linear(sd, f'{prefix}.embedding_out', egnn['embedding_out'])
        for i, bp in enumerate(egnn['blocks']):
            for j, gp in enumerate(bp['gcls']):
                _gcl(sd, f'{prefix}.e_block_{i}.gcl_{j}', gp)
            _coord_update(sd, f'{prefix}.e_block_{i}.gcl_equiv', bp['coord'])
    else:
        gnn, gstate = params['gnn'], params.get('gnn_state', {})
        _linear(sd, f'{prefix}.embedding', gnn['embedding'])
        _linear(sd, f'{prefix}.embedding_out', gnn['embedding_out'])
        states = gstate.get('gcls', [None] * len(gnn['gcls']))
        for i, (gp, gs) in enumerate(zip(gnn['gcls'], states)):
            _gcl(sd, f'{prefix}.gcl_{i}', gp, gs, normalization)
    return sd


def state_dict_from_gamma(params: Dict, prefix: str) -> Dict:
    """Learned GammaNetwork params -> torch entries (src/noise.py:131-143;
    PositiveLinear stores the raw pre-softplus weight, exactly like ours)."""
    sd: Dict = {}
    _linear(sd, f'{prefix}.l1', params['l1'])
    _linear(sd, f'{prefix}.l2', params['l2'])
    _linear(sd, f'{prefix}.l3', params['l3'])
    sd[f'{prefix}.gamma_0'] = _t(params['gamma_0'])
    sd[f'{prefix}.gamma_1'] = _t(params['gamma_1'])
    return sd


def hparams_from_config(cfg) -> Dict:
    """ExperimentConfig -> the Lightning `hyper_parameters` dict the
    reference's DDPM saves (src/lightning.py:39-51) — the inverse of
    lightning_import.config_from_ddpm_hparams. The exported dict is
    ctor-complete: `DDPM(**hparams)` constructs on the reference side."""
    m, d, dt, tr = cfg.model, cfg.diffusion, cfg.data, cfg.train
    gt = m.graph_type.value if hasattr(m.graph_type, 'value') else m.graph_type
    return {
        'in_node_nf': m.in_node_nf, 'n_dims': m.n_dims,
        'context_node_nf': m.context_node_nf, 'hidden_nf': m.hidden_nf,
        'activation': m.activation, 'tanh': m.tanh, 'n_layers': m.n_layers,
        'attention': m.attention, 'norm_constant': m.norm_constant,
        'inv_sublayers': m.inv_sublayers, 'sin_embedding': m.sin_embedding,
        'normalization_factor': m.normalization_factor,
        'aggregation_method': m.aggregation_method,
        'diffusion_steps': d.timesteps,
        'diffusion_noise_schedule': d.noise_schedule,
        'diffusion_noise_precision': d.noise_precision,
        'diffusion_loss_type': d.loss_type,
        'normalize_factors': list(d.norm_values),
        'include_charges': dt.include_charges, 'model': m.model,
        'data_path': dt.data_path, 'train_data_prefix': dt.train_prefix,
        'val_data_prefix': dt.val_prefix, 'batch_size': tr.batch_size,
        'lr': tr.lr, 'torch_device': 'cpu', 'test_epochs': tr.test_epochs,
        'n_stability_samples': tr.n_stability_samples,
        'normalization': m.normalization, 'log_iterations': None,
        'samples_dir': None, 'data_augmentation': tr.data_augmentation,
        'center_of_mass': (tr.center_of_mass.value
                           if hasattr(tr.center_of_mass, 'value')
                           else tr.center_of_mass),
        'inpainting': d.inpainting, 'anchors_context': tr.anchors_context,
        'graph_type': gt,
    }


def save_size_checkpoint(path: str, predictor, params: Dict, state: Dict,
                         epoch: int = 0, is_geom: bool = False) -> None:
    """Write a reference-format SizeClassifier/Ordinal/Regressor `.ckpt`
    (src/linker_size_lightning.py:20-51: hyper_parameters + `gnn.*`
    state_dict; SizeGNN layout = embedding_in, gcl1, gcl_layers.{i},
    embedding_out). `predictor` is a models.size_gnn.SizePredictor;
    `state` its BatchNorm running stats ({'gcls': [...]})."""
    import torch
    sd: Dict = {}
    _linear(sd, 'gnn.embedding_in', params['embedding_in'])
    _linear(sd, 'gnn.embedding_out', params['embedding_out'])
    states = state.get('gcls', [None] * len(params['gcls']))
    for i, (gp, gs) in enumerate(zip(params['gcls'], states)):
        prefix = 'gnn.gcl1' if i == 0 else f'gnn.gcl_layers.{i - 1}'
        _gcl(sd, prefix, gp, gs, predictor.normalization)
    sd = {k: v.float() if v.is_floating_point() else v for k, v in sd.items()}
    id2size = predictor.id2size
    hp = {
        'data_path': 'datasets',
        'train_data_prefix': ('geom_multifrag_train' if is_geom
                              else 'zinc_final_train'),
        'val_data_prefix': ('geom_multifrag_val' if is_geom
                            else 'zinc_final_val'),
        'in_node_nf': predictor.in_node_nf,
        'hidden_nf': predictor.hidden_nf,
        'out_node_nf': predictor.out_node_nf,
        'n_layers': predictor.n_layers, 'batch_size': 256, 'lr': 1e-3,
        'torch_device': 'cpu', 'normalization': predictor.normalization,
        'min_linker_size': min(id2size), 'task': predictor.task,
        'linker_size2id': dict(predictor.size2id),
        'linker_id2size': list(id2size),
    }
    if predictor.task == 'classification':
        hp['loss_weights'] = None
    if predictor.with_pocket:
        # only written when True: the reference SizeClassifier ctor has no
        # with_pocket kwarg (it is a forward() flag the CALLER passes,
        # src/linker_size_lightning.py:83), so no-pocket exports stay
        # loadable by the reference's own load_from_checkpoint; our
        # cli.sample.load_size_spec reads it to wire fragment_only_mask
        hp['with_pocket'] = True
    torch.save({'hyper_parameters': hp, 'state_dict': sd, 'epoch': epoch},
               path)


def save_ddpm_checkpoint(path: str, cfg, params: Dict, epoch: int = 0) -> None:
    """Write a reference-format DiffLinker `.ckpt` from (config, params).

    The fixed-schedule gamma table is rebuilt float64->cast exactly as both
    frameworks bake it (src/noise.py:92-124 / diffusion/schedules.py), so
    the exported buffer is bit-identical to what the reference would
    construct — load_ddpm_checkpoint's parity guard accepts the roundtrip.
    """
    import torch
    sd = state_dict_from_dynamics(
        params['dynamics'], 'edm.dynamics.dynamics', model=cfg.model.model,
        normalization=cfg.model.normalization)
    if cfg.diffusion.noise_schedule == 'learned':
        sd.update(state_dict_from_gamma(params['gamma'], 'edm.gamma'))
    else:
        from difflinker_tpu.diffusion.schedules import gamma_lookup_table
        sd['edm.gamma.gamma'] = _t(gamma_lookup_table(
            cfg.diffusion.noise_schedule, cfg.diffusion.timesteps,
            cfg.diffusion.noise_precision))
    sd = {k: v.float() if v.is_floating_point() else v for k, v in sd.items()}
    torch.save({'hyper_parameters': hparams_from_config(cfg),
                'state_dict': sd, 'epoch': epoch}, path)
