"""Golden parity tests: the dense JAX EGNN/Dynamics must reproduce the torch
reference (loaded from /root/reference, torch CPU) bit-tight in float32 after
weight conversion. This validates both the model math and the checkpoint
converter without needing released checkpoints."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from src.egnn import Dynamics as TorchDynamics  # noqa: E402
from src.egnn import DynamicsWithPockets as TorchDynamicsWithPockets  # noqa: E402

from difflinker_tpu.config import GraphType, ModelConfig  # noqa: E402
from difflinker_tpu.io.lightning_import import convert_dynamics  # noqa: E402
from difflinker_tpu.models.dynamics import dynamics_apply  # noqa: E402

from conftest import make_batch  # noqa: E402


def _torch_inputs(batch, t_val=0.4):
    B, N, _ = batch['positions'].shape
    xh = np.concatenate([batch['positions'], batch['one_hot']], axis=-1)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], axis=-1)
    t = np.full((B, 1), t_val, np.float32)
    return xh, context, t


def _run_pair(cfg: ModelConfig, batch, pockets=False, context=None, seed=7):
    torch.manual_seed(seed)
    klass = TorchDynamicsWithPockets if pockets else TorchDynamics
    tmodel = klass(
        n_dims=3, in_node_nf=cfg.in_node_nf, context_node_nf=cfg.context_node_nf,
        hidden_nf=cfg.hidden_nf, activation=torch.nn.SiLU(),
        n_layers=cfg.n_layers, attention=cfg.attention, condition_time=True,
        tanh=cfg.tanh, norm_constant=cfg.norm_constant,
        inv_sublayers=cfg.inv_sublayers, sin_embedding=cfg.sin_embedding,
        normalization_factor=cfg.normalization_factor,
        aggregation_method=cfg.aggregation_method, model=cfg.model,
        centering=cfg.centering, graph_type=cfg.graph_type.value,
    ).eval()

    xh, default_ctx, t = _torch_inputs(batch)
    if context is None:
        context = default_ctx
    B, N = xh.shape[:2]
    edge_mask_flat = torch.tensor(batch['edge_mask'].reshape(B * N * N, 1))

    with torch.no_grad():
        ref = tmodel.forward(
            t=torch.tensor(t), xh=torch.tensor(xh),
            node_mask=torch.tensor(batch['atom_mask']),
            linker_mask=torch.tensor(batch['linker_mask']),
            edge_mask=edge_mask_flat,
            context=torch.tensor(context),
        ).numpy()

    params = convert_dynamics(
        tmodel.state_dict(), '', model=cfg.model, n_layers=cfg.n_layers,
        inv_sublayers=cfg.inv_sublayers, attention=cfg.attention,
        normalization=cfg.normalization)

    ours, nan_flag = dynamics_apply(
        params, jnp.asarray(t), jnp.asarray(xh),
        jnp.asarray(batch['atom_mask']), jnp.asarray(batch['linker_mask']),
        jnp.asarray(batch['edge_mask']), jnp.asarray(context), cfg=cfg)
    return ref, np.asarray(ours), np.asarray(nan_flag)


@pytest.mark.parametrize('attention,tanh,sin_embedding', [
    (False, False, False),   # zinc/geom/pockets config shape
    (True, True, True),      # exercise every optional path
])
def test_dynamics_parity(rng, attention, tanh, sin_embedding):
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                      n_layers=2, inv_sublayers=2, attention=attention,
                      tanh=tanh, sin_embedding=sin_embedding,
                      norm_constant=1e-6)
    batch = make_batch(rng, B=3, N=14, nf=8, n_frag=6, n_real=11)
    ref, ours, nan_flag = _run_pair(cfg, batch)
    assert not nan_flag.any()
    # fp32 accumulation order differs between the dense row-sum and torch's
    # scatter_add; tolerance covers that, nothing more.
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_dynamics_parity_mean_aggregation(rng):
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=16,
                      n_layers=1, aggregation_method='mean',
                      normalization_factor=1, norm_constant=1e-6)
    batch = make_batch(rng, B=2, N=10, nf=8, n_frag=4, n_real=8)
    ref, ours, _ = _run_pair(cfg, batch)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('graph_type', ['4A', 'FC-4A', 'FC-10A-4A'])
def test_dynamics_with_pockets_parity(rng, graph_type):
    cfg = ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=32,
                      n_layers=2, norm_constant=1e-6,
                      graph_type=GraphType(graph_type))
    batch = make_batch(rng, B=2, N=20, nf=9, n_frag=5, n_real=17, pocket=6)
    # pocket context: [anchors, fragment_only, pocket_only]
    context = np.concatenate(
        [batch['anchors'], batch['fragment_only_mask'], batch['pocket_mask']],
        axis=-1)
    # spread coords so the 4A cutoff graph is non-trivial
    batch['positions'] = batch['positions'] * 2.5

    # torch pocket model takes edge_mask = per-node batch index vector
    B, N = batch['positions'].shape[:2]
    torch.manual_seed(3)
    tmodel = TorchDynamicsWithPockets(
        n_dims=3, in_node_nf=9, context_node_nf=3, hidden_nf=32,
        activation=torch.nn.SiLU(), n_layers=2, attention=False,
        condition_time=True, tanh=False, norm_constant=1e-6, inv_sublayers=2,
        sin_embedding=False, normalization_factor=100,
        aggregation_method='sum', model='egnn_dynamics',
        graph_type=graph_type).eval()

    xh = np.concatenate([batch['positions'], batch['one_hot']], axis=-1)
    t = np.full((B, 1), 0.3, np.float32)
    batch_idx = torch.arange(B).repeat_interleave(N)
    with torch.no_grad():
        ref = tmodel.forward(
            t=torch.tensor(t), xh=torch.tensor(xh),
            node_mask=torch.tensor(batch['atom_mask']),
            linker_mask=torch.tensor(batch['linker_mask']),
            edge_mask=batch_idx,
            context=torch.tensor(context)).numpy()

    params = convert_dynamics(tmodel.state_dict(), '', model='egnn_dynamics',
                              n_layers=2, inv_sublayers=2, attention=False)
    ours, _ = dynamics_apply(
        params, jnp.asarray(t), jnp.asarray(xh),
        jnp.asarray(batch['atom_mask']), jnp.asarray(batch['linker_mask']),
        None, jnp.asarray(context), cfg=cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_gnn_dynamics_parity(rng):
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=16,
                      n_layers=2, model='gnn_dynamics',
                      normalization_factor=1, norm_constant=1e-6)
    batch = make_batch(rng, B=2, N=10, nf=8, n_frag=4, n_real=8)
    ref, ours, _ = _run_pair(cfg, batch)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_tanh_coords_range_parity(rng):
    """The tanh clamp uses the FULL coords_range per block (src/egnn.py:209,
    136, 149 — the /n_layers attribute at :191 is dead code). The xavier-0.001
    init makes phi tiny, so scale the coordinate-MLP outputs up until the
    tanh*range factor dominates and any mis-scaling is visible."""
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                      n_layers=4, inv_sublayers=1, tanh=True,
                      norm_constant=1e-6)
    batch = make_batch(rng, B=2, N=10, nf=8, n_frag=4, n_real=8)

    torch.manual_seed(21)
    tmodel = TorchDynamics(
        n_dims=3, in_node_nf=8, context_node_nf=2, hidden_nf=32,
        activation=torch.nn.SiLU(), n_layers=4, attention=False,
        condition_time=True, tanh=True, norm_constant=1e-6, inv_sublayers=1,
        sin_embedding=False, normalization_factor=100,
        aggregation_method='sum', model='egnn_dynamics').eval()
    with torch.no_grad():
        for blk in range(4):
            layer = getattr(tmodel.dynamics, f'e_block_{blk}')._modules['gcl_equiv']
            layer.coord_mlp[4].weight *= 2000.0  # push tanh into saturation

    xh = np.concatenate([batch['positions'], batch['one_hot']], -1)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)
    t = np.full((2, 1), 0.4, np.float32)
    B, N = 2, 10
    with torch.no_grad():
        ref = tmodel.forward(
            t=torch.tensor(t), xh=torch.tensor(xh),
            node_mask=torch.tensor(batch['atom_mask']),
            linker_mask=torch.tensor(batch['linker_mask']),
            edge_mask=torch.tensor(batch['edge_mask'].reshape(B * N * N, 1)),
            context=torch.tensor(context)).numpy()

    params = convert_dynamics(tmodel.state_dict(), '', model='egnn_dynamics',
                              n_layers=4, inv_sublayers=1, attention=False)
    ours, _ = dynamics_apply(
        params, jnp.asarray(t), jnp.asarray(xh),
        jnp.asarray(batch['atom_mask']), jnp.asarray(batch['linker_mask']),
        jnp.asarray(batch['edge_mask']), jnp.asarray(context), cfg=cfg)
    vel_ref, vel_ours = ref[..., :3], np.asarray(ours)[..., :3]
    assert np.abs(vel_ref).max() > 0.05  # the clamp actually engaged
    np.testing.assert_allclose(vel_ours, vel_ref, atol=5e-4, rtol=1e-3)
