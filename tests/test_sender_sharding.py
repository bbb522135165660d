"""Tensor parallelism over the pairwise graph op: the `senders` mesh axis.

Sequence parallelism (tests/test_atom_sharding.py) shards the RECEIVER node
axis of the (B, N, N, ·) edge tensors over `atoms`. The third mesh axis here
shards the SENDER node axis, giving a 2-D block decomposition of the O(N²·H)
edge work — the TPU-native counterpart of scaling the reference's edge
index-list loop (src/egnn.py:449-467, 554-596) past one device. Each device
holds an (N/a × N/s) block of every pairwise activation; the collectives are
all node-sized (O(B·N·H) feature reshards plus a psum of the message
aggregate over `senders`), never edge-sized.

Mechanism (parallel/mesh.py): edge-pair inputs shard axis 2 over `senders`,
and `sharding_hints`/`constrain_pair` pin every in-jit pairwise tensor
(coord2diff, fc_edge_mask, distance_edge_mask, the split-weight edge MLP
pre-activations) to the same block layout. These tests pin (a) equality with
the single-device program, (b) that no full-size pairwise tensor survives in
the optimised HLO, across the forward, the trainer and the sampler.
"""
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                   ExperimentConfig, GraphType, ModelConfig,
                                   TrainConfig)
from difflinker_tpu.data.datasets import synthetic_dataset
from difflinker_tpu.diffusion.edm import make_edm
from difflinker_tpu.models.dynamics import dynamics_apply
from difflinker_tpu.ops.geometry import fc_edge_mask
from difflinker_tpu.parallel import mesh as mesh_lib
from difflinker_tpu.sample.sampler import LinkerSampler
from difflinker_tpu.train.trainer import Trainer


def _cfg():
    return ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                          n_layers=2, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=20),
        data=DataConfig(),
        train=TrainConfig(lr=1e-3, batch_size=8))


def _no_full_pairwise(hlo, B, N):
    """No f32 (B, N, N, ·) tensor of any feature width in the module."""
    return sorted(set(re.findall(rf'f32\[{B},{N},{N},\d+\]', hlo)))


def test_sender_sharded_fc_forward_matches_and_blocks_edges():
    """2×2×2 data×atoms×senders forward == single device, and the compiled
    HLO holds the pairwise activations only at the 2-D-blocked
    (B/d, N/a, N/s, H) shape."""
    B, N, H = 2, 32, 32
    mcfg = _cfg().model
    edm = make_edm(mcfg, DiffusionConfig(timesteps=10))
    params = edm.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3 + 8))
    node_mask = jnp.ones((B, N, 1))
    link = jnp.zeros((B, N, 1)).at[:, 10:].set(1.0)
    em = fc_edge_mask(node_mask)
    ctx = jnp.concatenate([1 - link, jnp.zeros((B, N, 1))], axis=-1)
    t = jnp.full((B, 1), 0.4)

    def fwd(params, t, z, nm, lm, em, ctx):
        return dynamics_apply(params['dynamics'], t, z, nm, lm, em, ctx,
                              cfg=mcfg)

    ref, _ = jax.jit(fwd)(params, t, z, node_mask, link, em, ctx)

    mesh = mesh_lib.make_mesh_3d(2, 2, 2)
    assert mesh_lib.sender_axis_size(mesh) == 2
    nsh = mesh_lib.node_sharding(mesh)
    psh = mesh_lib.pair_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    dsh = mesh_lib.batch_sharding(mesh)
    args = (jax.device_put(params, rep), jax.device_put(t, dsh),
            jax.device_put(z, nsh), jax.device_put(node_mask, nsh),
            jax.device_put(link, nsh), jax.device_put(em, psh),
            jax.device_put(ctx, nsh))
    f = jax.jit(fwd, out_shardings=(rep, rep))
    with mesh_lib.sharding_hints(mesh):
        out, _ = f(*args)
        hlo = f.lower(*args).compile().as_text()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert _no_full_pairwise(hlo, B, N) == []
    assert re.search(rf'f32\[{B // 2},{N // 2},{N // 2},{H}\]', hlo)


def test_sender_sharded_pocket_forward_matches_and_blocks_edges():
    """The in-jit distance graph (4A pocket model) also 2-D-blocks: the
    distance_edge_mask / coord2diff constraints pin the pairwise tensors even
    though no sharded edge-mask INPUT exists to propagate from."""
    B, N, H = 2, 32, 32
    mcfg = ModelConfig(in_node_nf=8, context_node_nf=3, hidden_nf=H,
                       n_layers=2, norm_constant=1e-6,
                       graph_type=GraphType.A4)
    params = make_edm(mcfg, DiffusionConfig(timesteps=10)).init_params(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, N, 3 + 8)).astype(np.float32))
    nm = jnp.ones((B, N, 1))
    link = jnp.zeros((B, N, 1)).at[:, 20:].set(1.0)
    frag_only = jnp.zeros((B, N, 1)).at[:, :12].set(1.0)
    pocket_only = nm - link - frag_only
    ctx = jnp.concatenate([frag_only, pocket_only, jnp.zeros((B, N, 1))], -1)
    t = jnp.full((B, 1), 0.4)

    def fwd(params, t, z, nm, lm, ctx):
        return dynamics_apply(params['dynamics'], t, z, nm, lm, None, ctx,
                              cfg=mcfg)

    ref, _ = jax.jit(fwd)(params, t, z, nm, link, ctx)
    mesh = mesh_lib.make_mesh_3d(2, 2, 2)
    nsh = mesh_lib.node_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    dsh = mesh_lib.batch_sharding(mesh)
    args = (jax.device_put(params, rep), jax.device_put(t, dsh),
            jax.device_put(z, nsh), jax.device_put(nm, nsh),
            jax.device_put(link, nsh), jax.device_put(ctx, nsh))
    f = jax.jit(fwd, out_shardings=(rep, rep))
    with mesh_lib.sharding_hints(mesh):
        out, _ = f(*args)
        hlo = f.lower(*args).compile().as_text()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert _no_full_pairwise(hlo, B, N) == []
    assert re.search(rf'f32\[{B // 2},{N // 2},{N // 2},{H}\]', hlo)


def test_sender_sharded_train_step_matches_single_device():
    """One 2×2×2 train step == the single-device step (loss and post-step
    params): sender-axis TP composes with DP's gradient all-reduce and SP's
    node sharding without touching training numerics."""
    cfg = _cfg()
    ds = synthetic_dataset(8, seed=0)
    batch = next(ds.iter_batches(8, group_by_bucket=False))
    assert batch['positions'].shape[1] % 2 == 0
    key0, key1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    t1 = Trainer(cfg)
    s1 = t1.init_state(key0)
    s1, m1 = t1.compiled_train_step()(s1, t1._device_batch(batch), key1,
                                      jnp.inf)

    t8 = Trainer(cfg, mesh=mesh_lib.make_mesh_3d(2, 2, 2))
    s8 = t8.init_state(key0)
    s8, m8 = t8.compiled_train_step()(s8, t8._device_batch(batch), key1,
                                      jnp.asarray(jnp.inf))
    np.testing.assert_allclose(float(m8['loss']), float(m1['loss']),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1['params']),
                    jax.tree.leaves(s8['params'])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_sender_sharded_sampling_matches_single_device():
    """LinkerSampler on a 3-D mesh reproduces the single-device chain
    (N divides both node-sharding axes, so padding is a no-op and the noise
    layout is identical)."""
    cfg = _cfg()
    edm = make_edm(cfg.model, cfg.diffusion)
    params = edm.init_params(jax.random.PRNGKey(0))
    batch = next(synthetic_dataset(4, seed=0).iter_batches(
        4, group_by_bucket=False))
    assert batch['positions'].shape[1] % 2 == 0

    ref = LinkerSampler(cfg, params, edm).sample(
        batch, jax.random.PRNGKey(11), size_spec='ground_truth')
    mesh = mesh_lib.make_mesh_3d(2, 2, 2)
    out = LinkerSampler(cfg, params, edm, mesh=mesh).sample(
        batch, jax.random.PRNGKey(11), size_spec='ground_truth')
    assert not out['nan_flag'].any()
    np.testing.assert_allclose(out['positions'], ref['positions'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out['one_hot'], ref['one_hot'])


def test_sender_only_mesh_trains_and_pads():
    """atoms=1, senders=4 (edge blocks split only along senders) exercises
    the sender-only branch of batch_shardings; a ragged N pads to the
    senders multiple and the step stays finite."""
    cfg = _cfg()
    ds = synthetic_dataset(4, seed=1)
    batch = next(ds.iter_batches(4, group_by_bucket=False))
    mesh = mesh_lib.make_mesh_3d(2, 1, 4)
    assert mesh_lib.node_pad_multiple(mesh) == 4
    tr = Trainer(cfg, mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    dev = tr._device_batch(batch)
    assert dev['positions'].shape[1] % 4 == 0
    state, m = tr.compiled_train_step()(state, dev, jax.random.PRNGKey(1),
                                        jnp.asarray(jnp.inf))
    assert np.isfinite(float(m['loss']))


def test_node_pad_multiple_is_lcm():
    assert mesh_lib.node_pad_multiple(None) == 1
    assert mesh_lib.node_pad_multiple(mesh_lib.make_mesh(8)) == 1
    assert mesh_lib.node_pad_multiple(mesh_lib.make_mesh_2d(2, 4)) == 4
    assert mesh_lib.node_pad_multiple(mesh_lib.make_mesh_3d(2, 2, 2)) == 2
    assert mesh_lib.node_pad_multiple(mesh_lib.make_mesh_3d(1, 2, 4)) == 4
    assert mesh_lib.node_pad_multiple(mesh_lib.make_mesh_3d(1, 4, 2)) == 4


def test_sender_sharded_epoch_scan_runs():
    """The one-dispatch-per-epoch path trains on the 3-D mesh (stacked
    (S, B, N, N, 1) edge masks shard over data, atoms AND senders)."""
    from difflinker_tpu.data.packed import PackedDataset
    cfg = _cfg()
    ds = synthetic_dataset(16, seed=0)
    packed = PackedDataset(ds.samples)
    trainer = Trainer(cfg, mesh=mesh_lib.make_mesh_3d(2, 2, 2))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, m = trainer.fit_epoch_scanned(state, packed, 8,
                                         jax.random.PRNGKey(1))
    assert np.isfinite(m['loss'])
    assert int(state['step']) == len(packed.packs)


def test_hints_are_noop_without_senders_axis():
    """constrain_pair under a 1-D/2-D hints mesh (or none) returns its input
    unchanged — existing DP / DP×SP programs are untouched."""
    x = jnp.ones((2, 8, 8, 3))
    assert mesh_lib.constrain_pair(x) is x
    with mesh_lib.sharding_hints(None):
        assert mesh_lib.constrain_pair(x) is x
    with mesh_lib.sharding_hints(mesh_lib.make_mesh_2d(2, 4)):
        assert mesh_lib.constrain_pair(x) is x
    with mesh_lib.sharding_hints(mesh_lib.make_mesh_3d(2, 2, 2)):
        # wrong rank: left alone rather than mis-annotated
        assert mesh_lib.constrain_pair(jnp.ones((4, 8, 8))) is not None
        y = mesh_lib.constrain_pair(x)
        assert y.shape == x.shape


def test_sender_sharded_sparse_k_train_step_matches_single_device():
    """A sparse-K pocket model on the 3-D mesh: the senders axis targets the
    DENSE pairwise layout, but sparse layouts must stay CORRECT under it
    (the constrained (B, N, N, 1) adjacency inside neighbor_lists is
    re-gathered for the top-k; K-axis tensors are left alone)."""
    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=32,
                          n_layers=2, norm_constant=1e-6,
                          graph_type=GraphType.A4, neighbor_k=8),
        diffusion=DiffusionConfig(timesteps=20),
        data=DataConfig(family='moad', pocket_mode='full'),
        train=TrainConfig(lr=1e-3, batch_size=4, center_of_mass='anchors'))
    ds = synthetic_dataset(8, seed=3, is_geom=True, pocket_range=(5, 10))
    batch = next(ds.iter_batches(4, group_by_bucket=False))
    if batch['positions'].shape[1] % 2:
        batch = mesh_lib.pad_nodes_to_multiple(batch, 2)
    key0, key1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    t1 = Trainer(cfg)
    s1 = t1.init_state(key0)
    s1, m1 = t1.compiled_train_step()(s1, t1._device_batch(batch), key1,
                                      jnp.inf)

    t8 = Trainer(cfg, mesh=mesh_lib.make_mesh_3d(2, 2, 2))
    s8 = t8.init_state(key0)
    s8, m8 = t8.compiled_train_step()(s8, t8._device_batch(batch), key1,
                                      jnp.asarray(jnp.inf))
    np.testing.assert_allclose(float(m8['loss']), float(m1['loss']),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1['params']),
                    jax.tree.leaves(s8['params'])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_sender_sharded_inpainting_matches_single_device():
    """InpaintingEDM's per-step CoM re-projection (a cross-shard node
    reduction) and q-mixing compose with the 2-D edge blocking: the 3-D
    mesh reproduces the single-device chain exactly."""
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, centering=True),
        diffusion=dataclasses.replace(cfg.diffusion, inpainting=True,
                                      timesteps=6))
    edm = make_edm(cfg.model, cfg.diffusion)
    params = edm.init_params(jax.random.PRNGKey(0))
    batch = next(synthetic_dataset(4, seed=0).iter_batches(
        4, group_by_bucket=False))
    assert batch['positions'].shape[1] % 2 == 0

    ref = LinkerSampler(cfg, params, edm).sample(batch, jax.random.PRNGKey(7))
    mesh = mesh_lib.make_mesh_3d(2, 2, 2)
    out = LinkerSampler(cfg, params, edm, mesh=mesh).sample(
        batch, jax.random.PRNGKey(7))
    assert not out['nan_flag'].any()
    np.testing.assert_allclose(out['positions'], ref['positions'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out['one_hot'], ref['one_hot'])
