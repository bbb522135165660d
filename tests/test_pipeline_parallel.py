"""Pipeline parallelism over EGNN blocks: the `stages` mesh axis.

The fourth parallelism axis (after data/atoms/senders): blocks partitioned
over stages, microbatches circulated with ppermute (parallel/pipeline.py).
The reference's sequential EquivariantBlock stack (src/egnn.py:181-238) is
the partitioned structure. These tests pin (a) numerics equality with the
single-device dense program for forward / gradients / a full train step /
the reverse sampling chain, (b) that the compiled program really moves data
with collective-permute (it's a pipeline, not a hidden all-gather), and
(c) the composition guards (dense-layout-only, divisibility).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                   ExperimentConfig, GraphType, ModelConfig,
                                   TrainConfig)
from difflinker_tpu.data.collate import reference_edge_mask
from difflinker_tpu.models.dynamics import dynamics_apply
from difflinker_tpu.models.egnn import egnn_apply, init_egnn
from difflinker_tpu.parallel import mesh as mesh_lib
from difflinker_tpu.parallel.pipeline import egnn_apply_pp
from difflinker_tpu.sample.sampler import LinkerSampler
from difflinker_tpu.train.trainer import Trainer


def _mcfg(**kw):
    base = dict(in_node_nf=8, context_node_nf=2, hidden_nf=32, n_layers=4,
                attention=True, tanh=True, norm_constant=1e-6)
    base.update(kw)
    return ModelConfig(**base)


def _graph(B=8, N=12, nf=11, n_real=10, seed=0):
    rng = np.random.default_rng(seed)
    nm = np.ones((B, N, 1), np.float32)
    nm[:, n_real:] = 0
    lm = np.zeros((B, N, 1), np.float32)
    lm[:, 4:n_real] = 1
    em = np.abs(reference_edge_mask(nm[..., 0])).astype(np.float32)
    h = rng.standard_normal((B, N, nf)).astype(np.float32) * nm
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * nm
    return (jnp.asarray(h), jnp.asarray(x), jnp.asarray(nm), jnp.asarray(lm),
            jnp.asarray(em))


def _exp_cfg():
    return ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                          n_layers=2, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=10),
        data=DataConfig(),
        train=TrainConfig(lr=1e-3, batch_size=8))


def _batch(B=8, N=16, nf=8, n_frag=5):
    rng = np.random.default_rng(0)
    nm = np.ones((B, N, 1), np.float32)
    frag = np.zeros((B, N, 1), np.float32)
    frag[:, :n_frag] = 1
    anchors = np.zeros((B, N, 1), np.float32)
    anchors[:, [1, n_frag - 1]] = 1
    return {
        'positions': rng.standard_normal((B, N, 3)).astype(np.float32) * 2,
        'one_hot': np.eye(nf, dtype=np.float32)[rng.integers(0, nf, (B, N))],
        'atom_mask': nm, 'fragment_mask': frag, 'linker_mask': nm - frag,
        'anchors': anchors, 'edge_mask': reference_edge_mask(nm[..., 0]),
    }


def test_pp_forward_matches_dense():
    cfg = _mcfg()
    p = init_egnn(jax.random.PRNGKey(0), 11, 32, out_node_nf=11, n_layers=4,
                  inv_sublayers=2, attention=True, tanh=True)
    h, x, nm, lm, em = _graph()
    h0, x0 = egnn_apply(p, h, x, nm, lm, em, cfg=cfg)
    mesh = mesh_lib.make_mesh_pp(2, 4)  # data=2 × stages=4, 1 block/stage
    h1, x1 = egnn_apply_pp(p, h, x, nm, lm, em, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=2e-6)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=2e-6)


def test_pp_more_microbatches_than_stages():
    """M > S exercises the general schedule (bubble shrinks as M grows)."""
    cfg = _mcfg()
    p = init_egnn(jax.random.PRNGKey(0), 11, 32, out_node_nf=11, n_layers=4,
                  inv_sublayers=2, attention=True, tanh=True)
    h, x, nm, lm, em = _graph()
    h0, x0 = egnn_apply(p, h, x, nm, lm, em, cfg=cfg)
    mesh = mesh_lib.make_mesh_pp(1, 2)  # stages=2, local batch 8, M=4
    h1, x1 = egnn_apply_pp(p, h, x, nm, lm, em, cfg=cfg, mesh=mesh,
                           n_microbatches=4)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=2e-6)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=2e-6)


def test_pp_emits_collective_permute():
    """The compiled program moves activations stage→stage with
    collective-permute — a real pipeline, not a replicated recompute."""
    cfg = _mcfg()
    p = init_egnn(jax.random.PRNGKey(0), 11, 32, out_node_nf=11, n_layers=4,
                  inv_sublayers=2, attention=True, tanh=True)
    h, x, nm, lm, em = _graph()
    mesh = mesh_lib.make_mesh_pp(2, 4)
    fn = jax.jit(lambda *a: egnn_apply_pp(*a, cfg=cfg, mesh=mesh))
    hlo = fn.lower(p, h, x, nm, lm, em).compile().as_text()
    assert 'collective-permute' in hlo


def test_pp_grad_matches_dense():
    cfg = _mcfg()
    p = init_egnn(jax.random.PRNGKey(0), 11, 32, out_node_nf=11, n_layers=4,
                  inv_sublayers=2, attention=True, tanh=True)
    h, x, nm, lm, em = _graph()
    mesh = mesh_lib.make_mesh_pp(2, 4)

    def loss_dense(pp):
        a, b = egnn_apply(pp, h, x, nm, lm, em, cfg=cfg)
        return jnp.mean(a ** 2) + jnp.mean(b ** 2)

    def loss_pp(pp):
        a, b = egnn_apply_pp(pp, h, x, nm, lm, em, cfg=cfg, mesh=mesh)
        return jnp.mean(a ** 2) + jnp.mean(b ** 2)

    g0 = jax.grad(loss_dense)(p)
    g1 = jax.jit(jax.grad(loss_pp))(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-5)


def test_pp_bf16_matches_dense_bf16():
    """The mixed-precision path pipelines identically (same bf16 casts on
    both sides)."""
    cfg = _mcfg(dtype='bfloat16')
    p = init_egnn(jax.random.PRNGKey(0), 11, 32, out_node_nf=11, n_layers=4,
                  inv_sublayers=2, attention=True, tanh=True)
    h, x, nm, lm, em = _graph()
    h0, x0 = egnn_apply(p, h, x, nm, lm, em, cfg=cfg)
    mesh = mesh_lib.make_mesh_pp(2, 4)
    h1, x1 = egnn_apply_pp(p, h, x, nm, lm, em, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               atol=2e-2, rtol=2e-2)


def test_pp_train_step_matches_single_device():
    """Full train step (loss + grads + AdamW update) on a 4×2 data×stages
    mesh == the single-device step, through the unchanged Trainer."""
    cfg = _exp_cfg()
    batch = _batch()

    t0 = Trainer(cfg)
    s0 = t0.init_state(jax.random.PRNGKey(0))
    s0, m0 = t0.compiled_train_step()(
        s0, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(1), jnp.inf)

    mesh = mesh_lib.make_mesh_pp(4, 2)
    t1 = Trainer(cfg, mesh=mesh)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    s1, m1 = t1.compiled_train_step()(
        s1, t1._device_batch(batch), jax.random.PRNGKey(1), jnp.inf)

    assert abs(float(m1['loss']) - float(m0['loss'])) < 1e-5
    for a, b in zip(jax.tree.leaves(s0['params']),
                    jax.tree.leaves(s1['params'])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_pp_epoch_scan_matches_single_device():
    """The scanned multi-step epoch program (lax.scan over batches, the
    production train path) pipelines identically: 3 stacked steps on the
    4×2 data×stages mesh == single device."""
    cfg = _exp_cfg()
    b = _batch()
    stacked = {k: np.stack([v, v, v]) for k, v in b.items()}
    stacked['sample_weight'] = np.ones(stacked['positions'].shape[:2],
                                       np.float32)

    t0 = Trainer(cfg)
    s0 = t0.init_state(jax.random.PRNGKey(0))
    s0, m0 = t0.compiled_epoch_scan()(
        s0, {k: jnp.asarray(v) for k, v in stacked.items()},
        jax.random.PRNGKey(1), jnp.inf)

    mesh = mesh_lib.make_mesh_pp(4, 2)
    t1 = Trainer(cfg, mesh=mesh)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    s1, m1 = t1._sharded_jit(t1.epoch_scan_step, n_lead=1, n_post=2,
                             out_n=2)(
        s1, {k: jnp.asarray(v) for k, v in stacked.items()},
        jax.random.PRNGKey(1), jnp.inf)
    assert abs(float(m1['loss']) - float(m0['loss'])) < 1e-5
    assert int(s1['step']) == 3
    for a, b2 in zip(jax.tree.leaves(s0['params']),
                     jax.tree.leaves(s1['params'])):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(a), atol=1e-5)


def test_pp_sampler_matches_single_device():
    """The jitted reverse chain (lax.scan of shard_map steps) on the
    data×stages mesh reproduces the single-device samples."""
    cfg = _exp_cfg()
    scfg = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(cfg.diffusion, timesteps=5))
    batch = _batch()
    trainer = Trainer(cfg)
    params = trainer.edm.init_params(jax.random.PRNGKey(0))

    out0 = LinkerSampler(scfg, params).sample(
        batch, jax.random.PRNGKey(2), size_spec=4)
    mesh = mesh_lib.make_mesh_pp(4, 2)
    out1 = LinkerSampler(scfg, params, mesh=mesh).sample(
        batch, jax.random.PRNGKey(2), size_spec=4)
    assert not out1['nan_flag'].any()
    np.testing.assert_allclose(out1['positions'], out0['positions'],
                               atol=1e-5)


def test_pp_rejects_sparse_layouts():
    """neighbor_k / tile_size need gathers over the full node axis —
    composing them with stage partitioning is refused, not silently wrong."""
    mesh = mesh_lib.make_mesh_pp(4, 2)
    cfg = _mcfg(n_layers=2, graph_type=GraphType.A4, neighbor_k=4,
                context_node_nf=2)
    from difflinker_tpu.models.dynamics import init_dynamics
    params = init_dynamics(jax.random.PRNGKey(0), cfg)
    B, N = 8, 16
    xh = jnp.zeros((B, N, 3 + 8))
    nm = jnp.ones((B, N, 1))
    ctx = jnp.concatenate([jnp.ones((B, N, 1)), jnp.zeros((B, N, 1))], -1)
    with mesh_lib.sharding_hints(mesh):
        with pytest.raises(ValueError, match='dense egnn_dynamics'):
            dynamics_apply(params, 0.5, xh, nm, nm, None, ctx, cfg=cfg)


def test_pp_layer_divisibility_error():
    cfg = _mcfg(n_layers=3)  # 3 blocks don't split over 2 stages
    p = init_egnn(jax.random.PRNGKey(0), 11, 32, out_node_nf=11, n_layers=3,
                  inv_sublayers=2, attention=True, tanh=True)
    h, x, nm, lm, em = _graph()
    mesh = mesh_lib.make_mesh_pp(4, 2)
    with pytest.raises(ValueError, match='n_layers'):
        egnn_apply_pp(p, h, x, nm, lm, em, cfg=cfg, mesh=mesh)


def test_pp_microbatches_clamp_to_local_batch():
    """A ragged batch whose local share can't split into S microbatches
    still pipelines (M clamps to the largest divisor, down to 1 == full
    bubble) — eval batches of local size 1 must not crash."""
    cfg = _mcfg()
    p = init_egnn(jax.random.PRNGKey(0), 11, 32, out_node_nf=11, n_layers=4,
                  inv_sublayers=2, attention=True, tanh=True)
    h, x, nm, lm, em = _graph(B=4)      # local batch 4/4 = 1 → M clamps to 1
    h0, x0 = egnn_apply(p, h, x, nm, lm, em, cfg=cfg)
    mesh = mesh_lib.make_mesh_pp(4, 2)
    h1, x1 = egnn_apply_pp(p, h, x, nm, lm, em, cfg=cfg, mesh=mesh,
                           n_microbatches=3)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=2e-6)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=2e-6)
