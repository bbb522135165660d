"""Sparse K-neighbor-list path vs the dense distance-graph path.

The sparse layout (ops/geometry.neighbor_lists + models/egnn sparse ops) is a
pure data-layout change: with K >= the true max degree it must compute the
SAME message sums as the dense (B, N, N) masked path, for forward, chain and
gradients. Truncation (K < degree) drops the farthest edges by design.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                   ExperimentConfig, GraphType, ModelConfig,
                                   TrainConfig)
from difflinker_tpu.models.dynamics import dynamics_apply, init_dynamics
from difflinker_tpu.ops import geometry


def _pocket_cfg(graph='4A', k=None, **kw):
    return ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=32,
                       n_layers=2, inv_sublayers=2, norm_constant=1e-6,
                       graph_type=GraphType(graph), neighbor_k=k, **kw)


def _pocket_batch(rng, B=3, N=24, nf=9, n_frag=6, n_pocket=8):
    node_mask = np.ones((B, N, 1), np.float32)
    node_mask[:, N - 2:] = 0  # padding
    frag_only = np.zeros((B, N, 1), np.float32)
    frag_only[:, :n_frag] = 1
    pocket = np.zeros((B, N, 1), np.float32)
    pocket[:, n_frag:n_frag + n_pocket] = 1
    link = (node_mask - frag_only - pocket) * node_mask
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * 2.5 * node_mask
    h = (np.eye(nf, dtype=np.float32)[rng.integers(0, nf, (B, N))]
         * node_mask)
    anchors = np.zeros((B, N, 1), np.float32)
    anchors[:, [0, n_frag - 1]] = 1
    ctx = np.concatenate([anchors, frag_only, pocket], -1) * node_mask
    xh = np.concatenate([x, h], -1)
    return (jnp.asarray(xh), jnp.asarray(node_mask), jnp.asarray(link),
            jnp.asarray(ctx), jnp.asarray(frag_only), jnp.asarray(pocket))


def test_neighbor_lists_cover_dense_adjacency(rng):
    """K=N neighbor lists reproduce the dense adjacency edge set exactly."""
    xh, nm, link, ctx, frag_only, pocket = _pocket_batch(rng)
    x = xh[..., :3]
    for graph in ('4A', 'FC-4A', 'FC-10A-4A'):
        dense = geometry.distance_edge_mask(x, nm, link, frag_only, pocket,
                                            graph)[..., 0]
        idx, mask = geometry.neighbor_lists(x, nm, link, frag_only, pocket,
                                            graph, k=x.shape[1])
        # scatter the sparse edges back into a dense adjacency
        B, N, K = idx.shape
        rebuilt = np.zeros((B, N, N), np.float32)
        for b in range(B):
            for i in range(N):
                for kk in range(K):
                    if mask[b, i, kk, 0] > 0:
                        rebuilt[b, i, int(idx[b, i, kk])] = 1.0
        np.testing.assert_array_equal(rebuilt, np.asarray(dense))
        # neighbor counts match the dense row degree
        np.testing.assert_array_equal(
            np.asarray(mask[..., 0].sum(-1)), np.asarray(dense.sum(-1)))


@pytest.mark.parametrize('graph', ['4A', 'FC-10A-4A'])
@pytest.mark.parametrize('agg', ['sum', 'mean'])
def test_sparse_forward_matches_dense(rng, graph, agg):
    """K=N sparse forward == dense forward (same params, same numbers)."""
    xh, nm, link, ctx, *_ = _pocket_batch(rng)
    cfg_d = _pocket_cfg(graph, aggregation_method=agg)
    cfg_s = dataclasses.replace(cfg_d, neighbor_k=xh.shape[1])
    params = init_dynamics(jax.random.PRNGKey(0), cfg_d)
    t = jnp.full((xh.shape[0], 1), 0.4)
    dense, nan_d = dynamics_apply(params, t, xh, nm, link, None, ctx,
                                  cfg=cfg_d)
    sparse, nan_s = dynamics_apply(params, t, xh, nm, link, None, ctx,
                                   cfg=cfg_s)
    assert not nan_d.any() and not nan_s.any()
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)


def test_sparse_k_truncation_close_at_realistic_k(rng):
    """K=16 on a 4A graph (max degree << 16 at realistic coords) is exact;
    an artificially dense cloud with degree > K only perturbs, not corrupts."""
    xh, nm, link, ctx, frag_only, pocket = _pocket_batch(rng)
    x = xh[..., :3]
    deg = geometry.distance_edge_mask(
        x, nm, link, frag_only, pocket, '4A')[..., 0].sum(-1).max()
    assert deg <= 16, 'fixture assumption: realistic 4A degree is small'
    cfg_d = _pocket_cfg('4A')
    cfg_s = dataclasses.replace(cfg_d, neighbor_k=16)
    params = init_dynamics(jax.random.PRNGKey(0), cfg_d)
    t = jnp.full((xh.shape[0], 1), 0.4)
    dense, _ = dynamics_apply(params, t, xh, nm, link, None, ctx, cfg=cfg_d)
    sparse, _ = dynamics_apply(params, t, xh, nm, link, None, ctx, cfg=cfg_s)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)


def test_sparse_training_step_and_gradients(rng):
    """Full train step through the sparse path: finite loss, grads match the
    dense path at K=N (autodiff through gather == masked dense)."""
    from difflinker_tpu.train.trainer import Trainer
    from difflinker_tpu.data.datasets import synthetic_dataset

    def exp_cfg(k):
        return ExperimentConfig(
            model=_pocket_cfg('4A', k=k),
            diffusion=DiffusionConfig(timesteps=20),
            data=DataConfig(family='moad', pocket_mode='full'),
            train=TrainConfig(lr=1e-3, batch_size=4,
                              center_of_mass='anchors'))

    ds = synthetic_dataset(4, seed=3, is_geom=True, pocket_range=(5, 10))
    batch = next(ds.iter_batches(4, group_by_bucket=False))
    N = batch['positions'].shape[1]

    results = {}
    for name, k in (('dense', None), ('sparse', N)):
        trainer = Trainer(exp_cfg(k))
        state = trainer.init_state(jax.random.PRNGKey(0))
        (loss, terms), grads = jax.value_and_grad(
            lambda p: trainer.loss_fn(p, trainer._device_batch(batch),
                                      jax.random.PRNGKey(1), True),
            has_aux=True)(state['params'])
        gnorm = float(jnp.sqrt(sum(jnp.sum(l ** 2)
                                   for l in jax.tree.leaves(grads))))
        assert np.isfinite(float(loss)) and np.isfinite(gnorm)
        results[name] = (float(loss), gnorm)
    # same loss AND gradients through both layouts
    np.testing.assert_allclose(results['sparse'][0], results['dense'][0],
                               rtol=1e-5)
    np.testing.assert_allclose(results['sparse'][1], results['dense'][1],
                               rtol=1e-4)


def test_sparse_sample_chain(rng):
    """Reverse chain through the sparse path: no NaN, fragments frozen."""
    from difflinker_tpu.diffusion.edm import make_edm
    xh, nm, link, ctx, *_ = _pocket_batch(rng)
    frag = (nm - link) * nm
    cfg = _pocket_cfg('4A', k=16)
    edm = make_edm(
        dataclasses.replace(cfg, in_node_nf=9),
        DiffusionConfig(timesteps=6))
    params = edm.init_params(jax.random.PRNGKey(0))
    x, h = xh[..., :3], xh[..., 3:]
    xs, hs, nan = jax.jit(lambda p, key: edm.sample_chain(
        p, key, x, h, nm, frag, link, None, ctx))(params,
                                                  jax.random.PRNGKey(2))
    assert not np.asarray(nan).any()
    np.testing.assert_array_equal(np.asarray(xs * frag), np.asarray(x * frag))
