"""Block-sparse tile-pair path vs the dense distance-graph path.

The tile layout (ops/geometry.tile_neighbor_lists + models/egnn tile ops) is
a pure data-layout change: with M covering every tile pair that holds an
admissible edge it must compute the SAME message sums as the dense (B, N, N)
masked path, for forward, chain and gradients.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflinker_tpu.config import DiffusionConfig, GraphType, ModelConfig
from difflinker_tpu.models.dynamics import dynamics_apply, init_dynamics
from difflinker_tpu.ops import geometry

from test_sparse_neighbors import _pocket_batch


def _tile_cfg(graph='4A', tile=None, m=None, **kw):
    return ModelConfig(in_node_nf=9, context_node_nf=3, hidden_nf=32,
                       n_layers=2, inv_sublayers=2, norm_constant=1e-6,
                       graph_type=GraphType(graph), tile_size=tile,
                       tile_neighbors=m, **kw)


def test_tile_lists_cover_dense_adjacency(rng):
    """M=nT tile lists reproduce the dense adjacency edge set exactly."""
    xh, nm, link, ctx, frag_only, pocket = _pocket_batch(rng)
    x = xh[..., :3]
    tile = 8
    nT = x.shape[1] // tile
    for graph in ('4A', 'FC-4A', 'FC-10A-4A'):
        dense = geometry.distance_edge_mask(x, nm, link, frag_only, pocket,
                                            graph)[..., 0]
        tidx, emask = geometry.tile_neighbor_lists(
            x, nm, link, frag_only, pocket, graph, tile, nT)
        B, N = x.shape[:2]
        rebuilt = np.zeros((B, N, N), np.float32)
        em = np.asarray(emask)[..., 0].reshape(B, nT, tile, nT * tile)
        ti = np.asarray(tidx)
        for b in range(B):
            for a in range(nT):
                for r in range(tile):
                    for mth in range(nT):
                        jt = int(ti[b, a, mth])
                        blk = em[b, a, r, mth * tile:(mth + 1) * tile]
                        rebuilt[b, a * tile + r,
                                jt * tile:(jt + 1) * tile] = blk
        np.testing.assert_array_equal(rebuilt, np.asarray(dense))


@pytest.mark.parametrize('graph', ['4A', 'FC-10A-4A'])
@pytest.mark.parametrize('agg', ['sum', 'mean'])
def test_tile_forward_matches_dense(rng, graph, agg):
    """M=nT tile forward == dense forward (same params, same numbers)."""
    xh, nm, link, ctx, *_ = _pocket_batch(rng)
    tile = 8
    nT = xh.shape[1] // tile
    cfg_d = _tile_cfg(graph, aggregation_method=agg)
    cfg_t = dataclasses.replace(cfg_d, tile_size=tile, tile_neighbors=nT)
    params = init_dynamics(jax.random.PRNGKey(0), cfg_d)
    t = jnp.full((xh.shape[0], 1), 0.4)
    dense, nan_d = dynamics_apply(params, t, xh, nm, link, None, ctx,
                                  cfg=cfg_d)
    tiled, nan_t = dynamics_apply(params, t, xh, nm, link, None, ctx,
                                  cfg=cfg_t)
    assert not nan_d.any() and not nan_t.any()
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)


def test_tile_m_truncation_exact_when_covering(rng):
    """With M = the true max number of edge-holding tile pairs per row tile,
    the tile path is exact (the extra selected-but-empty blocks are masked)."""
    xh, nm, link, ctx, frag_only, pocket = _pocket_batch(rng, N=48,
                                                         n_pocket=24)
    # spread the cloud so the 4A graph is genuinely tile-sparse
    xh = jnp.concatenate([xh[..., :3] * 3.0, xh[..., 3:]], axis=-1)
    x = xh[..., :3]
    tile = 8
    nT = x.shape[1] // tile
    dense = geometry.distance_edge_mask(x, nm, link, frag_only, pocket,
                                        '4A')[..., 0]
    tcounts = np.asarray(dense).reshape(
        x.shape[0], nT, tile, nT, tile).sum((2, 4))
    m_needed = int((tcounts > 0).sum(-1).max())
    assert m_needed < nT, 'fixture assumption: 4A graph is tile-sparse'
    cfg_d = _tile_cfg('4A')
    cfg_t = dataclasses.replace(cfg_d, tile_size=tile, tile_neighbors=m_needed)
    params = init_dynamics(jax.random.PRNGKey(0), cfg_d)
    t = jnp.full((xh.shape[0], 1), 0.4)
    dense_out, _ = dynamics_apply(params, t, xh, nm, link, None, ctx,
                                  cfg=cfg_d)
    tiled_out, _ = dynamics_apply(params, t, xh, nm, link, None, ctx,
                                  cfg=cfg_t)
    np.testing.assert_allclose(np.asarray(tiled_out), np.asarray(dense_out),
                               atol=2e-5, rtol=1e-5)


def test_tile_gradients_match_dense(rng):
    """Gradients through the tile path == dense path at M=nT."""
    xh, nm, link, ctx, *_ = _pocket_batch(rng)
    tile = 8
    nT = xh.shape[1] // tile
    cfg_d = _tile_cfg('4A')
    cfg_t = dataclasses.replace(cfg_d, tile_size=tile, tile_neighbors=nT)
    params = init_dynamics(jax.random.PRNGKey(0), cfg_d)
    t = jnp.full((xh.shape[0], 1), 0.4)

    def loss(p, cfg):
        out, _ = dynamics_apply(p, t, xh, nm, link, None, ctx, cfg=cfg)
        return jnp.sum(out ** 2)

    g_d = jax.grad(lambda p: loss(p, cfg_d))(params)
    g_t = jax.grad(lambda p: loss(p, cfg_t))(params)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=1e-4)


def test_tile_sample_chain(rng):
    """Reverse chain through the tile path: no NaN, fragments frozen."""
    from difflinker_tpu.diffusion.edm import make_edm
    xh, nm, link, ctx, *_ = _pocket_batch(rng)
    frag = (nm - link) * nm
    cfg = _tile_cfg('4A', tile=8, m=2)
    edm = make_edm(dataclasses.replace(cfg, in_node_nf=9),
                   DiffusionConfig(timesteps=6))
    params = edm.init_params(jax.random.PRNGKey(0))
    x, h = xh[..., :3], xh[..., 3:]
    xs, hs, nan = jax.jit(lambda p, key: edm.sample_chain(
        p, key, x, h, nm, frag, link, None, ctx))(params,
                                                  jax.random.PRNGKey(2))
    assert not np.asarray(nan).any()
    np.testing.assert_array_equal(np.asarray(xs * frag), np.asarray(x * frag))


def test_tile_size_must_divide_n(rng):
    xh, nm, link, ctx, frag_only, pocket = _pocket_batch(rng)
    with pytest.raises(ValueError, match='not divisible'):
        geometry.tile_neighbor_lists(xh[..., :3], nm, link, frag_only,
                                     pocket, '4A', tile=7, m=2)


def test_morton_sort_improves_tile_coverage(rng):
    """Sorting pocket rows along the Morton curve (data/spatial.py) preserves
    model semantics (permutation equivariance of the dense path) and reduces
    the M needed for exact tile coverage on a spread-out pocket."""
    from difflinker_tpu.data.spatial import morton_codes, sort_pocket_rows

    n_frag, n_pock, n_link = 8, 112, 8
    N = n_frag + n_pock + n_link  # 128
    pos = np.zeros((N, 3), np.float32)
    pos[:n_frag] = rng.standard_normal((n_frag, 3)) * 1.5
    # pocket: scattered cloud, rows in RANDOM order (worst-case locality)
    pos[n_frag:n_frag + n_pock] = rng.standard_normal((n_pock, 3)) * 8.0
    pos[n_frag + n_pock:] = rng.standard_normal((n_link, 3)) * 1.5
    sample = {
        'positions': pos,
        'one_hot': np.eye(9, dtype=np.float32)[rng.integers(0, 9, N)],
        'fragment_only_mask': np.r_[np.ones(n_frag), np.zeros(n_pock + n_link)
                                    ].astype(np.float32),
        'pocket_mask': np.r_[np.zeros(n_frag), np.ones(n_pock),
                             np.zeros(n_link)].astype(np.float32),
        'linker_mask': np.r_[np.zeros(n_frag + n_pock),
                             np.ones(n_link)].astype(np.float32),
        'anchors': np.zeros(N, np.float32),
    }
    sample['fragment_mask'] = sample['fragment_only_mask'] + sample['pocket_mask']
    srt = sort_pocket_rows(sample)

    # multiset of pocket rows preserved; non-pocket rows untouched
    assert sorted(map(tuple, srt['positions'][n_frag:n_frag + n_pock])) == \
        sorted(map(tuple, pos[n_frag:n_frag + n_pock]))
    np.testing.assert_array_equal(srt['positions'][:n_frag], pos[:n_frag])
    np.testing.assert_array_equal(srt['positions'][n_frag + n_pock:],
                                  pos[n_frag + n_pock:])
    # codes of the sorted pocket are monotone
    codes = morton_codes(srt['positions'][n_frag:n_frag + n_pock])
    assert (np.diff(codes.astype(np.int64)) >= 0).all()

    def m_needed(p, tile):
        nm = np.ones((1, N, 1), np.float32)
        dense = geometry.distance_edge_mask(
            jnp.asarray(p[None]), jnp.asarray(nm),
            jnp.asarray(sample['linker_mask'][None, :, None]),
            jnp.asarray(sample['fragment_only_mask'][None, :, None]),
            jnp.asarray(sample['pocket_mask'][None, :, None]), '4A')[..., 0]
        nT = N // tile
        c = np.asarray(dense).reshape(1, nT, tile, nT, tile).sum((2, 4))
        return int((c > 0).sum(-1).max())

    tile = 16
    assert m_needed(srt['positions'], tile) <= m_needed(pos, tile)
    assert m_needed(srt['positions'], tile) < N // tile  # real sparsity

    # permutation equivariance: dense output rows permute with the input
    cfg = _tile_cfg('4A')
    params = init_dynamics(jax.random.PRNGKey(0), cfg)

    def fwd(s):
        xh = jnp.asarray(np.concatenate([s['positions'], s['one_hot']],
                                        -1)[None])
        nm = jnp.ones((1, N, 1))
        lk = jnp.asarray(s['linker_mask'][None, :, None])
        ctx = jnp.asarray(np.stack([s['anchors'],
                                    s['fragment_only_mask'],
                                    s['pocket_mask']], -1)[None])
        out, _ = dynamics_apply(params, jnp.full((1, 1), 0.3), xh, nm, lk,
                                None, ctx, cfg=cfg)
        return np.asarray(out)[0]

    perm = np.arange(N)
    order = np.lexsort(srt['positions'].T)
    base = np.lexsort(sample['positions'].T)
    perm[order] = base  # maps unsorted rows onto sorted rows
    np.testing.assert_allclose(fwd(srt), fwd(sample)[perm], atol=2e-5,
                               rtol=1e-5)


def test_dataset_spatially_sorted():
    """LinkerDataset.spatially_sorted Morton-orders pocket rows and leaves
    batches collate-compatible."""
    from difflinker_tpu.data.collate import collate
    from difflinker_tpu.data.spatial import morton_codes
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset

    ds = synthetic_molecule_dataset(4, seed=9, pocket_range=(8, 16))
    srt = ds.spatially_sorted()
    assert len(srt) == len(ds)
    for a, b in zip(ds.samples, srt.samples):
        pk = np.asarray(a['pocket_mask']).reshape(-1) > 0
        assert sorted(map(tuple, np.asarray(b['positions'])[pk])) == \
            sorted(map(tuple, np.asarray(a['positions'])[pk]))
        codes = morton_codes(np.asarray(b['positions'])[pk])
        assert (np.diff(codes.astype(np.int64)) >= 0).all()
        np.testing.assert_array_equal(np.asarray(b['positions'])[~pk],
                                      np.asarray(a['positions'])[~pk])
    batch = collate(srt.samples)
    assert batch['positions'].ndim == 3


def test_spatially_sorted_noop_without_pockets():
    """Pocket-free datasets pass through unchanged (regression: samples with
    no 'pocket_mask' key used to crash sort_pocket_rows on np.asarray(None))."""
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    ds = synthetic_molecule_dataset(4, seed=0)
    srt = ds.spatially_sorted()
    for a, b in zip(ds.samples, srt.samples):
        np.testing.assert_array_equal(a['positions'], b['positions'])
