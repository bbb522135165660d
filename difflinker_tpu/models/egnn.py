"""Dense E(3)-equivariant graph network for fixed-shape padded graphs.

TPU-first redesign of the reference EGNN (src/egnn.py:10-238). The reference
flattens the batch to (B·N) nodes, materialises O(B·N²) edge *index lists* and
aggregates messages with `scatter_add_` (src/egnn.py:304-320,449-467). Here the
graph lives as dense (B, N, N, ·) tensors with multiplicative masks:

  * message aggregation is a masked row-sum — no scatter, no dynamic shapes;
  * the first layer of every edge MLP is algebraically split so the
    concatenated (B, N, N, 2H+E) edge input is never materialised:
        concat([h_i, h_j, e_ij]) @ W  ==  h@W_src |_i + h@W_dst |_j + e@W_e
    leaving two (B·N, H)×(H, H) matmuls plus a cheap broadcast add — the only
    O(N²) activation is the (B, N, N, H) hidden state, which XLA tiles onto
    the MXU for the second edge-MLP layer;
  * per-block rematerialisation (jax.checkpoint) bounds peak HBM to one block's
    edge activations.

Numerics match the torch reference exactly in float32 (verified by the golden
parity tests in tests/test_parity_egnn.py which convert torch state_dicts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from difflinker_tpu.models.layers import (
    activation_fn, init_batch_norm, init_linear, init_xavier_linear, linear,
    sinusoidal_distance_embedding,
)
from difflinker_tpu.ops.geometry import coord2diff


# ---------------------------------------------------------------------------
# GCL — invariant message passing layer (reference src/egnn.py:10-80)
# ---------------------------------------------------------------------------

def init_gcl(key, input_nf, output_nf, hidden_nf, edges_in_d=0,
             attention=False, normalization=None, dtype=jnp.float32):
    k = jax.random.split(key, 6)
    p = {
        'edge_mlp': {
            'lin0': init_linear(k[0], 2 * input_nf + edges_in_d, hidden_nf, dtype=dtype),
            'lin1': init_linear(k[1], hidden_nf, hidden_nf, dtype=dtype),
        },
        'node_mlp': {
            'lin0': init_linear(k[2], hidden_nf + input_nf, hidden_nf, dtype=dtype),
            'lin1': init_linear(k[3], hidden_nf, output_nf, dtype=dtype),
        },
    }
    state = {}
    if attention:
        p['att_mlp'] = init_linear(k[4], hidden_nf, 1, dtype=dtype)
    if normalization == 'batch_norm':
        p['bn0'], state['bn0'] = init_batch_norm(hidden_nf, dtype)
        p['bn1'], state['bn1'] = init_batch_norm(output_nf, dtype)
    return p, state


def _split_pair_linear(p, h_src, h_dst, edge_attr, input_nf):
    """Apply lin0 to the virtual concat [h_i, h_j, e_ij] without materialising
    it: split the weight rows into source/destination/edge slabs."""
    from difflinker_tpu.parallel.mesh import constrain_pair
    w = p['w']
    w_src, w_dst, w_e = w[:input_nf], w[input_nf:2 * input_nf], w[2 * input_nf:]
    pre = h_src @ w_src  # (B, N, H')
    pre_dst = h_dst @ w_dst
    out = pre[:, :, None, :] + pre_dst[:, None, :, :]
    if edge_attr is not None and w_e.shape[0] > 0:
        out = out + edge_attr @ w_e
    # sender-axis tensor parallelism (parallel/mesh.sharding_hints): pin the
    # (B, N, N, H') edge activation to its 2-D (atoms × senders) block
    # sharding so GSPMD reshards the small (B, N, H') pre-products instead of
    # all-gathering edge-sized tensors; no-op without a senders mesh axis
    return constrain_pair(out + p['b'])


def _normalize_agg(agg, edge_mask, h, normalization_factor,
                   aggregation_method, mean_count_static):
    """Aggregation normalisation matching unsorted_segment_sum
    (src/egnn.py:304-320). For 'mean', the reference counts *all* edges in the
    index list — for FC graphs that is a constant N per node regardless of the
    edge mask (`mean_count_static=True`); for distance graphs the index list
    is the adjacency, so the count is the masked row sum."""
    if aggregation_method == 'sum':
        return agg / normalization_factor
    if aggregation_method == 'mean':
        if mean_count_static or edge_mask is None:
            cnt = jnp.asarray(h.shape[1], h.dtype)
        else:
            cnt = jnp.maximum(jnp.sum(edge_mask, axis=2), 1.0)
        return agg / cnt
    raise ValueError(aggregation_method)


def gcl_apply(p, h, edge_attr, node_mask, edge_mask, *,
              act, normalization_factor, aggregation_method='sum',
              attention=False, normalization=None, state=None, train=False,
              mean_count_static=True):
    """One GCL step on dense graphs.

    h: (B, N, F); edge_attr: (B, N, N, E) or None; node_mask: (B, N, 1) or
    None; edge_mask: (B, N, N, 1) or None (None == all pairs participate,
    matching the reference GNN-ablation path where no edge mask is passed).

    Returns (h_new, new_state).
    """
    input_nf = h.shape[-1]
    new_state = dict(state or {})

    # --- edge model (reference edge_model, src/egnn.py:45-60) ---
    mij = act(_split_pair_linear(p['edge_mlp']['lin0'], h, h, edge_attr, input_nf))
    mij = act(linear(p['edge_mlp']['lin1'], mij))
    if attention:
        gate = jax.nn.sigmoid(linear(p['att_mlp'], mij))
        feat = mij * gate
    else:
        feat = mij
    if edge_mask is not None:
        feat = feat * edge_mask

    # --- aggregation (replaces unsorted_segment_sum, src/egnn.py:304-320) ---
    agg = jnp.sum(feat, axis=2)  # receive at i: sum over j
    agg = _normalize_agg(agg, edge_mask, h, normalization_factor,
                         aggregation_method, mean_count_static)

    # --- node model (reference node_model, src/egnn.py:62-72) ---
    w = p['node_mlp']['lin0']['w']
    out = h @ w[:input_nf] + agg @ w[input_nf:] + p['node_mlp']['lin0']['b']
    if normalization == 'batch_norm':
        from difflinker_tpu.models.layers import batch_norm
        out, new_state['bn0'] = batch_norm(p['bn0'], state['bn0'], out, None, train)
    out = act(out)
    out = linear(p['node_mlp']['lin1'], out)
    if normalization == 'batch_norm':
        from difflinker_tpu.models.layers import batch_norm
        out, new_state['bn1'] = batch_norm(p['bn1'], state['bn1'], out, None, train)
    h = h + out
    if node_mask is not None:
        h = h * node_mask
    return h, new_state


# ---------------------------------------------------------------------------
# Equivariant coordinate update (reference src/egnn.py:83-125)
# ---------------------------------------------------------------------------

def init_coord_update(key, hidden_nf, edges_in_d=2, tanh=False, dtype=jnp.float32):
    k = jax.random.split(key, 3)
    return {
        'lin0': init_linear(k[0], 2 * hidden_nf + edges_in_d, hidden_nf, dtype=dtype),
        'lin1': init_linear(k[1], hidden_nf, hidden_nf, dtype=dtype),
        'lin_out': init_xavier_linear(k[2], hidden_nf, 1, gain=0.001, dtype=dtype),
    }


def coord_update_apply(p, h, x, cdiff, edge_attr, edge_mask, linker_mask,
                       node_mask, *, act, normalization_factor,
                       aggregation_method='sum', tanh=False, coords_range=15.0,
                       mean_count_static=True):
    """x_i += Σ_j cdiff_ij · φ(h_i, h_j, e_ij), gated to linker atoms only so
    fragment/pocket coordinates stay frozen (src/egnn.py:101-117)."""
    hidden_nf = h.shape[-1]
    phi = act(_split_pair_linear(p['lin0'], h, h, edge_attr, hidden_nf))
    phi = act(linear(p['lin1'], phi))
    phi = phi @ p['lin_out']['w']  # (B, N, N, 1), no bias
    if tanh:
        phi = jnp.tanh(phi) * coords_range
    trans = cdiff * phi
    if edge_mask is not None:
        trans = trans * edge_mask
    agg = jnp.sum(trans, axis=2)
    agg = _normalize_agg(agg, edge_mask, h, normalization_factor,
                         aggregation_method, mean_count_static)
    if linker_mask is not None:
        agg = agg * linker_mask
    x = x + agg
    if node_mask is not None:
        x = x * node_mask
    return x


# ---------------------------------------------------------------------------
# Equivariant block (reference src/egnn.py:128-178)
# ---------------------------------------------------------------------------

def init_block(key, hidden_nf, edge_feat_nf=2, n_sublayers=2, attention=True,
               tanh=False, dtype=jnp.float32):
    keys = jax.random.split(key, n_sublayers + 1)
    gcls = []
    for i in range(n_sublayers):
        gp, _ = init_gcl(keys[i], hidden_nf, hidden_nf, hidden_nf,
                         edges_in_d=edge_feat_nf, attention=attention, dtype=dtype)
        gcls.append(gp)
    return {
        'gcls': gcls,
        'coord': init_coord_update(keys[-1], hidden_nf, edges_in_d=edge_feat_nf,
                                   tanh=tanh, dtype=dtype),
    }


def block_apply(p, h, x, dist0, node_mask, linker_mask, edge_mask, *, cfg, act,
                mean_count_static=True):
    """One EquivariantBlock: recompute distances from the current coords,
    concat with the block-input distance feature, run inv_sublayers GCLs then
    one coordinate update (src/egnn.py:157-178).

    Mixed precision: geometry (x, d², cdiff, coordinate aggregation) is always
    float32; with cfg.dtype='bfloat16' the invariant-feature MLPs run in bf16
    on the MXU (h and edge features carried in bf16, cast back at the
    coordinate interface)."""
    d2, cdiff = coord2diff(x, cfg.norm_constant)
    feat = sinusoidal_distance_embedding(d2) if cfg.sin_embedding else d2
    edge_attr = jnp.concatenate([feat, dist0], axis=-1).astype(h.dtype)
    if edge_mask is not None:
        edge_mask = edge_mask.astype(h.dtype)
    nm = None if node_mask is None else node_mask.astype(h.dtype)
    for gp in p['gcls']:
        h, _ = gcl_apply(
            gp, h, edge_attr, nm, edge_mask,
            act=act, normalization_factor=cfg.normalization_factor,
            aggregation_method=cfg.aggregation_method, attention=cfg.attention,
            mean_count_static=mean_count_static)
    x = coord_update_apply(
        p['coord'], h, x, cdiff, edge_attr, edge_mask, linker_mask, node_mask,
        act=act, normalization_factor=cfg.normalization_factor,
        aggregation_method=cfg.aggregation_method, tanh=cfg.tanh,
        # the reference passes the FULL coords_range into every block
        # (src/egnn.py:209 -> :136 -> :149); EGNN.coords_range_layer (:191,
        # divided by n_layers) is dead code there
        coords_range=cfg.coords_range,
        mean_count_static=mean_count_static)
    if nm is not None:
        h = h * nm
    return h, x


# ---------------------------------------------------------------------------
# Full EGNN (reference src/egnn.py:181-238)
# ---------------------------------------------------------------------------

def init_egnn(key, in_node_nf, hidden_nf, out_node_nf=None, *, n_layers=3,
              inv_sublayers=2, attention=False, tanh=False,
              sin_embedding=False, dtype=jnp.float32):
    out_node_nf = in_node_nf if out_node_nf is None else out_node_nf
    edge_feat_nf = 24 if sin_embedding else 2
    keys = jax.random.split(key, n_layers + 2)
    return {
        'embedding': init_linear(keys[0], in_node_nf, hidden_nf, dtype=dtype),
        'embedding_out': init_linear(keys[1], hidden_nf, out_node_nf, dtype=dtype),
        'blocks': [
            init_block(keys[2 + i], hidden_nf, edge_feat_nf, inv_sublayers,
                       attention=attention, tanh=tanh, dtype=dtype)
            for i in range(n_layers)
        ],
    }


def egnn_apply(p, h, x, node_mask, linker_mask, edge_mask, *, cfg,
               remat: bool = True, mean_count_static: bool = True):
    """h: (B, N, F_in), x: (B, N, 3) -> (h_out (B, N, F_out), x_out).

    `remat=True` wraps each block in jax.checkpoint so the (B, N, N, H) edge
    activations of at most one block are live at a time during backprop.
    """
    act = activation_fn(cfg.activation)
    compute_dtype = jnp.dtype(cfg.dtype)
    if compute_dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
        h = h.astype(compute_dtype)
    x = x.astype(jnp.float32)  # geometry stays fp32 regardless of cfg.dtype

    d2_0, _ = coord2diff(x)  # initial distance feature shared by all blocks
    dist0 = sinusoidal_distance_embedding(d2_0) if cfg.sin_embedding else d2_0

    h = linear(p['embedding'], h)

    def run_block(bp, h, x):
        return block_apply(bp, h, x, dist0, node_mask, linker_mask, edge_mask,
                           cfg=cfg, act=act, mean_count_static=mean_count_static)

    fn = jax.checkpoint(run_block) if remat else run_block
    for bp in p['blocks']:
        h, x = fn(bp, h, x)

    h = linear(p['embedding_out'], h)
    if node_mask is not None:
        h = h * node_mask.astype(h.dtype)
    return h.astype(jnp.float32), x


# ---------------------------------------------------------------------------
# Sparse K-neighbor-list path for distance graphs
#
# The dense path's (B, N, N, H) edge activations make pocket shapes
# HBM-bandwidth-bound (~26 GB per forward at B=32, N=256 — measured, see
# docs/ARCHITECTURE.md §5). Distance graphs are ~5% dense at the 4A cutoff
# (src/egnn.py:554-563), so every node keeps only its K nearest admissible
# neighbours in a static (B, N, K) table (ops/geometry.neighbor_lists): all
# edge tensors become (B, N, K, ·), cutting edge FLOPs and traffic by N/K.
# Exact (bit-comparable to the dense path) whenever K >= the true max degree;
# otherwise the farthest edges are dropped. Same parameters as the dense path
# — this is a data-layout choice, not a different model.
# ---------------------------------------------------------------------------

def _split_pair_linear_sparse(p, h, edge_attr, idx, input_nf):
    """lin0 over virtual [h_i, h_j, e_ij] rows for j in the neighbor list:
    gather the *pre-products* (H-wide) rather than h (avoids K x matmuls)."""
    from difflinker_tpu.ops.geometry import gather_neighbors
    w = p['w']
    w_src, w_dst, w_e = w[:input_nf], w[input_nf:2 * input_nf], w[2 * input_nf:]
    pre_src = h @ w_src                      # (B, N, H')
    pre_dst = gather_neighbors(h @ w_dst, idx)   # (B, N, K, H')
    out = pre_src[:, :, None, :] + pre_dst
    if edge_attr is not None and w_e.shape[0] > 0:
        out = out + edge_attr @ w_e
    return out + p['b']


def _agg_sparse(feat, emask, normalization_factor, aggregation_method):
    """Sum/mean over the K axis. Distance-graph 'mean' counts real
    neighbours (the reference index list contains only real edges)."""
    agg = jnp.sum(feat, axis=2)
    if aggregation_method == 'sum':
        return agg / normalization_factor
    if aggregation_method == 'mean':
        cnt = jnp.maximum(jnp.sum(emask, axis=2), 1.0)
        return agg / cnt
    raise ValueError(aggregation_method)


def gcl_apply_sparse(p, h, edge_attr, node_mask, emask, idx, *, act,
                     normalization_factor, aggregation_method='sum',
                     attention=False):
    """gcl_apply over a neighbor list. h (B,N,F); edge_attr (B,N,K,E);
    emask (B,N,K,1) in {0,1}; idx (B,N,K)."""
    input_nf = h.shape[-1]
    mij = act(_split_pair_linear_sparse(p['edge_mlp']['lin0'], h, edge_attr,
                                        idx, input_nf))
    mij = act(linear(p['edge_mlp']['lin1'], mij))
    if attention:
        gate = jax.nn.sigmoid(linear(p['att_mlp'], mij))
        mij = mij * gate
    feat = mij * emask
    agg = _agg_sparse(feat, emask, normalization_factor, aggregation_method)

    w = p['node_mlp']['lin0']['w']
    out = h @ w[:input_nf] + agg @ w[input_nf:] + p['node_mlp']['lin0']['b']
    out = act(out)
    out = linear(p['node_mlp']['lin1'], out)
    h = h + out
    if node_mask is not None:
        h = h * node_mask
    return h


def coord_update_apply_sparse(p, h, x, cdiff, edge_attr, emask, idx,
                              linker_mask, node_mask, *, act,
                              normalization_factor, aggregation_method='sum',
                              tanh=False, coords_range=15.0):
    hidden_nf = h.shape[-1]
    phi = act(_split_pair_linear_sparse(p['lin0'], h, edge_attr, idx,
                                        hidden_nf))
    phi = act(linear(p['lin1'], phi))
    phi = phi @ p['lin_out']['w']            # (B, N, K, 1), no bias
    if tanh:
        phi = jnp.tanh(phi) * coords_range
    trans = cdiff * phi.astype(cdiff.dtype) * emask.astype(cdiff.dtype)
    agg = _agg_sparse(trans, emask.astype(cdiff.dtype),
                      normalization_factor, aggregation_method)
    if linker_mask is not None:
        agg = agg * linker_mask
    x = x + agg
    if node_mask is not None:
        x = x * node_mask
    return x


def block_apply_sparse(p, h, x, dist0, node_mask, linker_mask, emask, idx, *,
                       cfg, act):
    """EquivariantBlock on a fixed neighbor topology: distances recomputed
    from the current coords each block (src/egnn.py:157-178), the graph
    itself fixed per forward (built once in Dynamics.forward, :495-499)."""
    from difflinker_tpu.ops.geometry import coord2diff_sparse
    d2, cdiff = coord2diff_sparse(x, idx, cfg.norm_constant)
    feat = sinusoidal_distance_embedding(d2) if cfg.sin_embedding else d2
    edge_attr = jnp.concatenate([feat, dist0], axis=-1).astype(h.dtype)
    em = emask.astype(h.dtype)
    nm = None if node_mask is None else node_mask.astype(h.dtype)
    for gp in p['gcls']:
        h = gcl_apply_sparse(
            gp, h, edge_attr, nm, em, idx, act=act,
            normalization_factor=cfg.normalization_factor,
            aggregation_method=cfg.aggregation_method,
            attention=cfg.attention)
    x = coord_update_apply_sparse(
        p['coord'], h, x, cdiff, edge_attr, emask.astype(jnp.float32), idx,
        linker_mask, node_mask, act=act,
        normalization_factor=cfg.normalization_factor,
        aggregation_method=cfg.aggregation_method, tanh=cfg.tanh,
        coords_range=cfg.coords_range)
    if nm is not None:
        h = h * nm
    return h, x


def egnn_apply_sparse(p, h, x, node_mask, linker_mask, idx, emask, *, cfg,
                      remat: bool = True):
    """egnn_apply over a K-neighbor list (same params, sparse data layout)."""
    from difflinker_tpu.ops.geometry import coord2diff_sparse
    act = activation_fn(cfg.activation)
    compute_dtype = jnp.dtype(cfg.dtype)
    if compute_dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
        h = h.astype(compute_dtype)
    x = x.astype(jnp.float32)

    d2_0, _ = coord2diff_sparse(x, idx)
    dist0 = sinusoidal_distance_embedding(d2_0) if cfg.sin_embedding else d2_0

    h = linear(p['embedding'], h)

    def run_block(bp, h, x):
        return block_apply_sparse(bp, h, x, dist0, node_mask, linker_mask,
                                  emask, idx, cfg=cfg, act=act)

    fn = jax.checkpoint(run_block) if remat else run_block
    for bp in p['blocks']:
        h, x = fn(bp, h, x)

    h = linear(p['embedding_out'], h)
    if node_mask is not None:
        h = h * node_mask.astype(h.dtype)
    return h.astype(jnp.float32), x


# ---------------------------------------------------------------------------
# Block-sparse tile-pair path for distance graphs
#
# Same parameters and message sums as the dense/sparse paths; the data layout
# is (B, nT, T, M*T, ·) edge blocks over each row-tile's M most-connected
# neighbour tiles (ops/geometry.tile_neighbor_lists). Gathers move whole
# contiguous T-row tiles, amortising the per-row gather cost that makes the
# K-neighbor path lose at N=256 (docs/ARCHITECTURE.md §5), while the (T, M*T)
# blocks stay MXU-dense. Exact whenever M covers every tile pair holding an
# admissible edge.
# ---------------------------------------------------------------------------

def _split_pair_linear_tiles(p, h, edge_attr, tidx, tile, input_nf):
    """lin0 over [h_i, h_j, e_ij] for j in the neighbour-tile blocks."""
    from difflinker_tpu.ops.geometry import gather_tiles
    w = p['w']
    w_src, w_dst, w_e = w[:input_nf], w[input_nf:2 * input_nf], w[2 * input_nf:]
    B, N, _ = h.shape
    nT = N // tile
    pre_src = (h @ w_src).reshape(B, nT, tile, 1, -1)
    pre_dst = gather_tiles(h @ w_dst, tidx, tile)[:, :, None, :, :]
    out = pre_src + pre_dst                       # (B, nT, T, M*T, H')
    if edge_attr is not None and w_e.shape[0] > 0:
        out = out + edge_attr @ w_e
    return out + p['b']


def gcl_apply_tiles(p, h, edge_attr, node_mask, emask, tidx, tile, *, act,
                    normalization_factor, aggregation_method='sum',
                    attention=False):
    """gcl_apply over tile-pair blocks. h (B,N,F); edge_attr/emask
    (B,nT,T,M*T,·); tidx (B,nT,M)."""
    B, N, input_nf = h.shape
    mij = act(_split_pair_linear_tiles(p['edge_mlp']['lin0'], h, edge_attr,
                                       tidx, tile, input_nf))
    mij = act(linear(p['edge_mlp']['lin1'], mij))
    if attention:
        gate = jax.nn.sigmoid(linear(p['att_mlp'], mij))
        mij = mij * gate
    feat = mij * emask
    agg = jnp.sum(feat, axis=3)
    if aggregation_method == 'sum':
        agg = agg / normalization_factor
    elif aggregation_method == 'mean':
        agg = agg / jnp.maximum(jnp.sum(emask, axis=3), 1.0)
    else:
        raise ValueError(aggregation_method)
    agg = agg.reshape(B, N, -1)

    w = p['node_mlp']['lin0']['w']
    out = h @ w[:input_nf] + agg @ w[input_nf:] + p['node_mlp']['lin0']['b']
    out = act(out)
    out = linear(p['node_mlp']['lin1'], out)
    h = h + out
    if node_mask is not None:
        h = h * node_mask
    return h


def coord_update_apply_tiles(p, h, x, cdiff, edge_attr, emask, tidx, tile,
                             linker_mask, node_mask, *, act,
                             normalization_factor, aggregation_method='sum',
                             tanh=False, coords_range=15.0):
    B, N, hidden_nf = h.shape
    phi = act(_split_pair_linear_tiles(p['lin0'], h, edge_attr, tidx, tile,
                                       hidden_nf))
    phi = act(linear(p['lin1'], phi))
    phi = phi @ p['lin_out']['w']                 # (B, nT, T, M*T, 1), no bias
    if tanh:
        phi = jnp.tanh(phi) * coords_range
    trans = cdiff * phi.astype(cdiff.dtype) * emask.astype(cdiff.dtype)
    agg = jnp.sum(trans, axis=3)
    if aggregation_method == 'sum':
        agg = agg / normalization_factor
    elif aggregation_method == 'mean':
        agg = agg / jnp.maximum(
            jnp.sum(emask.astype(cdiff.dtype), axis=3), 1.0)
    else:
        raise ValueError(aggregation_method)
    agg = agg.reshape(B, N, -1)
    if linker_mask is not None:
        agg = agg * linker_mask
    x = x + agg
    if node_mask is not None:
        x = x * node_mask
    return x


def block_apply_tiles(p, h, x, dist0, node_mask, linker_mask, emask, tidx,
                      tile, *, cfg, act):
    from difflinker_tpu.ops.geometry import coord2diff_tiles
    d2, cdiff = coord2diff_tiles(x, tidx, tile, cfg.norm_constant)
    feat = sinusoidal_distance_embedding(d2) if cfg.sin_embedding else d2
    edge_attr = jnp.concatenate([feat, dist0], axis=-1).astype(h.dtype)
    em = emask.astype(h.dtype)
    nm = None if node_mask is None else node_mask.astype(h.dtype)
    for gp in p['gcls']:
        h = gcl_apply_tiles(
            gp, h, edge_attr, nm, em, tidx, tile, act=act,
            normalization_factor=cfg.normalization_factor,
            aggregation_method=cfg.aggregation_method,
            attention=cfg.attention)
    x = coord_update_apply_tiles(
        p['coord'], h, x, cdiff, edge_attr, emask.astype(jnp.float32), tidx,
        tile, linker_mask, node_mask, act=act,
        normalization_factor=cfg.normalization_factor,
        aggregation_method=cfg.aggregation_method, tanh=cfg.tanh,
        coords_range=cfg.coords_range)
    if nm is not None:
        h = h * nm
    return h, x


def egnn_apply_tiles(p, h, x, node_mask, linker_mask, tidx, emask, tile, *,
                     cfg, remat: bool = True):
    """egnn_apply over tile-pair blocks (same params, block-sparse layout)."""
    from difflinker_tpu.ops.geometry import coord2diff_tiles
    act = activation_fn(cfg.activation)
    compute_dtype = jnp.dtype(cfg.dtype)
    if compute_dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
        h = h.astype(compute_dtype)
    x = x.astype(jnp.float32)

    d2_0, _ = coord2diff_tiles(x, tidx, tile)
    dist0 = sinusoidal_distance_embedding(d2_0) if cfg.sin_embedding else d2_0

    h = linear(p['embedding'], h)

    def run_block(bp, h, x):
        return block_apply_tiles(bp, h, x, dist0, node_mask, linker_mask,
                                 emask, tidx, tile, cfg=cfg, act=act)

    fn = jax.checkpoint(run_block) if remat else run_block
    for bp in p['blocks']:
        h, x = fn(bp, h, x)

    h = linear(p['embedding_out'], h)
    if node_mask is not None:
        h = h * node_mask.astype(h.dtype)
    return h.astype(jnp.float32), x


# ---------------------------------------------------------------------------
# Plain (non-equivariant) GNN ablation (reference src/egnn.py:241-278)
# ---------------------------------------------------------------------------

def init_gnn(key, in_node_nf, hidden_nf, out_node_nf=None, *, n_layers=4,
             attention=False, normalization=None, dtype=jnp.float32):
    out_node_nf = in_node_nf if out_node_nf is None else out_node_nf
    keys = jax.random.split(key, n_layers + 2)
    gcls, states = [], []
    for i in range(n_layers):
        gp, gs = init_gcl(keys[2 + i], hidden_nf, hidden_nf, hidden_nf,
                          edges_in_d=0, attention=attention,
                          normalization=normalization, dtype=dtype)
        gcls.append(gp)
        states.append(gs)
    params = {
        'embedding': init_linear(keys[0], in_node_nf, hidden_nf, dtype=dtype),
        'embedding_out': init_linear(keys[1], hidden_nf, out_node_nf, dtype=dtype),
        'gcls': gcls,
    }
    return params, {'gcls': states}


def gnn_apply(p, h, node_mask, edge_mask, *, cfg, state=None, train=False):
    act = activation_fn(cfg.activation)
    h = linear(p['embedding'], h)
    new_states = []
    for i, gp in enumerate(p['gcls']):
        gs = state['gcls'][i] if state else {}
        h, ns = gcl_apply(
            gp, h, None, node_mask, edge_mask,
            act=act, normalization_factor=cfg.normalization_factor,
            aggregation_method=cfg.aggregation_method, attention=cfg.attention,
            normalization=cfg.normalization, state=gs, train=train)
        new_states.append(ns)
    h = linear(p['embedding_out'], h)
    if node_mask is not None:
        h = h * node_mask
    return h, {'gcls': new_states}
