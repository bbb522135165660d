"""Dense geometry primitives for fixed-shape padded molecular graphs.

The reference computes pairwise quantities over flattened sparse edge index
lists (coord2diff at src/egnn.py:295-301, scatter-add at :304-320). On TPU we
keep everything as dense (B, N, N, .) tensors with multiplicative masks: XLA
tiles the resulting batched matmuls onto the MXU and there are no dynamic
shapes anywhere.

All functions are jit-safe and shape-polymorphic over leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from difflinker_tpu.parallel.mesh import constrain_pair

EPS_D2 = 1e-8  # matches the sqrt regulariser in the reference (src/egnn.py:299)


def coord2diff(x: jnp.ndarray, norm_constant: float = 1.0):
    """Pairwise squared distances and normalised coordinate differences.

    Args:
      x: (B, N, 3) positions.
      norm_constant: added to the pair distance before normalising the diff
        (reference default 1; Dynamics configs use 1e-6).

    Returns:
      d2: (B, N, N, 1) squared distances.
      cdiff: (B, N, N, 3) = (x_i - x_j) / (|x_i - x_j| + norm_constant),
        indexed [b, i, j].
    """
    diff = x[:, :, None, :] - x[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
    norm = jnp.sqrt(d2 + EPS_D2)
    cdiff = diff / (norm + norm_constant)
    # under a `senders` mesh axis (parallel/mesh.sharding_hints) the pairwise
    # tensors are pinned to their (data, atoms, senders) block sharding; no-op
    # on every other mesh
    return constrain_pair(d2), constrain_pair(cdiff)


def coord2diff_sparse(x: jnp.ndarray, idx: jnp.ndarray,
                      norm_constant: float = 1.0):
    """coord2diff over a K-neighbor list: x (B, N, 3), idx (B, N, K) ->
    d2 (B, N, K, 1), cdiff (B, N, K, 3) with cdiff[b,i,k] pointing i <- idx_k."""
    x_j = gather_neighbors(x, idx)
    diff = x[:, :, None, :] - x_j
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
    norm = jnp.sqrt(d2 + EPS_D2)
    return d2, diff / (norm + norm_constant)


def pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, N) Euclidean distances."""
    diff = x[:, :, None, :] - x[:, None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + EPS_D2)


def fc_edge_mask(node_mask: jnp.ndarray, reference_values: bool = True) -> jnp.ndarray:
    """Fully-connected edge mask from a (B, N, 1) node mask → (B, N, N, 1).

    With `reference_values` (default), reproduces the reference collate's
    exact values: **-1 for real off-diagonal pairs, -2 on real self-loops, 0
    on padding** — the reference's `~torch.eye(N, dtype=int8)` is a bitwise
    NOT (src/datasets.py:366-369), and the released checkpoints were trained
    with messages multiplied by these values. With False: plain 0/1 minus
    self-loops.
    """
    nm = node_mask[..., 0]
    adj = nm[:, :, None] * nm[:, None, :]
    n = adj.shape[-1]
    if reference_values:
        adj = adj * -(1.0 + jnp.eye(n, dtype=adj.dtype))
    else:
        adj = adj * (1.0 - jnp.eye(n, dtype=adj.dtype))
    return constrain_pair(adj[..., None])


def distance_edge_mask(
    x: jnp.ndarray,
    node_mask: jnp.ndarray,
    linker_mask: jnp.ndarray,
    fragment_only_mask: jnp.ndarray,
    pocket_only_mask: jnp.ndarray,
    graph_type: str,
) -> jnp.ndarray:
    """Dense distance-cutoff adjacency for pocket models, recomputed from the
    *current* coordinates each diffusion step.

    Dense masked equivalent of DynamicsWithPockets.get_dist_edges_4A /
    get_dist_edges (src/egnn.py:554-596): instead of extracting index lists
    from the boolean adjacency, we keep the adjacency itself as the edge mask.

    graph_type:
      '4A'        — all pairs within 4 Angstrom.
      'FC-4A'     — ligand FC, pocket pairs <= 4A, ligand-pocket <= 4A.
      'FC-10A-4A' — ligand FC, pocket pairs <= 4A, ligand-pocket <= 10A.

    Returns (B, N, N, 1) float mask.
    """
    nm = node_mask[..., 0] > 0
    n = nm.shape[-1]
    base = (nm[:, :, None] & nm[:, None, :]) & ~jnp.eye(n, dtype=bool)
    dists = pairwise_dist(x)

    if graph_type == '4A':
        adj = base & (dists <= 4.0)
    elif graph_type in ('FC-4A', 'FC-10A-4A'):
        lig = ((linker_mask[..., 0] > 0) | (fragment_only_mask[..., 0] > 0)) & nm
        poc = (pocket_only_mask[..., 0] > 0) & nm
        lig_lig = lig[:, :, None] & lig[:, None, :]
        poc_poc = (poc[:, :, None] & poc[:, None, :]) & (dists <= 4.0)
        cutoff = 4.0 if graph_type == 'FC-4A' else 10.0
        cross = lig[:, :, None] & poc[:, None, :]
        lig_poc = (cross | jnp.swapaxes(cross, 1, 2)) & (dists <= cutoff)
        adj = base & (lig_lig | poc_poc | lig_poc)
    else:
        raise ValueError(f'unknown graph_type {graph_type!r}')
    return constrain_pair(adj.astype(x.dtype)[..., None])


def neighbor_lists(
    x: jnp.ndarray,
    node_mask: jnp.ndarray,
    linker_mask: jnp.ndarray,
    fragment_only_mask: jnp.ndarray,
    pocket_only_mask: jnp.ndarray,
    graph_type: str,
    k: int,
):
    """Fixed-shape K-neighbor lists for the distance graphs — the TPU-native
    sparse form of distance_edge_mask.

    The reference's own long-graph strategy is sparsification (distance
    cutoffs, src/egnn.py:554-596); its index lists are dynamic shapes. Here
    every node keeps its K *nearest* admissible neighbours in a static
    (B, N, K) table, so all edge tensors downstream are (B, N, K, ·) instead
    of (B, N, N, ·) — at pocket shapes (N=256, typical 4A degree ~15) this
    cuts edge FLOPs and HBM traffic by N/K while computing the EXACT same
    message sums whenever K >= the true maximum degree (nodes with more than
    K admissible neighbours drop the farthest ones).

    Returns (idx (B, N, K) int32, mask (B, N, K, 1) in {0, 1}).
    """
    adj = distance_edge_mask(x, node_mask, linker_mask, fragment_only_mask,
                             pocket_only_mask, graph_type)[..., 0]
    d = pairwise_dist(x)
    # prefer real edges, nearest first; padded/absent edges sink to -inf-ish
    score = -(d + (1.0 - adj) * 1e9)
    _, idx = jax.lax.top_k(score, k)
    mask = jnp.take_along_axis(adj, idx, axis=2)
    return idx.astype(jnp.int32), mask[..., None]


def gather_neighbors(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """a (B, N, F), idx (B, N, K) -> a[b, idx[b, i, k]] (B, N, K, F)."""
    return jax.vmap(lambda ab, ib: ab[ib])(a, idx)


# ---------------------------------------------------------------------------
# Block-sparse tile-pair layout for distance graphs
#
# The K-neighbor-list layout (neighbor_lists above) minimises FLOPs but pays
# one row gather per (node, layer); measured on v5e that gather cost makes it
# LOSE to the dense path at N=256 (docs/ARCHITECTURE.md §5). The tile layout
# trades FLOPs back for locality: nodes are grouped in contiguous tiles of T
# rows, each row-tile keeps its M most-connected neighbour tiles, and edge
# work runs MXU-dense over (T, M*T) blocks. Gathers touch whole contiguous
# tiles ((B, nT, M) indices instead of (B, N, K)), amortising the gather cost
# T-fold. Exact vs the dense path whenever M covers every tile pair holding
# an admissible edge (same criterion as K >= max degree for neighbor_lists).
# ---------------------------------------------------------------------------

def tile_neighbor_lists(
    x: jnp.ndarray,
    node_mask: jnp.ndarray,
    linker_mask: jnp.ndarray,
    fragment_only_mask: jnp.ndarray,
    pocket_only_mask: jnp.ndarray,
    graph_type: str,
    tile: int,
    m: int,
):
    """Fixed-shape tile-pair neighbour lists for the distance graphs
    (src/egnn.py:554-596 semantics, block-sparse TPU layout).

    Returns (tidx (B, nT, M) int32 — per row-tile, the M neighbour tiles with
    the most admissible edges; emask (B, nT, T, M*T, 1) in {0, 1} — the exact
    per-edge admissibility within the selected blocks).
    """
    B, N = x.shape[:2]
    if N % tile:
        raise ValueError(f'N={N} not divisible by tile={tile}')
    nT = N // tile
    m = min(m, nT)
    adj = distance_edge_mask(x, node_mask, linker_mask, fragment_only_mask,
                             pocket_only_mask, graph_type)[..., 0]
    tadj = adj.reshape(B, nT, tile, nT, tile)
    counts = jnp.sum(tadj, axis=(2, 4))                    # (B, nT, nT)
    _, tidx = jax.lax.top_k(counts, m)                     # (B, nT, M)
    # per-edge masks of the selected blocks: (B, nT_i, nT_j, T, T) -> gather
    tadj_p = jnp.transpose(tadj, (0, 1, 3, 2, 4))
    em = jax.vmap(jax.vmap(lambda rows, ti: rows[ti]))(tadj_p, tidx)
    em = jnp.transpose(em, (0, 1, 3, 2, 4)).reshape(B, nT, tile, m * tile)
    return tidx.astype(jnp.int32), em[..., None]


def gather_tiles(a: jnp.ndarray, tidx: jnp.ndarray, tile: int) -> jnp.ndarray:
    """a (B, N, F), tidx (B, nT, M) -> neighbour-tile rows (B, nT, M*T, F).
    One contiguous T-row gather per (row-tile, neighbour-tile)."""
    B, N, F = a.shape
    nT = N // tile
    at = a.reshape(B, nT, tile, F)
    g = jax.vmap(lambda ab, ib: ab[ib])(at, tidx)          # (B, nT, M, T, F)
    return g.reshape(B, nT, tidx.shape[-1] * tile, F)


def coord2diff_tiles(x: jnp.ndarray, tidx: jnp.ndarray, tile: int,
                     norm_constant: float = 1.0):
    """coord2diff over tile-pair blocks: x (B, N, 3), tidx (B, nT, M) ->
    d2 (B, nT, T, M*T, 1), cdiff (B, nT, T, M*T, 3), row i <- neighbour j."""
    B, N, _ = x.shape
    nT = N // tile
    xj = gather_tiles(x, tidx, tile)                       # (B, nT, MT, 3)
    xi = x.reshape(B, nT, tile, 1, 3)
    diff = xi - xj[:, :, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
    norm = jnp.sqrt(d2 + EPS_D2)
    return d2, diff / (norm + norm_constant)


# ---------------------------------------------------------------------------
# Masked centre-of-mass operations (reference: src/utils.py:50-96)
# ---------------------------------------------------------------------------

def remove_mean_with_mask(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Subtract the masked mean; keeps padded rows exactly zero."""
    n = jnp.sum(node_mask, axis=1, keepdims=True)
    mean = jnp.sum(x * node_mask, axis=1, keepdims=True) / n
    return (x - mean) * node_mask


def remove_partial_mean_with_mask(
    x: jnp.ndarray, node_mask: jnp.ndarray, com_mask: jnp.ndarray
) -> jnp.ndarray:
    """Subtract the centre of mass of the `com_mask` subset (fragments or
    anchors) from every real atom (src/utils.py:66-74)."""
    n = jnp.sum(com_mask, axis=1, keepdims=True)
    mean = jnp.sum(x * com_mask, axis=1, keepdims=True) / n
    return x - mean * node_mask


def mean_with_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask, axis=1, keepdims=True)
    return jnp.sum(x * mask, axis=1, keepdims=True) / n


# ---------------------------------------------------------------------------
# Masked Gaussian sampling (reference: src/utils.py:158-192) — functional RNG
# ---------------------------------------------------------------------------

def sample_gaussian_with_mask(key, shape, node_mask, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * node_mask


def sample_com_free_gaussian_with_mask(key, shape, node_mask, dtype=jnp.float32):
    """Gaussian noise projected onto the zero-centre-of-mass hyperplane
    (valid because an isotropic Gaussian is rotation invariant;
    src/utils.py:158-168)."""
    x = jax.random.normal(key, shape, dtype) * node_mask
    return remove_mean_with_mask(x, node_mask)


# ---------------------------------------------------------------------------
# Random-rotation augmentation (reference: src/utils.py:303-361)
# ---------------------------------------------------------------------------

def random_rotation(key, x: jnp.ndarray) -> jnp.ndarray:
    """Apply an independent random rotation (Euler XYZ) per sample: x @ Rᵀ."""
    bs = x.shape[0]
    kx, ky, kz = jax.random.split(key, 3)

    def axis_rot(theta, axis):
        c, s = jnp.cos(theta), jnp.sin(theta)
        one = jnp.ones_like(c)
        zero = jnp.zeros_like(c)
        if axis == 0:
            rows = [one, zero, zero, zero, c, s, zero, -s, c]
        elif axis == 1:
            rows = [c, zero, -s, zero, one, zero, s, zero, c]
        else:
            rows = [c, s, zero, -s, c, zero, zero, zero, one]
        return jnp.stack(rows, axis=-1).reshape(-1, 3, 3)

    def angles(k):
        return jax.random.uniform(k, (bs,)) * 2.0 * jnp.pi - jnp.pi

    r = axis_rot(angles(kx), 0)
    r = jnp.einsum('bij,bjk->bik', axis_rot(angles(ky), 1), r)
    r = jnp.einsum('bij,bjk->bik', axis_rot(angles(kz), 2), r)
    return jnp.einsum('bij,bnj->bni', r, x)


# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------

def sum_except_batch(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def numbers_of_nodes(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 1) mask -> (B,) node counts."""
    return jnp.sum(mask[..., 0], axis=1)
