"""Fused Pallas TPU kernels for the EGNN message-passing hot loop.

The XLA path (models/egnn.py) materialises the (B, N, N, H) edge activations
in HBM between the edge-MLP matmuls — at N=32, H=128 that is ~67 MB per
tensor, several times per GCL, making the step partially HBM-bound. These
kernels fuse, per (batch-tile, i-tile) grid cell:

    pairwise d² (from coords, in-VMEM)  →  edge-MLP layer 1 (split-weight)
    →  SiLU  →  edge-MLP layer 2 (MXU)  →  [sigmoid attention gate]
    →  edge-mask multiply  →  row-sum aggregation  →  node MLP + residual

so edge activations exist only in VMEM. A second kernel does the equivariant
coordinate update the same way. Tiles are sized so each grid cell feeds the
MXU ≥~4k rows (batch-tiling amortises kernel overhead on small molecules,
i-tiling bounds VMEM on large pockets).

Numerics match the XLA path in float32 (tests/test_pallas.py; in-kernel dots
run at Precision.HIGHEST for fp32); with compute_dtype=bfloat16 the MLP
matmuls run in bf16 with float32 accumulation while all coordinate math stays
float32.

Used on the sampling/inference path (ModelConfig.kernel_impl='pallas');
training keeps the XLA path (autodiff). Restrictions: dense edge-mask graphs,
'sum' aggregation, no sinusoidal embedding (the flagship configs;
models/egnn.py falls back to XLA otherwise).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from difflinker_tpu.ops.geometry import EPS_D2

_TARGET_ROWS = 4096  # edge rows (TILE_B * TILE_I * N) per grid cell

# Tests flip this to run the kernels in interpreter mode on CPU.
INTERPRET = False


def _silu(x):
    """dtype-safe SiLU: jax.nn.silu broadcasts an f32 constant, which Mosaic
    rejects for bf16 4-D vectors."""
    one = jnp.ones((), x.dtype)
    return x / (one + jnp.exp(-x))


def _pick_tiles(b: int, n: int) -> Tuple[int, int]:
    """(TILE_B, TILE_I): keep TILE_B·TILE_I·N near _TARGET_ROWS."""
    tile_i = n
    while tile_i > 8 and tile_i * n > _TARGET_ROWS:
        if tile_i % 2:
            break
        tile_i //= 2
    tile_b = 1
    while (tile_b < b and b % (tile_b * 2) == 0
           and 2 * tile_b * tile_i * n <= _TARGET_ROWS):
        tile_b *= 2
    while n % tile_i:
        tile_i = n  # fallback: no i-tiling for awkward N
        break
    return tile_b, tile_i


def _dot(a, w, cd):
    prec = jax.lax.Precision.HIGHEST if cd == jnp.float32 else None
    return jnp.dot(a, w, preferred_element_type=jnp.float32, precision=prec)


def _pair_geometry(x_i, x_all):
    """x_i (TB, TI, 3), x_all (TB, N, 3) → d² (TB, TI, N), diff (TB, TI, N, 3)."""
    diff = x_i[:, :, None, :] - x_all[:, None, :, :]
    return jnp.sum(diff * diff, axis=-1), diff


def _edge_mlp(src_pre, dst_pre, d2, d20, we, w1, b1, cd):
    """Fused edge MLP: (TB, TI, N, H) activations never leave VMEM."""
    tb, ti, h = src_pre.shape
    n = dst_pre.shape[1]
    pre = (src_pre[:, :, None, :] + dst_pre[:, None, :, :]).astype(jnp.float32)
    pre = pre + d2[..., None] * we[0].astype(jnp.float32) \
              + d20[..., None] * we[1].astype(jnp.float32)
    m = _silu(pre).astype(cd).reshape(tb * ti * n, h)
    m = _silu(_dot(m, w1, cd) + b1.astype(jnp.float32))
    return m  # (TB*TI*N, H) float32


# ---------------------------------------------------------------------------
# GCL kernel
# ---------------------------------------------------------------------------

def _gcl_kernel(h_i_ref, src_pre_ref, dst_pre_ref, x_i_ref, x_all_ref,
                d20_i_ref, edge_mask_ref, node_mask_ref,
                we_ref, w1_ref, b1_ref, wa_ref, ba_ref,
                wn_h_ref, wn_a_ref, bn0_ref, wn1_ref, bn1_ref,
                out_ref, *, attention, norm_factor, cd):
    f32 = jnp.float32
    tb, ti, h = h_i_ref.shape
    n = x_all_ref.shape[1]

    d2, _ = _pair_geometry(x_i_ref[...].astype(f32), x_all_ref[...].astype(f32))
    m = _edge_mlp(src_pre_ref[...], dst_pre_ref[...], d2,
                  d20_i_ref[...].astype(f32), we_ref[...], w1_ref[...],
                  b1_ref[...], cd)
    if attention:
        logits = _dot(m.astype(cd), wa_ref[...], cd) + ba_ref[...].astype(f32)
        gate = 1.0 / (1.0 + jnp.exp(-logits))
        m = m * gate
    feat = m.reshape(tb, ti, n, h) * edge_mask_ref[...][..., None].astype(f32)
    agg = jnp.sum(feat, axis=2) / norm_factor  # (TB, TI, H)

    h_i = h_i_ref[...]
    out = (_dot(h_i.reshape(tb * ti, h), wn_h_ref[...], cd)
           + _dot(agg.astype(cd).reshape(tb * ti, h), wn_a_ref[...], cd)
           + bn0_ref[...].astype(f32))
    out = _silu(out).astype(cd)
    out = _dot(out, wn1_ref[...], cd) + bn1_ref[...].astype(f32)
    h_new = ((h_i.astype(f32).reshape(tb * ti, h) + out)
             .reshape(tb, ti, h) * node_mask_ref[...].astype(f32))
    out_ref[...] = h_new.astype(out_ref.dtype)


def gcl_pallas(p, h, x, d20, node_mask, edge_mask, *, attention: bool,
               normalization_factor: float, compute_dtype=jnp.float32):
    """Fused GCL forward. h (B,N,H); x (B,N,3) block-input coords; d20
    (B,N,N) initial squared distances; node_mask (B,N,1); edge_mask (B,N,N)
    multiplicative values (the reference {0,-1,-2} convention flows through).
    Returns h' (B,N,H) in compute dtype."""
    B, N, H = h.shape
    tb, ti = _pick_tiles(B, N)
    grid = (B // tb, N // ti)
    cd = jnp.dtype(compute_dtype)

    hc = h.astype(cd)
    w0 = p['edge_mlp']['lin0']['w'].astype(cd)
    w_src, w_dst, w_e = w0[:H], w0[H:2 * H], w0[2 * H:]
    # split-weight pre-products stay in XLA: two dense (B·N, H) matmuls
    src_pre = (hc @ w_src) + p['edge_mlp']['lin0']['b'].astype(cd)
    dst_pre = hc @ w_dst

    wn0 = p['node_mlp']['lin0']['w'].astype(cd)
    wa = p['att_mlp']['w'].astype(cd) if attention else jnp.zeros((H, 1), cd)
    ba = (p['att_mlp']['b'].astype(jnp.float32).reshape(1)
          if attention and 'b' in p['att_mlp'] else jnp.zeros((1,), jnp.float32))

    im_bi = lambda b, it: (b, it, 0)
    im_b = lambda b, it: (b, 0, 0)
    im_w2 = lambda *_: (0, 0)
    im_w1 = lambda *_: (0,)

    kernel = functools.partial(_gcl_kernel, attention=attention,
                               norm_factor=float(normalization_factor), cd=cd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, ti, H), im_bi),   # h_i
            pl.BlockSpec((tb, ti, H), im_bi),   # src_pre
            pl.BlockSpec((tb, N, H), im_b),     # dst_pre
            pl.BlockSpec((tb, ti, 3), im_bi),   # x_i
            pl.BlockSpec((tb, N, 3), im_b),     # x_all
            pl.BlockSpec((tb, ti, N), im_bi),   # d20_i
            pl.BlockSpec((tb, ti, N), im_bi),   # edge_mask_i
            pl.BlockSpec((tb, ti, 1), im_bi),   # node_mask_i
            pl.BlockSpec((2, H), im_w2),        # w_e
            pl.BlockSpec((H, H), im_w2),        # w1
            pl.BlockSpec((H,), im_w1),          # b1
            pl.BlockSpec((H, 1), im_w2),        # wa
            pl.BlockSpec((1,), im_w1),          # ba
            pl.BlockSpec((H, H), im_w2),        # wn_h
            pl.BlockSpec((H, H), im_w2),        # wn_a
            pl.BlockSpec((H,), im_w1),          # bn0
            pl.BlockSpec((H, H), im_w2),        # wn1
            pl.BlockSpec((H,), im_w1),          # bn1
        ],
        out_specs=pl.BlockSpec((tb, ti, H), im_bi),
        out_shape=jax.ShapeDtypeStruct((B, N, H), cd),
        interpret=INTERPRET,
    )(
        hc, src_pre, dst_pre,
        x.astype(jnp.float32), x.astype(jnp.float32),
        d20.astype(jnp.float32), edge_mask.astype(jnp.float32),
        node_mask.astype(jnp.float32),
        w_e, p['edge_mlp']['lin1']['w'].astype(cd),
        p['edge_mlp']['lin1']['b'].astype(jnp.float32),
        wa, ba,
        wn0[:H], wn0[H:],
        p['node_mlp']['lin0']['b'].astype(jnp.float32),
        p['node_mlp']['lin1']['w'].astype(cd),
        p['node_mlp']['lin1']['b'].astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# Equivariant coordinate-update kernel
# ---------------------------------------------------------------------------

def _coord_kernel(src_pre_ref, dst_pre_ref, x_i_ref, x_all_ref, d20_i_ref,
                  edge_mask_ref, linker_mask_ref, node_mask_ref,
                  we_ref, w1_ref, b1_ref, wout_ref,
                  out_ref, *, tanh, coords_range, norm_constant, norm_factor,
                  cd):
    f32 = jnp.float32
    tb, ti, h = src_pre_ref.shape
    n = x_all_ref.shape[1]

    x_i = x_i_ref[...].astype(f32)
    d2, diff = _pair_geometry(x_i, x_all_ref[...].astype(f32))
    cdiff = diff / (jnp.sqrt(d2 + EPS_D2)[..., None] + norm_constant)

    m = _edge_mlp(src_pre_ref[...], dst_pre_ref[...], d2,
                  d20_i_ref[...].astype(f32), we_ref[...], w1_ref[...],
                  b1_ref[...], cd)
    phi = _dot(m.astype(cd), wout_ref[...], cd).reshape(tb, ti, n)
    if tanh:
        phi = jnp.tanh(phi) * coords_range

    trans = cdiff * (phi * edge_mask_ref[...].astype(f32))[..., None]
    agg = jnp.sum(trans, axis=2) / norm_factor  # (TB, TI, 3)
    agg = agg * linker_mask_ref[...].astype(f32)
    out_ref[...] = (x_i + agg) * node_mask_ref[...].astype(f32)


def coord_update_pallas(p, h, x, d20, node_mask, linker_mask, edge_mask, *,
                        tanh: bool, coords_range: float, norm_constant: float,
                        normalization_factor: float, compute_dtype=jnp.float32):
    """Fused equivariant coordinate update. Returns x' (B,N,3) float32."""
    B, N, H = h.shape
    tb, ti = _pick_tiles(B, N)
    grid = (B // tb, N // ti)
    cd = jnp.dtype(compute_dtype)

    hc = h.astype(cd)
    w0 = p['lin0']['w'].astype(cd)
    w_src, w_dst, w_e = w0[:H], w0[H:2 * H], w0[2 * H:]
    src_pre = (hc @ w_src) + p['lin0']['b'].astype(cd)
    dst_pre = hc @ w_dst

    im_bi = lambda b, it: (b, it, 0)
    im_b = lambda b, it: (b, 0, 0)

    kernel = functools.partial(
        _coord_kernel, tanh=tanh, coords_range=float(coords_range),
        norm_constant=float(norm_constant),
        norm_factor=float(normalization_factor), cd=cd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, ti, H), im_bi),   # src_pre
            pl.BlockSpec((tb, N, H), im_b),     # dst_pre
            pl.BlockSpec((tb, ti, 3), im_bi),   # x_i
            pl.BlockSpec((tb, N, 3), im_b),     # x_all
            pl.BlockSpec((tb, ti, N), im_bi),   # d20_i
            pl.BlockSpec((tb, ti, N), im_bi),   # edge_mask
            pl.BlockSpec((tb, ti, 1), im_bi),   # linker_mask
            pl.BlockSpec((tb, ti, 1), im_bi),   # node_mask
            pl.BlockSpec((2, H), lambda *_: (0, 0)),
            pl.BlockSpec((H, H), lambda *_: (0, 0)),
            pl.BlockSpec((H,), lambda *_: (0,)),
            pl.BlockSpec((H, 1), lambda *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, ti, 3), im_bi),
        out_shape=jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        interpret=INTERPRET,
    )(
        src_pre, dst_pre,
        x.astype(jnp.float32), x.astype(jnp.float32),
        d20.astype(jnp.float32), edge_mask.astype(jnp.float32),
        linker_mask.astype(jnp.float32), node_mask.astype(jnp.float32),
        w_e, p['lin1']['w'].astype(cd), p['lin1']['b'].astype(jnp.float32),
        p['lin_out']['w'].astype(cd),
    )


# ---------------------------------------------------------------------------
# Block/EGNN drivers mirroring models/egnn.py
# ---------------------------------------------------------------------------

def block_apply_pallas(p, h, x, d20, node_mask, linker_mask, edge_mask, *, cfg):
    for gp in p['gcls']:
        h = gcl_pallas(gp, h, x, d20, node_mask, edge_mask,
                       attention=cfg.attention,
                       normalization_factor=cfg.normalization_factor,
                       compute_dtype=cfg.dtype)
    x = coord_update_pallas(
        p['coord'], h, x, d20, node_mask, linker_mask, edge_mask,
        tanh=cfg.tanh, coords_range=cfg.coords_range,
        norm_constant=cfg.norm_constant,
        normalization_factor=cfg.normalization_factor,
        compute_dtype=cfg.dtype)
    return h, x


def egnn_apply_pallas(p, h, x, node_mask, linker_mask, edge_mask, *, cfg):
    """Drop-in for models/egnn.egnn_apply on the inference path."""
    from difflinker_tpu.models.layers import linear

    assert not cfg.sin_embedding, 'pallas path: sin_embedding unsupported'
    assert cfg.aggregation_method == 'sum', 'pallas path: sum aggregation only'
    if linker_mask is None:
        linker_mask = node_mask
    if edge_mask is None:
        from difflinker_tpu.ops.geometry import fc_edge_mask
        edge_mask = fc_edge_mask(node_mask)  # reference {0,-1,-2} convention

    x = x.astype(jnp.float32)
    diff0 = x[:, :, None, :] - x[:, None, :, :]
    d20 = jnp.sum(diff0 * diff0, axis=-1)  # (B, N, N)
    em = edge_mask[..., 0]

    cd = jnp.dtype(cfg.dtype)
    h = h.astype(cd)
    p = jax.tree.map(lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, p)
    h = linear(p['embedding'], h)
    for bp in p['blocks']:
        h, x = block_apply_pallas(bp, h, x, d20, node_mask, linker_mask, em,
                                  cfg=cfg)
    h = linear(p['embedding_out'], h)
    h = h * node_mask.astype(h.dtype)
    return h.astype(jnp.float32), x
