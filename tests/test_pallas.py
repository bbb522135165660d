"""Fused Pallas EGNN kernels vs the XLA reference path (interpreter mode on
CPU; the same kernels run compiled on TPU — exercised by bench/verify)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflinker_tpu.config import ModelConfig
from difflinker_tpu.models import egnn as egnn_lib
from difflinker_tpu.models.dynamics import dynamics_apply, init_dynamics
from difflinker_tpu.ops import egnn_pallas
from difflinker_tpu.ops.geometry import fc_edge_mask

from conftest import make_batch

egnn_pallas.INTERPRET = True


def _setup(rng, attention=False, tanh=False, B=4, N=16, H=32):
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=H,
                      n_layers=2, attention=attention, tanh=tanh,
                      norm_constant=1e-6)
    params = init_dynamics(jax.random.PRNGKey(0), cfg)['egnn']
    node_mask = jnp.ones((B, N, 1))
    node_mask = node_mask.at[:, N - 3:].set(0.0)
    linker = jnp.zeros((B, N, 1)).at[:, 7:N - 3].set(1.0)
    x = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 2) * node_mask
    h = jnp.asarray(rng.standard_normal((B, N, 11)).astype(np.float32)) * node_mask
    em = fc_edge_mask(node_mask)
    return cfg, params, h, x, node_mask, linker, em


@pytest.mark.parametrize('attention,tanh', [(False, False), (True, True)])
def test_pallas_egnn_matches_xla(rng, attention, tanh):
    cfg, params, h, x, node_mask, linker, em = _setup(rng, attention, tanh)
    h_ref, x_ref = egnn_lib.egnn_apply(params, h, x, node_mask, linker, em,
                                       cfg=cfg)
    h_pal, x_pal = egnn_pallas.egnn_apply_pallas(params, h, x, node_mask,
                                                 linker, em, cfg=cfg)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=1e-4, rtol=1e-3)


def test_pallas_dynamics_route(rng):
    """kernel_impl='pallas' end-to-end through dynamics_apply."""
    batch = make_batch(rng, B=4, N=16, nf=8, n_frag=6, n_real=13)
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                      n_layers=2, norm_constant=1e-6)
    cfg_p = dataclasses.replace(cfg, kernel_impl='pallas')
    params = init_dynamics(jax.random.PRNGKey(1), cfg)
    xh = jnp.concatenate([jnp.asarray(batch['positions']),
                          jnp.asarray(batch['one_hot'])], -1)
    ctx = jnp.concatenate([jnp.asarray(batch['anchors']),
                           jnp.asarray(batch['fragment_mask'])], -1)
    args = (jnp.asarray(0.3), xh, jnp.asarray(batch['atom_mask']),
            jnp.asarray(batch['linker_mask']), jnp.asarray(batch['edge_mask']),
            ctx)
    ref, _ = dynamics_apply(params, *args, cfg=cfg)
    pal, _ = dynamics_apply(params, *args, cfg=cfg_p)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_pallas_bf16_close(rng):
    cfg, params, h, x, node_mask, linker, em = _setup(rng)
    cfg16 = dataclasses.replace(cfg, dtype='bfloat16')
    h_ref, x_ref = egnn_lib.egnn_apply(params, h, x, node_mask, linker, em,
                                       cfg=cfg)
    h16, x16 = egnn_pallas.egnn_apply_pallas(params, h, x, node_mask, linker,
                                             em, cfg=cfg16)
    rel = np.linalg.norm(np.asarray(h16, np.float32) - np.asarray(h_ref)) \
        / np.linalg.norm(np.asarray(h_ref))
    assert rel < 0.03, rel
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x_ref),
                               atol=5e-2, rtol=5e-2)


def test_tile_picker():
    from difflinker_tpu.ops.egnn_pallas import _pick_tiles
    for b, n in ((128, 32), (16, 256), (8, 512), (4, 1024), (3, 48)):
        tb, ti = _pick_tiles(b, n)
        assert b % tb == 0 and n % ti == 0
        assert tb * ti * n <= 2 * 4096 or ti == n


def test_pallas_with_distance_graph(rng):
    """Pocket-style dense distance-cutoff edge masks flow through the fused
    kernels identically to the XLA path."""
    from difflinker_tpu.ops.geometry import distance_edge_mask
    cfg, params, h, x, node_mask, linker, _ = _setup(rng, B=2, N=16)
    frag_only = jnp.zeros((2, 16, 1)).at[:, :4].set(1.0) * node_mask
    pocket = jnp.zeros((2, 16, 1)).at[:, 4:7].set(1.0) * node_mask
    em = distance_edge_mask(x * 2.0, node_mask, linker, frag_only, pocket,
                            '4A')
    h_ref, x_ref = egnn_lib.egnn_apply(params, h, x, node_mask, linker, em,
                                       cfg=cfg)
    h_pal, x_pal = egnn_pallas.egnn_apply_pallas(params, h, x, node_mask,
                                                 linker, em, cfg=cfg)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=1e-4, rtol=1e-3)
