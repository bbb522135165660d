"""Property tests: E(3)-equivariance of the dynamics, mask/CoM invariants.

The reference has no such tests; its rotation-augmentation code
(src/utils.py:303-361) doubles as the oracle here.
"""
import numpy as np
import jax
import jax.numpy as jnp

from difflinker_tpu.config import ModelConfig
from difflinker_tpu.models.dynamics import dynamics_apply, init_dynamics
from difflinker_tpu.ops import geometry, masks

from conftest import make_batch


def _apply(cfg, params, batch, context, x=None):
    xh = jnp.concatenate(
        [jnp.asarray(batch['positions'] if x is None else x),
         jnp.asarray(batch['one_hot'])], axis=-1)
    out, nan = dynamics_apply(
        params, jnp.asarray(0.37), xh, jnp.asarray(batch['atom_mask']),
        jnp.asarray(batch['linker_mask']), jnp.asarray(batch['edge_mask']),
        jnp.asarray(context), cfg=cfg)
    assert not np.asarray(nan).any()
    return np.asarray(out)


def test_egnn_rotation_equivariance(rng):
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                      n_layers=2, norm_constant=1e-6)
    params = init_dynamics(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, B=2, N=14, nf=8, n_frag=6, n_real=11)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)

    out = _apply(cfg, params, batch, context)
    vel, h_out = out[..., :3], out[..., 3:]

    # random rotation R
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    x_rot = (batch['positions'] @ q.T).astype(np.float32) * batch['atom_mask']
    out_rot = _apply(cfg, params, batch, context, x=x_rot)
    vel_rot, h_rot = out_rot[..., :3], out_rot[..., 3:]

    np.testing.assert_allclose(vel_rot, vel @ q.T, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(h_rot, h_out, atol=2e-4, rtol=1e-3)


def test_egnn_translation_invariance(rng):
    """Velocities and features are invariant to global translation (the model
    consumes only coordinate differences)."""
    cfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                      n_layers=2, norm_constant=1e-6)
    params = init_dynamics(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, B=2, N=14, nf=8, n_frag=6, n_real=11)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)

    out = _apply(cfg, params, batch, context)
    shift = np.array([1.5, -2.0, 0.25], np.float32)
    x_shift = (batch['positions'] + shift) * batch['atom_mask']
    out_shift = _apply(cfg, params, batch, context, x=x_shift)
    np.testing.assert_allclose(out_shift, out, atol=2e-4, rtol=1e-3)


def test_com_removal_invariants(rng):
    x = jnp.asarray(rng.standard_normal((3, 10, 3)).astype(np.float32))
    node_mask = jnp.asarray((rng.random((3, 10, 1)) < 0.8).astype(np.float32))
    node_mask = node_mask.at[:, :2].set(1.0)
    x = x * node_mask
    com_mask = node_mask.at[:, 5:].set(0.0)

    y = geometry.remove_mean_with_mask(x, node_mask)
    masks.assert_mean_zero_with_mask(y, node_mask)

    z = geometry.remove_partial_mean_with_mask(x, node_mask, com_mask)
    masks.assert_partial_mean_zero_with_mask(z, node_mask, com_mask)
    masks.assert_correctly_masked(z, node_mask)


def test_com_free_noise(rng):
    key = jax.random.PRNGKey(1)
    node_mask = jnp.ones((4, 12, 1))
    z = geometry.sample_com_free_gaussian_with_mask(key, (4, 12, 3), node_mask)
    masks.assert_mean_zero_with_mask(z, node_mask)


def test_random_rotation_preserves_distances(rng):
    x = jnp.asarray(rng.standard_normal((5, 8, 3)).astype(np.float32))
    y = geometry.random_rotation(jax.random.PRNGKey(2), x)
    dx = geometry.pairwise_dist(x)
    dy = geometry.pairwise_dist(y)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dx), atol=1e-4)


def test_nan_flags():
    a = jnp.asarray(np.array([[1.0, 2.0], [np.nan, 1.0], [3.0, 4.0]]))
    f = masks.nan_flags(a)
    assert list(np.asarray(f)) == [False, True, False]
