"""Test configuration: force the CPU backend with 8 virtual devices so that
multi-chip sharding tests run without TPU hardware. Must run before jax is
imported anywhere."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
prev = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in prev:
    os.environ['XLA_FLAGS'] = (prev + ' --xla_force_host_platform_device_count=8').strip()

# The container's sitecustomize imports jax at interpreter start (registering
# the axon TPU plugin), so env vars alone are too late — update the live
# config before any backend is used.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == 'cpu'


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_batch(rng, B=3, N=20, nf=8, n_frag=9, n_real=16, pocket=0, dtype=np.float32):
    """Synthetic padded linker-design batch in the canonical dict layout
    (keys as in reference src/datasets.py:332-375)."""
    node_mask = np.zeros((B, N, 1), dtype)
    node_mask[:, :n_real] = 1
    fragment = np.zeros((B, N, 1), dtype)
    fragment[:, :n_frag + pocket] = 1
    fragment_only = np.zeros((B, N, 1), dtype)
    fragment_only[:, :n_frag] = 1
    pocket_mask = np.zeros((B, N, 1), dtype)
    if pocket:
        pocket_mask[:, n_frag:n_frag + pocket] = 1
    linker = node_mask - fragment
    x = (rng.standard_normal((B, N, 3)).astype(dtype) * 2.0) * node_mask
    one_hot = np.eye(nf, dtype=dtype)[rng.integers(0, nf, (B, N))] * node_mask
    anchors = np.zeros((B, N, 1), dtype)
    anchors[:, [1, n_frag - 1]] = 1
    anchors *= node_mask
    # reference-style values {0, -1, -2} — see data/collate.reference_edge_mask
    edge_mask = (node_mask[:, :, None, 0] * node_mask[:, None, :, 0]
                 * -(1 + np.eye(N, dtype=dtype)))[..., None]
    return {
        'positions': x, 'one_hot': one_hot, 'atom_mask': node_mask,
        'fragment_mask': fragment, 'fragment_only_mask': fragment_only,
        'pocket_mask': pocket_mask, 'linker_mask': linker, 'anchors': anchors,
        'edge_mask': edge_mask,
    }
