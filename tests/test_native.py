"""Native C++ kernels vs the numpy oracle."""
import numpy as np
import pytest

from difflinker_tpu import constants, native
from difflinker_tpu.chem import bonds

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library not built')


def _numpy_bond_orders(pos, t):
    """The pure-numpy path, bypassing the native dispatch."""
    pos = np.asarray(pos, np.float64)
    t = np.asarray(t, np.int64)
    diff = pos[:, None, :] - pos[None, :, :]
    dist_pm = 100.0 * np.sqrt((diff ** 2).sum(-1))
    thr1 = constants.BOND1_THRESHOLD[t[:, None], t[None, :]]
    thr2 = constants.BOND2_THRESHOLD[t[:, None], t[None, :]]
    thr3 = constants.BOND3_THRESHOLD[t[:, None], t[None, :]]
    order = np.zeros(dist_pm.shape, np.int8)
    order = np.where((thr1 > 0) & (dist_pm < thr1), 1, order)
    order = np.where((order >= 1) & (thr2 > 0) & (dist_pm < thr2), 2, order)
    order = np.where((order >= 2) & (thr3 > 0) & (dist_pm < thr3), 3, order)
    np.fill_diagonal(order, 0)
    return order


def test_native_bond_orders_match(rng):
    for trial in range(20):
        n = int(rng.integers(2, 60))
        pos = (rng.standard_normal((n, 3)) * 1.5).astype(np.float32)
        t = rng.integers(0, 9, n).astype(np.int32)
        got = native.bond_orders(pos, t)
        ref = _numpy_bond_orders(pos, t)
        np.testing.assert_array_equal(got, ref)
        assert (got == got.T).all()


def test_native_batch(rng):
    B, N = 5, 24
    pos = (rng.standard_normal((B, N, 3)) * 1.5).astype(np.float32)
    types = rng.integers(0, 9, (B, N)).astype(np.int32)
    n_atoms = rng.integers(2, N + 1, B).astype(np.int32)
    out = native.bond_orders_batch(pos, types, n_atoms)
    for b in range(B):
        n = n_atoms[b]
        ref = _numpy_bond_orders(pos[b, :n], types[b, :n])
        np.testing.assert_array_equal(out[b, :n, :n], ref)
        assert (out[b, n:, :] == 0).all() and (out[b, :, n:] == 0).all()


def test_native_connected_components():
    adj = np.zeros((6, 6), np.int8)
    adj[0, 1] = adj[1, 0] = 1
    adj[1, 2] = adj[2, 1] = 2
    adj[4, 5] = adj[5, 4] = 1
    labels = native.connected_components(adj)
    assert labels[0] == labels[1] == labels[2]
    assert labels[4] == labels[5]
    assert labels[3] not in (labels[0], labels[4])
    assert labels[0] != labels[4]


def test_native_valence():
    # ethane-like C-C: valid
    adj = np.zeros((2, 2), np.int8)
    adj[0, 1] = adj[1, 0] = 1
    assert native.valence_valid(adj, np.asarray([0, 0], np.int32))
    # F with 2 bonds: invalid (max valence 1)
    adj3 = np.zeros((3, 3), np.int8)
    adj3[0, 1] = adj3[1, 0] = 1
    adj3[1, 2] = adj3[2, 1] = 1
    t = np.asarray([0, 3, 0], np.int32)  # C-F-C
    assert not native.valence_valid(adj3, t)


def test_dispatch_consistency(rng):
    """chem.bonds.bond_order_matrix (native-dispatched) == explicit numpy."""
    pos = (rng.standard_normal((30, 3)) * 1.5).astype(np.float32)
    t = rng.integers(0, 9, 30)
    np.testing.assert_array_equal(bonds.bond_order_matrix(pos, t),
                                  _numpy_bond_orders(pos, t))
