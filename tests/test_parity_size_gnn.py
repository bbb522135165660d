"""Golden parity for the SizeGNN classifier path (incl. BatchNorm eval mode)
against the torch reference."""
import sys

import numpy as np

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from src.linker_size import SizeGNN as TorchSizeGNN  # noqa: E402
from src.egnn import coord2diff as torch_coord2diff  # noqa: E402

from difflinker_tpu.io.lightning_import import convert_size_gnn  # noqa: E402
from difflinker_tpu.models.size_gnn import (  # noqa: E402
    SizePredictor, ordinal_prediction_to_label, size_labels)
from difflinker_tpu import constants  # noqa: E402

from conftest import make_batch  # noqa: E402


def _torch_forward(tmodel, batch, in_node_nf):
    """Replicates SizeClassifier.forward (src/linker_size_lightning.py:83-109)
    on the raw torch SizeGNN."""
    B, N = batch['positions'].shape[:2]
    x = torch.tensor(batch['positions'] * batch['fragment_mask'])
    h = torch.tensor(batch['one_hot'] * batch['fragment_mask'])
    frag = torch.tensor(batch['fragment_mask']).view(B * N, 1)
    edge_mask = torch.tensor(batch['edge_mask'].reshape(B * N * N, 1))

    rows, cols = [], []
    for b in range(B):
        for i in range(N):
            for j in range(N):
                rows.append(i + b * N)
                cols.append(j + b * N)
    edges = [torch.LongTensor(rows), torch.LongTensor(cols)]

    x = x.view(B * N, -1)
    h = h.view(B * N, -1)
    distances, _ = torch_coord2diff(x, edges)
    dist_edge_mask = (edge_mask.bool() & (distances < 6)).long()
    with torch.no_grad():
        out = tmodel.forward(h, edges, distances, frag, dist_edge_mask)
    return out.view(B, N, -1).mean(1).numpy()


def test_size_gnn_parity(rng):
    from difflinker_tpu.data.collate import reference_edge_mask
    batch = make_batch(rng, B=3, N=16, nf=8, n_frag=7, n_real=13)
    # fragment-only edge mask, as collate_with_fragment_edges builds it
    batch['edge_mask'] = reference_edge_mask(batch['fragment_mask'][..., 0])

    torch.manual_seed(5)
    tmodel = TorchSizeGNN(in_node_nf=8, hidden_nf=32, out_node_nf=10,
                          n_layers=3, normalization='batch_norm').eval()
    ref = _torch_forward(tmodel, batch, 8)

    params, state = convert_size_gnn(tmodel.state_dict(), '', n_layers=3)
    pred = SizePredictor(in_node_nf=8, hidden_nf=32, out_node_nf=10, n_layers=3)
    out, _ = pred.forward(params, batch, state=state, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_size_labels_fallback():
    lm = np.zeros((3, 20, 1), np.float32)
    lm[0, :5] = 1    # size 5 -> id 2
    lm[1, :12] = 1   # size 12 -> id 9
    lm[2, :19] = 1   # size 19 unseen -> falls back to max size id
    labels = size_labels(lm, constants.ZINC_TRAIN_LINKER_SIZE2ID,
                         constants.ZINC_TRAIN_LINKER_ID2SIZE)
    assert labels.tolist() == [2, 9, 9]


def test_ordinal_prediction():
    logits = jnp.asarray(np.array([
        [9.0, 9.0, 9.0, -9.0],   # first 3 above 0.5 -> label 2
        [-9.0, 9.0, 9.0, 9.0],   # cumprod breaks at 0 -> label -1+0
    ], np.float32))
    labels = np.asarray(ordinal_prediction_to_label(logits))
    assert labels.tolist() == [2, -1]


def test_distribution_nodes():
    import jax
    from difflinker_tpu.models.size_gnn import DistributionNodes
    dist = DistributionNodes()
    s = np.asarray(dist.sample(jax.random.PRNGKey(0), 4000))
    assert s.min() >= 3 and s.max() <= 12
    # mode of the train histogram is size 3
    vals, counts = np.unique(s, return_counts=True)
    assert vals[np.argmax(counts)] in (3, 4)
    lp = np.asarray(dist.log_prob(np.asarray([3, 12])))
    assert lp[0] > lp[1]


def test_size_training_step(rng):
    """End-to-end: classification loss is finite and decreases."""
    import jax
    import optax
    batch = make_batch(rng, B=8, N=16, nf=8, n_frag=7, n_real=13)
    pred = SizePredictor(in_node_nf=8, hidden_nf=32, out_node_nf=10, n_layers=2)
    params, state = pred.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, state, opt):
        (loss, (_, new_state)), grads = jax.value_and_grad(
            lambda p: pred.loss(p, batch, state, train=True), has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_state, opt, loss

    losses = []
    for _ in range(20):
        params, state, opt, loss = step(params, state, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_size_gnn_train_mode_batchnorm_parity(rng):
    """BatchNorm TRAIN-mode parity: batch statistics over all (B·N) rows
    including padding (src/egnn.py:31-38) and torch-style unbiased running
    stats, verified against a torch SizeGNN in train mode."""
    from difflinker_tpu.data.collate import reference_edge_mask
    batch = make_batch(rng, B=2, N=12, nf=8, n_frag=6, n_real=10)
    batch['edge_mask'] = reference_edge_mask(batch['fragment_mask'][..., 0])

    torch.manual_seed(9)
    tmodel = TorchSizeGNN(in_node_nf=8, hidden_nf=16, out_node_nf=10,
                          n_layers=2, normalization='batch_norm').train()
    # convert BEFORE the torch forward mutates its running stats
    params, state = convert_size_gnn(tmodel.state_dict(), '', n_layers=2)
    ref = _torch_forward(tmodel, batch, 8)  # torch module left in train mode
    pred = SizePredictor(in_node_nf=8, hidden_nf=16, out_node_nf=10, n_layers=2)
    out, new_state = pred.forward(params, batch, state=state, train=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)

    # running stats updated like torch (momentum 0.1, unbiased variance)
    t_bn = tmodel.gcl1.node_mlp[1]
    got_mean = np.asarray(new_state['gcls'][0]['bn0']['mean'])
    got_var = np.asarray(new_state['gcls'][0]['bn0']['var'])
    np.testing.assert_allclose(got_mean, t_bn.running_mean.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(got_var, t_bn.running_var.numpy(),
                               atol=1e-4, rtol=1e-3)
