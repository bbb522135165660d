"""Linker-size prediction: SizeGNN backbone + classifier / ordinal /
regressor heads, and the categorical size prior.

Reference: src/linker_size.py (SizeGNN :45-91, DistributionNodes :9-42) and
src/linker_size_lightning.py (SizeClassifier :14-172, SizeOrdinalClassifier
:175-335, SizeRegressor :338-468). The GNN runs on *fragment atoms only* over
a <6 Angstrom distance graph and mean-pools node logits.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from difflinker_tpu import constants
from difflinker_tpu.models.egnn import gcl_apply, init_gcl
from difflinker_tpu.models.layers import init_linear, linear
from difflinker_tpu.ops.geometry import coord2diff


class DistributionNodes:
    """Categorical prior over linker sizes from the train histogram
    (src/linker_size.py:9-42; histogram at src/const.py:50-61)."""

    def __init__(self, histogram: Dict[int, int] = None):
        histogram = histogram or constants.LINKER_SIZE_DIST
        self.sizes = np.asarray(list(histogram.keys()), np.int32)
        prob = np.asarray(list(histogram.values()), np.float64)
        self.prob = (prob / prob.sum()).astype(np.float32)
        self.keys = {int(s): i for i, s in enumerate(self.sizes)}

    def sample(self, key, n_samples: int = 1) -> jnp.ndarray:
        idx = jax.random.categorical(
            key, jnp.log(jnp.asarray(self.prob) + 1e-30), shape=(n_samples,))
        return jnp.asarray(self.sizes)[idx]

    def log_prob(self, batch_n_nodes) -> jnp.ndarray:
        idcs = np.asarray([self.keys[int(n)] for n in np.asarray(batch_n_nodes)])
        return jnp.log(jnp.asarray(self.prob) + 1e-30)[idcs]


# ---------------------------------------------------------------------------
# SizeGNN backbone
# ---------------------------------------------------------------------------

def init_size_gnn(key, in_node_nf: int, hidden_nf: int, out_node_nf: int,
                  n_layers: int, normalization: Optional[str] = 'batch_norm',
                  dtype=jnp.float32):
    keys = jax.random.split(key, n_layers + 2)
    gcls, states = [], []
    for i in range(n_layers):
        gp, gs = init_gcl(keys[2 + i], hidden_nf, hidden_nf, hidden_nf,
                          edges_in_d=1, attention=False,
                          normalization=normalization, dtype=dtype)
        gcls.append(gp)
        states.append(gs)
    params = {
        'embedding_in': init_linear(keys[0], in_node_nf, hidden_nf, dtype=dtype),
        'embedding_out': init_linear(keys[1], hidden_nf, out_node_nf, dtype=dtype),
        'gcls': gcls,
    }
    return params, {'gcls': states}


def size_gnn_apply(params, h, distances, node_mask, edge_mask, *,
                   normalization='batch_norm', state=None, train=False):
    """h: (B, N, F); distances: (B, N, N, 1) squared distances (the reference
    feeds coord2diff's radial straight in, src/linker_size_lightning.py:106);
    edge_mask: (B, N, N, 1)."""
    h = linear(params['embedding_in'], h)
    new_states = []
    for i, gp in enumerate(params['gcls']):
        gs = state['gcls'][i] if state else {}
        h, ns = gcl_apply(
            gp, h, distances, node_mask, edge_mask,
            act=jax.nn.relu, normalization_factor=1.0,
            aggregation_method='sum', attention=False,
            normalization=normalization, state=gs, train=train)
        new_states.append(ns)
    h = linear(params['embedding_out'], h)
    return h, {'gcls': new_states}


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def _forward_logits(params, batch, *, in_node_nf, with_pocket=False,
                    adjust_shape=False, normalization='batch_norm',
                    state=None, train=False):
    """Shared head plumbing (src/linker_size_lightning.py:83-109): zero out
    everything but fragments, build the <6A distance-edge mask over the FC
    fragment graph, run the GNN, mean-pool node outputs over all N rows."""
    h = jnp.asarray(batch['one_hot'])
    x = jnp.asarray(batch['positions'])
    key = 'fragment_only_mask' if with_pocket else 'fragment_mask'
    fragment_mask = jnp.asarray(batch[key])
    edge_mask = jnp.asarray(batch['edge_mask'])

    x = x * fragment_mask
    h = h * fragment_mask
    if adjust_shape and h.shape[-1] != in_node_nf:
        h = h[..., :-1]

    d2, _ = coord2diff(x)
    # reference compares the *squared* distance to 6 (coord2diff returns d²,
    # src/egnn.py:295-301 → `distances < 6` at linker_size_lightning.py:107)
    # and binarizes the collate edge mask via `.bool()` — which turns the
    # reference's -1/-2 values (see data/collate.reference_edge_mask) into
    # True, so self-loop edges ARE included here.
    dist_edge_mask = ((edge_mask != 0) & (d2 < 6.0)).astype(x.dtype)
    out, new_state = size_gnn_apply(
        params, h, d2, fragment_mask, dist_edge_mask,
        normalization=normalization, state=state, train=train)
    return jnp.mean(out, axis=1), new_state  # (B, out_nf)


def size_labels(linker_mask, size2id: Dict[int, int], id2size) -> np.ndarray:
    """Map true linker sizes to class ids; unseen sizes fall back to the max
    class (src/linker_size_lightning.py:119-128). Host-side."""
    sizes = np.asarray(linker_mask)[..., 0].sum(-1).astype(int)
    fallback = size2id[max(id2size)]
    return np.asarray([size2id.get(int(s), fallback) for s in sizes], np.int32)


def _size_label_table(size2id: Dict[int, int], id2size) -> np.ndarray:
    """Dense size→class-id table (fallback = max-size class) so label lookup
    is jit-safe."""
    max_size = max(id2size)
    table = np.full(max_size + 2, size2id[max_size], np.int32)
    for s, i in size2id.items():
        table[s] = i
    return table


def size_labels_jax(linker_mask, size2id: Dict[int, int], id2size) -> jnp.ndarray:
    table = jnp.asarray(_size_label_table(size2id, id2size))
    sizes = jnp.sum(jnp.asarray(linker_mask)[..., 0], axis=-1).astype(jnp.int32)
    return table[jnp.clip(sizes, 0, table.shape[0] - 1)]


def classifier_loss(logits, labels, class_weights=None):
    """Weighted cross-entropy matching torch's `cross_entropy(weight=...)`
    semantics (weighted mean)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = jnp.asarray(class_weights)[labels]
    return jnp.sum(nll * w) / jnp.sum(w)


def ordinal_loss(logits, labels):
    """Sigmoid outputs vs cumulative targets, per-sample summed MSE
    (src/linker_size_lightning.py:264-276)."""
    pred = jax.nn.sigmoid(logits)
    n_classes = logits.shape[-1]
    target = (jnp.arange(n_classes)[None, :] <= labels[:, None]).astype(pred.dtype)
    return jnp.mean(jnp.sum((pred - target) ** 2, axis=1))


def ordinal_prediction_to_label(logits):
    pred = jax.nn.sigmoid(logits)
    return jnp.sum(jnp.cumprod((pred > 0.5).astype(jnp.int32), axis=1), axis=1) - 1


def regressor_loss(output, linker_mask):
    true = jnp.sum(jnp.asarray(linker_mask)[..., 0], axis=-1)
    return jnp.mean((output[:, 0] - true) ** 2)


class SizePredictor:
    """Bundles backbone + head: task in {'classification', 'ordinal',
    'regression'}. Functional: params/state passed explicitly."""

    def __init__(self, in_node_nf, hidden_nf, out_node_nf, n_layers,
                 task='classification', normalization='batch_norm',
                 size2id=None, id2size=None, class_weights=None,
                 with_pocket=False):
        self.in_node_nf = in_node_nf
        self.hidden_nf = hidden_nf
        self.out_node_nf = 1 if task == 'regression' else out_node_nf
        self.n_layers = n_layers
        self.task = task
        self.normalization = normalization
        self.size2id = size2id or constants.ZINC_TRAIN_LINKER_SIZE2ID
        self.id2size = id2size or constants.ZINC_TRAIN_LINKER_ID2SIZE
        self.class_weights = class_weights
        self.with_pocket = with_pocket

    def init(self, key):
        return init_size_gnn(key, self.in_node_nf, self.hidden_nf,
                             self.out_node_nf, self.n_layers,
                             self.normalization)

    def forward(self, params, batch, state=None, train=False,
                adjust_shape=False):
        return _forward_logits(
            params, batch, in_node_nf=self.in_node_nf,
            with_pocket=self.with_pocket, adjust_shape=adjust_shape,
            normalization=self.normalization, state=state, train=train)

    def loss(self, params, batch, state=None, train=False):
        out, new_state = self.forward(params, batch, state, train)
        labels = size_labels_jax(batch['linker_mask'], self.size2id,
                                 self.id2size)
        if self.task == 'classification':
            loss = classifier_loss(out, labels, self.class_weights)
        elif self.task == 'ordinal':
            loss = ordinal_loss(out, labels)
        elif self.task == 'regression':
            loss = regressor_loss(out, batch['linker_mask'])
        else:
            raise ValueError(self.task)
        return loss, (out, new_state)

    def predict_sizes(self, params, batch, state=None, key=None) -> np.ndarray:
        """Predicted linker sizes (atoms), as used by sample-time size
        selection (sample.py:66-81, generate.py:88-99).

        With a PRNG `key`, the classification head SAMPLES class ids from
        softmax(logits) — the reference draws from a Categorical at sampling
        time (sample.py:71-74, generate.py:91-95) so repeated samples get
        diverse sizes; argmax (key=None) is for accuracy-style evaluation."""
        out, _ = self.forward(params, batch, state, train=False,
                              adjust_shape=True)
        if self.task == 'classification':
            if key is not None:
                ids = np.asarray(jax.random.categorical(key, out, axis=-1))
            else:
                ids = np.asarray(jnp.argmax(out, axis=-1))
            return np.asarray([self.id2size[i] for i in ids], np.int32)
        if self.task == 'ordinal':
            ids = np.asarray(ordinal_prediction_to_label(out))
            return np.asarray([self.id2size[max(int(i), 0)] for i in ids], np.int32)
        return np.asarray(jnp.round(out[:, 0]), np.int32)


def size_prediction_fn(predictor: 'SizePredictor', params, state=None):
    """Wrap a trained SizePredictor into a sampler-compatible size callable
    (sample.sampler.resolve_linker_sizes), reproducing generate.py:88-99: the
    size model sees the *fragment-edges* graph (collate_with_fragment_edges,
    src/datasets.py:378-422), so the edge mask is rebuilt here from the
    fragment mask of whatever batch the sampler is holding."""
    from difflinker_tpu.data.collate import reference_edge_mask

    def fn(batch: Dict, key=None) -> np.ndarray:
        mask_key = ('fragment_only_mask'
                    if predictor.with_pocket and 'fragment_only_mask' in batch
                    else 'fragment_mask')
        frag = np.asarray(batch[mask_key])[..., 0]
        sized = dict(batch)
        sized['edge_mask'] = reference_edge_mask(frag)
        if predictor.with_pocket:
            sized.setdefault('fragment_only_mask', batch[mask_key])
        return predictor.predict_sizes(params, sized, state, key=key)

    return fn
