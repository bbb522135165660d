"""Training harness for the linker-diffusion model.

Replaces the reference's PyTorch-Lightning DDPM module
(src/lightning.py:30-481) with a pure-JAX train step: context assembly + CoM
removal + EDM loss + grad + AdamW update fused into ONE jitted program,
data-parallel over the device mesh via sharding annotations (XLA inserts the
gradient all-reduce over ICI).
"""
from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from difflinker_tpu.config import CenterOfMass, ExperimentConfig
from difflinker_tpu.diffusion.edm import make_edm
from difflinker_tpu.ops import geometry
from difflinker_tpu.parallel import mesh as mesh_lib
from difflinker_tpu.train.optim import adamw_amsgrad


def assemble_context(batch: Dict, *, anchors_context: bool, has_pocket: bool):
    """Context channels fed to the denoiser (src/lightning.py:157-171):
    [anchors?, fragment_mask] or pocket 3-channel
    [anchors?, fragment_only, pocket_only]."""
    anchors = batch['anchors']
    fragment_mask = batch['fragment_mask']
    if has_pocket:
        fragment_only = batch['fragment_only_mask']
        pocket_only = fragment_mask - fragment_only
        parts = [fragment_only, pocket_only]
    else:
        parts = [fragment_mask]
    if anchors_context:
        parts = [anchors] + parts
    return jnp.concatenate(parts, axis=-1)


def com_mask_for(batch: Dict, *, center_of_mass: CenterOfMass,
                 has_pocket: bool, inpainting: bool):
    """Which atoms define the removed centre of mass
    (src/lightning.py:173-183)."""
    if inpainting:
        return batch['atom_mask']
    if center_of_mass == CenterOfMass.FRAGMENTS:
        return batch['fragment_only_mask'] if has_pocket else batch['fragment_mask']
    if center_of_mass == CenterOfMass.ANCHORS:
        return batch['anchors']
    raise NotImplementedError(center_of_mass)


def wrap_pad(arrays: Dict, n_dev: int, *, axis: int = 0) -> (Dict, int):
    """Wrap-pad the batch axis of every array to a multiple of n_dev with
    duplicate samples (so ragged batches shard instead of being dropped).
    A `sample_weight` array is attached/extended with 0 for the duplicated
    rows — the EDM loss weights every batch-mean term by it, so duplicates
    contribute exactly nothing to the loss or the gradients (they only fill
    out the device mesh). `sample_weight` is attached even when no padding
    happens (all-ones) so padded and unpadded batches share one arg-pytree
    structure — a second structure would trigger a second multi-minute XLA
    program compile through the tunnel (CLAUDE.md: FEWER programs). Returns
    (padded arrays, number of padded rows; 0 = untouched)."""
    bs = next(iter(arrays.values())).shape[axis]
    if bs % n_dev == 0:
        if 'sample_weight' not in arrays:
            lead = np.asarray(next(iter(arrays.values()))).shape[:axis + 1]
            arrays = dict(arrays)
            arrays['sample_weight'] = np.ones(lead, np.float32)
        return arrays, 0
    pad = n_dev - bs % n_dev
    pad_rows = np.arange(pad) % bs
    out = {k: np.concatenate(
        [np.asarray(v), np.take(np.asarray(v), pad_rows, axis=axis)],
        axis=axis) for k, v in arrays.items()}
    if 'sample_weight' in out:
        # existing weights were wrapped along with the rows — zero the pad
        w = np.array(out['sample_weight'], np.float32)
    else:
        lead = out[next(iter(out))].shape[:axis + 1]
        w = np.ones(lead, np.float32)
    pad_slice = (slice(None),) * axis + (slice(bs, None),)
    w[pad_slice] = 0.0
    out['sample_weight'] = w
    return out, pad


class Trainer:
    """Builds the EDM + optimizer from an ExperimentConfig and exposes pure
    jitted train/eval steps. State is a plain pytree dict
    {'params', 'opt_state', 'step'} (orbax-friendly)."""

    BATCH_KEYS = ('positions', 'one_hot', 'atom_mask', 'fragment_mask',
                  'linker_mask', 'anchors', 'edge_mask', 'fragment_only_mask',
                  'pocket_mask', 'sample_weight')

    def __init__(self, cfg: ExperimentConfig, mesh=None,
                 grad_clip_norm: Optional[float] = None,
                 ema_beta: Optional[float] = None,
                 adaptive_clip: bool = False,
                 lr_schedule: str = 'constant',
                 decay_steps: Optional[int] = None,
                 warmup_steps: int = 0):
        from difflinker_tpu.train.optim import build_lr
        self.cfg = cfg
        self.edm = make_edm(cfg.model, cfg.diffusion)
        lr = build_lr(cfg.train.lr, lr_schedule, decay_steps, warmup_steps)
        self.tx = adamw_amsgrad(lr, cfg.train.weight_decay,
                                cfg.train.amsgrad, grad_clip_norm)
        self.mesh = mesh
        self.has_pocket = cfg.data.has_pocket
        self.ema_beta = ema_beta
        self.adaptive_clip = adaptive_clip
        self._grad_queue = None
        if adaptive_clip:
            from difflinker_tpu.train.ema import GradNormQueue
            self._grad_queue = GradNormQueue()
        self._train_step = None
        self._eval_step = None

    # -- state ---------------------------------------------------------------

    def init_state(self, key) -> Dict:
        params = self.edm.init_params(key)
        state = {'params': params,
                 'opt_state': self.tx.init(params),
                 'step': jnp.zeros((), jnp.int32)}
        if self.ema_beta is not None:
            from difflinker_tpu.train.ema import ema_init
            state['ema_params'] = ema_init(params)
        if self.mesh is not None:
            state = mesh_lib.replicate_params(self.mesh, state)
        return state

    # -- loss ----------------------------------------------------------------

    def _prepare(self, batch: Dict, key, training: bool):
        """Context + CoM removal + optional rotation augmentation
        (src/lightning.py:148-199)."""
        x = batch['positions']
        node_mask = batch['atom_mask']
        context = assemble_context(
            batch, anchors_context=self.cfg.train.anchors_context,
            has_pocket=self.has_pocket)
        com_mask = com_mask_for(
            batch, center_of_mass=self.cfg.train.center_of_mass,
            has_pocket=self.has_pocket,
            inpainting=self.cfg.diffusion.inpainting)
        if self.cfg.diffusion.inpainting:
            x = geometry.remove_mean_with_mask(x, node_mask)
        else:
            x = geometry.remove_partial_mean_with_mask(x, node_mask, com_mask)
        if training and self.cfg.train.data_augmentation:
            x = geometry.random_rotation(key, x) * node_mask
        return x, context

    def loss_fn(self, params, batch: Dict, key, training: bool):
        kaug, kloss = jax.random.split(key)
        x, context = self._prepare(batch, kaug, training)
        terms = self.edm.loss(
            params, kloss, x, batch['one_hot'], batch['atom_mask'],
            batch['fragment_mask'], batch['linker_mask'],
            batch.get('edge_mask'), context,
            sample_weight=batch.get('sample_weight'))
        return terms['loss'], terms

    # -- steps ----------------------------------------------------------------

    def train_step(self, state: Dict, batch: Dict, key,
                   max_grad_norm=jnp.inf) -> (Dict, Dict):
        grads, terms = jax.grad(
            lambda p: self.loss_fn(p, batch, key, training=True),
            has_aux=True)(state['params'])
        from difflinker_tpu.train.ema import clip_by_norm, ema_update
        grads, grad_norm = clip_by_norm(grads, max_grad_norm)
        updates, opt_state = self.tx.update(grads, state['opt_state'],
                                            state['params'])
        params = jax.tree.map(lambda p, u: p + u, state['params'], updates)
        metrics = {k: v for k, v in terms.items() if k != 'nan_flag'}
        metrics['grad_norm'] = grad_norm
        new_state = {'params': params, 'opt_state': opt_state,
                     'step': state['step'] + 1}
        if 'ema_params' in state:
            new_state['ema_params'] = ema_update(
                state['ema_params'], params, self.ema_beta)
        return new_state, metrics

    def eval_step(self, state: Dict, batch: Dict, key) -> Dict:
        _, terms = self.loss_fn(state['params'], batch, key, training=False)
        return {k: v for k, v in terms.items() if k != 'nan_flag'}

    def epoch_scan_step(self, state: Dict, stacked: Dict, key,
                        max_grad_norm=jnp.inf):
        """A whole epoch (or shard of one) as ONE jitted program: lax.scan the
        train step over stacked (S, B, ...) batches. Collapses S dispatches
        into one — essential when per-dispatch latency rivals step time
        (small models, tunneled TPUs). Returns (state, mean metrics).

        The dense FC edge mask is derived on-device from atom_mask (the
        stacked (S, B, N, N) tensor would dominate the host-to-device payload
        otherwise). Distance-graph models ignore it anyway."""
        def body(carry, batch):
            st, i = carry
            if 'edge_mask' not in batch:
                from difflinker_tpu.ops.geometry import fc_edge_mask
                batch = dict(batch)
                batch['edge_mask'] = fc_edge_mask(batch['atom_mask'])
            st, metrics = self.train_step(
                st, batch, jax.random.fold_in(key, i), max_grad_norm)
            return (st, i + 1), metrics
        (state, _), metrics = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), stacked)
        return state, jax.tree.map(jnp.mean, metrics)

    def compiled_epoch_scan(self):
        if getattr(self, '_epoch_scan', None) is None:
            if self.mesh is not None:
                self._epoch_scan = self._sharded_jit(self.epoch_scan_step,
                                                     n_lead=1, n_post=2,
                                                     out_n=2)
            else:
                self._epoch_scan = jax.jit(self.epoch_scan_step)
        return self._epoch_scan

    def _sharded_jit(self, step, *, n_lead, n_post, out_n):
        """jit `step(state, batch, *rest)` with mesh shardings. The batch
        dict's shardings depend on its key set (and, on a 2-D data×atoms
        mesh, on which axes are node axes), so compiled programs are cached
        per key set and built lazily from the first batch seen."""
        rep = mesh_lib.replicated(self.mesh)
        cache = {}

        def dispatch(state, batch, *rest):
            ks = tuple(sorted(batch.keys()))
            if ks not in cache:
                bsh = mesh_lib.batch_shardings(self.mesh, batch,
                                               n_lead=n_lead)
                cache[ks] = jax.jit(
                    step,
                    in_shardings=(rep, bsh) + (rep,) * n_post,
                    out_shardings=(rep,) * out_n if out_n > 1 else rep)
            # hints are read at TRACE time (first call per shape): on a mesh
            # with a `senders` axis the pairwise intermediates get pinned to
            # their 2-D edge sharding; no-op otherwise
            with mesh_lib.sharding_hints(self.mesh):
                return cache[ks](state, batch, *rest)
        return dispatch

    def fit_epoch_scanned(self, state: Dict, packed, batch_size: int, key,
                          shuffle: bool = True, seed: int = 0):
        """fit_epoch over a data.packed.PackedDataset with one dispatch per
        (bucket, epoch). Adaptive clipping applies one threshold per bucket
        dispatch (coarser than fit_epoch's per-step threshold)."""
        n_dev = (self.mesh.shape[mesh_lib.DATA_AXIS]
                 if self.mesh is not None else 1)
        batch_size = max((batch_size // n_dev) * n_dev, n_dev)
        agg = {}
        weights = []
        duplicated = 0  # zero-weight wrap-pad rows (mesh fill, no gradient)
        dropped = 0     # ragged epoch tails left out by stacked_epoch
        step_fn = self.compiled_epoch_scan()
        for bucket, stacked in packed.stacked_epoch(
                batch_size, shuffle=shuffle, seed=seed).items():
            n_steps, bsz = stacked['positions'].shape[:2]
            dropped += packed.packs[bucket]['positions'].shape[0] - n_steps * bsz
            # A bucket smaller than the mesh (or not a device multiple):
            # wrap-pad so the whole bucket trains instead of vanishing.
            stacked, pad = wrap_pad(stacked, n_dev, axis=1)
            duplicated += pad * n_steps
            if self.mesh is not None:
                stacked = mesh_lib.pad_nodes_to_multiple(
                    stacked, mesh_lib.node_pad_multiple(self.mesh), n_lead=1)
            key, sub = jax.random.split(key)
            js = {k: jnp.asarray(v) for k, v in stacked.items()
                  if k in self.BATCH_KEYS}
            thr = (self._grad_queue.threshold()
                   if self._grad_queue is not None else jnp.inf)
            state, metrics = step_fn(state, js, sub,
                                     jnp.asarray(thr, jnp.float32))
            if self._grad_queue is not None:
                self._grad_queue.observe(float(metrics['grad_norm']))
            weights.append(n_steps)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
        out = {k: float(np.average(v, weights=weights))
               for k, v in agg.items()}
        if duplicated or dropped:
            out['duplicated_samples'] = float(duplicated)
            out['dropped_tail_samples'] = float(dropped)
            if not getattr(self, '_warned_ragged', False):
                print(f'[trainer] ragged-epoch accounting: {duplicated} '
                      f'zero-weight wrap-pad rows, {dropped} tail samples '
                      f'dropped this epoch (reported per-epoch in metrics)')
                self._warned_ragged = True
        return state, out

    # -- jitted/sharded entry points -------------------------------------------

    def compiled_train_step(self):
        """jit the train step; with a mesh, batches are sharded over `data`
        and params replicated — XLA emits the gradient all-reduce."""
        if self._train_step is None:
            if self.mesh is not None:
                self._train_step = self._sharded_jit(self.train_step,
                                                     n_lead=0, n_post=2,
                                                     out_n=2)
            else:
                self._train_step = jax.jit(self.train_step)
        return self._train_step

    def compiled_eval_step(self):
        if self._eval_step is None:
            if self.mesh is not None:
                self._eval_step = self._sharded_jit(self.eval_step,
                                                    n_lead=0, n_post=1,
                                                    out_n=1)
            else:
                self._eval_step = jax.jit(self.eval_step)
        return self._eval_step

    # -- loops -----------------------------------------------------------------

    def fit_epoch(self, state: Dict, batches: Iterator[Dict], key,
                  log_every: Optional[int] = None) -> (Dict, Dict):
        """One pass over an iterator of padded batch dicts. Returns (state,
        averaged metrics)."""
        step_fn = self.compiled_train_step()
        agg: Dict[str, list] = {}
        for i, batch in enumerate(batches):
            key, sub = jax.random.split(key)
            jbatch = self._device_batch(batch)
            thr = (self._grad_queue.threshold()
                   if self._grad_queue is not None else jnp.inf)
            state, metrics = step_fn(state, jbatch, sub,
                                     jnp.asarray(thr, jnp.float32))
            if self._grad_queue is not None:
                self._grad_queue.observe(float(metrics['grad_norm']))
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
            if log_every and i % log_every == 0:
                print(f'[{time.strftime("%H:%M:%S")}] step {i}: '
                      f'loss={float(metrics["loss"]):.4f}')
        return state, {k: float(np.mean(v)) for k, v in agg.items()}

    def evaluate(self, state: Dict, batches: Iterator[Dict], key) -> Dict:
        step_fn = self.compiled_eval_step()
        agg: Dict[str, list] = {}
        for batch in batches:
            key, sub = jax.random.split(key)
            jbatch = self._device_batch(batch)
            metrics = step_fn(state, jbatch, sub)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in agg.items()}

    def _device_batch(self, batch: Dict) -> Dict:
        sub = {k: batch[k] for k in self.BATCH_KEYS if k in batch}
        if self.mesh is not None:
            # ragged batches can't shard evenly — wrap-pad to a device
            # multiple with zero-weight duplicate rows so no sample is
            # dropped and no gradient is double-counted
            n_dev = self.mesh.shape[mesh_lib.DATA_AXIS]
            sub, pad = wrap_pad(sub, n_dev)
            sub = mesh_lib.pad_nodes_to_multiple(
                sub, mesh_lib.node_pad_multiple(self.mesh))
            if pad and not getattr(self, '_warned_pad', False):
                bs = next(iter(sub.values())).shape[0] - pad
                print(f'[trainer] wrap-padding ragged batch {bs} -> '
                      f'{bs + pad} to fit the {n_dev}-device mesh '
                      f'(logged once)')
                self._warned_pad = True
            return mesh_lib.shard_batch(self.mesh, sub)
        return {k: jnp.asarray(v) for k, v in sub.items()}
