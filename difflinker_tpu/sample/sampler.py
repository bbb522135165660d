"""High-level linker sampling API.

Covers the reference's sampling entry paths (DDPM.sample_chain,
src/lightning.py:405-463; sample.py; generate.py):

  * linker-size selection: ground truth, constant, uniform range, categorical
    prior (DistributionNodes) or a trained SizePredictor;
  * template construction (fragments kept, linker rows re-initialised) padded
    to size buckets so each (B, N) shape compiles once;
  * context assembly + fragment-CoM removal;
  * the whole reverse chain as one jitted program per shape (cached);
  * NaN handling: per-sample flags from the scan; flagged samples are re-drawn
    with fresh keys up to `max_retries` times (replaces the reference's
    exception-based retry, generate.py:153-161).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from difflinker_tpu.config import ExperimentConfig
from difflinker_tpu.data.collate import create_templates_for_linker_generation
from difflinker_tpu.diffusion.edm import make_edm
from difflinker_tpu.models.size_gnn import DistributionNodes
from difflinker_tpu.train.trainer import assemble_context, com_mask_for


SizeSpec = Union[str, int, Tuple[int, int], Callable]


def resolve_linker_sizes(size_spec: SizeSpec, batch: Dict, key) -> np.ndarray:
    """Linker sizes per sample (generate.py:68-99 polymorphism)."""
    n = np.asarray(batch['fragment_mask']).shape[0]
    if callable(size_spec):
        # pass the PRNG key so predictors can draw from their categorical
        # (reference sample.py:71-74); key-less callables keep working
        import inspect
        try:
            takes_key = len(inspect.signature(size_spec).parameters) >= 2
        except (TypeError, ValueError):
            takes_key = False
        return np.asarray(
            size_spec(batch, key) if takes_key else size_spec(batch), np.int32)
    if size_spec == 'ground_truth':
        return np.asarray(batch['linker_mask'])[..., 0].sum(-1).astype(np.int32)
    if size_spec == 'prior':
        return np.asarray(DistributionNodes().sample(key, n), np.int32)
    if isinstance(size_spec, int):
        return np.full((n,), size_spec, np.int32)
    if isinstance(size_spec, (tuple, list)) and len(size_spec) == 2:
        lo, hi = size_spec
        return np.asarray(jax.random.randint(key, (n,), lo, hi + 1), np.int32)
    raise ValueError(f'bad linker size spec: {size_spec!r}')


class LinkerSampler:
    """mesh: optional 1-D data mesh — batches shard over it and the whole
    reverse chain runs data-parallel across chips (multi-chip sampling
    sweeps; params replicated)."""

    def __init__(self, cfg: ExperimentConfig, params, edm=None,
                 max_retries: int = 5, mesh=None,
                 pad_batch_to: Optional[int] = None,
                 pad_nodes_to: Optional[int] = None):
        self.cfg = cfg
        self.edm = edm or make_edm(cfg.model, cfg.diffusion)
        self.mesh = mesh
        if mesh is not None:
            from difflinker_tpu.parallel import mesh as mesh_lib
            params = mesh_lib.replicate_params(mesh, params)
        self.params = params
        self.max_retries = max_retries
        # pad_batch_to: wrap-pad smaller batches up to this size so ragged
        # tail batches reuse the full batch's compiled chain instead of
        # triggering a fresh (B, N)-shape compile (~tens of seconds each on
        # TPU; measured dominant in eval sweeps — samples are per-row
        # independent, so padded rows are computed and discarded).
        self.pad_batch_to = pad_batch_to
        # pad_nodes_to: pad every template to this node count (instead of the
        # per-batch size bucket) so ONE chain program serves every batch.
        # Worth it whenever program compile/load dominates — each extra
        # (B, N) shape costs a full XLA compile, and on tunneled backends a
        # multi-minute device program load. Batches whose samples need more
        # rows fall back to their natural bucket.
        self.pad_nodes_to = pad_nodes_to
        self._compiled = {}

    def update_params(self, params):
        """Swap the weights without losing compiled chains — params are jit
        ARGUMENTS, so one compiled program serves any weights. Training-eval
        loops should build one sampler and call this per eval instead of
        constructing a fresh sampler (which recompiles every chain shape)."""
        if self.mesh is not None:
            from difflinker_tpu.parallel import mesh as mesh_lib
            params = mesh_lib.replicate_params(self.mesh, params)
        self.params = params
        return self

    # -- jit cache -------------------------------------------------------------

    def _chain_fn(self, shape_key, keep_frames):
        if (shape_key, keep_frames) not in self._compiled:
            def fn(params, key, x, h, node_mask, fragment_mask, linker_mask,
                   edge_mask, context):
                return self.edm.sample_chain(
                    params, key, x, h, node_mask, fragment_mask, linker_mask,
                    edge_mask, context, keep_frames=keep_frames)
            if self.mesh is None:
                jitted = jax.jit(fn)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from difflinker_tpu.parallel import mesh as mesh_lib
                rep = mesh_lib.replicated(self.mesh)
                dsh = mesh_lib.batch_sharding(self.mesh)
                # (B, N, ...) tensors also shard their node axis over a 2-D
                # data×atoms mesh (sequence parallelism; == dsh on 1-D); the
                # (B, N, N, 1) edge mask additionally shards its SENDER axis
                # on a 3-D data×atoms×senders mesh
                nsh = mesh_lib.node_sharding(self.mesh)
                psh = mesh_lib.pair_sharding(self.mesh)
                outs = (nsh, nsh, dsh)  # xs, hs, per-sample nan flags
                if keep_frames is not None:
                    # chain is (keep_frames, B, N, ...): batch is axis 1
                    spec = (None, mesh_lib.DATA_AXIS)
                    if mesh_lib.atom_axis_size(self.mesh) > 1:
                        spec = spec + (mesh_lib.ATOM_AXIS,)
                    outs = outs + (NamedSharding(self.mesh, P(*spec)),)
                # args: params, key, x, h, node_mask, fragment_mask,
                #       linker_mask, edge_mask, context
                jitted = jax.jit(
                    fn,
                    in_shardings=(rep, rep) + (nsh,) * 5 + (psh, nsh),
                    out_shardings=outs)
            self._compiled[(shape_key, keep_frames)] = jitted
        return self._compiled[(shape_key, keep_frames)]

    # -- main API ----------------------------------------------------------------

    def sample(self, batch: Dict, key, *, size_spec: SizeSpec = 'ground_truth',
               keep_frames: Optional[int] = None,
               recenter_output: bool = False) -> Dict[str, np.ndarray]:
        """Generate linkers for a padded batch of fragment(+pocket) inputs.

        Returns dict with positions (B, N, 3), one_hot (B, N, nf), node_mask,
        linker_mask, num_retries, nan_flag (+ 'chain' if keep_frames).
        """
        ksize, kchain = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
        sizes = resolve_linker_sizes(size_spec, batch, ksize)

        if self.cfg.diffusion.inpainting:
            template = batch  # inpainting keeps the original layout
        else:
            n_nodes = None
            if self.pad_nodes_to is not None:
                needed = (np.asarray(batch['fragment_mask'])[..., 0]
                          .sum(-1).astype(np.int64) + sizes)
                if needed.max() <= self.pad_nodes_to:
                    n_nodes = self.pad_nodes_to
            template = create_templates_for_linker_generation(
                batch, sizes, n_nodes=n_nodes)

        if self.mesh is not None:
            # meshes with node-sharding axes (atoms receivers, senders on the
            # edge mask): zero-pad N to their lcm (masked rows are free)
            from difflinker_tpu.parallel import mesh as mesh_lib
            template = mesh_lib.pad_nodes_to_multiple(
                template, mesh_lib.node_pad_multiple(self.mesh))

        n_real = int(np.asarray(template['positions']).shape[0])
        pad_to = self.pad_batch_to
        if self.mesh is not None:
            # a sharded batch axis must divide the data axis — round the pad
            # target (or the batch itself) up to a device multiple
            from difflinker_tpu.parallel import mesh as mesh_lib
            n_dev = int(self.mesh.shape[mesh_lib.DATA_AXIS])
            pad_to = -(-max(pad_to or 0, n_real) // n_dev) * n_dev
        if pad_to is not None and n_real < pad_to:
            idx = np.resize(np.arange(n_real), pad_to)
            template = {
                k: (v[idx] if isinstance(v, np.ndarray)
                    and v.ndim > 0 and v.shape[0] == n_real
                    else [v[j] for j in idx] if isinstance(v, (list, tuple))
                    and len(v) == n_real else v)
                for k, v in template.items()}

        x = jnp.asarray(template['positions'])
        h = jnp.asarray(template['one_hot'])
        node_mask = jnp.asarray(template['atom_mask'])
        fragment_mask = jnp.asarray(template['fragment_mask'])
        linker_mask = jnp.asarray(template['linker_mask'])
        edge_mask = jnp.asarray(template['edge_mask'])
        jt = {k: jnp.asarray(v) for k, v in template.items()
              if isinstance(v, np.ndarray)}

        context = assemble_context(
            jt, anchors_context=self.cfg.train.anchors_context,
            has_pocket=self.cfg.data.has_pocket)
        com_mask = com_mask_for(
            jt, center_of_mass=self.cfg.train.center_of_mass,
            has_pocket=self.cfg.data.has_pocket,
            inpainting=self.cfg.diffusion.inpainting)

        from difflinker_tpu.ops import geometry
        com = geometry.mean_with_mask(x, com_mask)
        x = x - com * node_mask

        fn = self._chain_fn((x.shape, keep_frames is not None), keep_frames)

        out_x, out_h, chain = None, None, None
        pending = np.ones((x.shape[0],), bool)
        n_retries = 0
        for attempt in range(self.max_retries + 1):
            from difflinker_tpu.parallel import mesh as mesh_lib
            with mesh_lib.sharding_hints(self.mesh):
                # hints apply at trace time (first call per shape): a
                # `senders` mesh axis pins the in-jit pairwise tensors
                res = fn(self.params, kchain, x, h, node_mask, fragment_mask,
                         linker_mask, edge_mask, context)
            if keep_frames is None:
                xs, hs, nan = res
            else:
                xs, hs, nan, ch = res
            nan = np.array(nan)
            nan[n_real:] = False  # padded duplicate rows never force a retry
            xs, hs = np.asarray(xs), np.asarray(hs)
            if out_x is None:
                # copies: jax->numpy views are read-only, retries write in place
                out_x, out_h = np.array(xs), np.array(hs)
                if keep_frames is not None:
                    chain = np.array(ch)
            else:
                take = pending & ~nan
                out_x[take] = xs[take]
                out_h[take] = hs[take]
                if keep_frames is not None:
                    chain[:, take] = np.asarray(ch)[:, take]
            pending = pending & nan
            if not pending.any():
                break
            n_retries += 1
            kchain = jax.random.fold_in(kchain, attempt + 1)

        if recenter_output:
            # un-centre by the (removed) fragment CoM so outputs sit in the
            # input frame (generate.py:167-171)
            out_x = out_x + np.asarray(com) * np.asarray(node_mask)

        result = {
            'positions': out_x[:n_real], 'one_hot': out_h[:n_real],
            'node_mask': np.asarray(node_mask)[:n_real],
            'linker_mask': np.asarray(linker_mask)[:n_real],
            'fragment_mask': np.asarray(fragment_mask)[:n_real],
            'nan_flag': pending[:n_real], 'num_retries': n_retries,
            'linker_sizes': sizes,
        }
        if 'pocket_mask' in template:
            result['pocket_mask'] = np.asarray(template['pocket_mask'])[:n_real]
        if 'uuid' in template:
            result['uuid'] = list(template['uuid'])[:n_real]
        if 'name' in template:
            result['name'] = list(template['name'])[:n_real]
        if keep_frames is not None:
            result['chain'] = chain[:, :n_real]
        return result

    def sample_n(self, batch: Dict, key, n_samples: int, **kw):
        """n independent samplings of the same inputs (sample.py:126-164)."""
        outs = []
        for i in range(n_samples):
            outs.append(self.sample(batch, jax.random.fold_in(key, i), **kw))
        return outs
