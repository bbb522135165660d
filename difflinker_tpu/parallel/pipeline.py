"""Pipeline parallelism over EGNN blocks (GPipe-style, `stages` mesh axis).

The fourth parallelism axis, completing DP (`data`), sequence parallelism
(`atoms`) and tensor parallelism over the pairwise graph op (`senders`).
The reference trains single-device (train_difflinker.py:102-110); its EGNN
stacks n_layers identical EquivariantBlocks sequentially (src/egnn.py:181-238)
— exactly the structure pipeline parallelism partitions: stage s of S holds
blocks [s·L/S, (s+1)·L/S) and microbatches flow stage→stage.

Why this axis exists when SP/TP already shard the edge work: the pipeline
moves only the NODE-sized activation (mb, N, H+3) between neighbouring
devices once per tick — point-to-point over ICI, no per-layer feature
all-gathers and no edge-sized traffic at all — so it has the smallest
communication footprint of every axis here. The price is the classic bubble:
(S-1)/(M+S-1) of device time idles with M microbatches. Use it when DP is
exhausted (global batch too small to split further) and the SP/TP collectives
dominate the step; compose it with `data` for the general case.

Mechanics (one `shard_map` over the mesh, differentiable end-to-end):

  * block params are stacked along a leading layer axis and sharded over
    `stages` (`in_specs=P('stages')`) — each device traces only its L/S
    blocks;
  * the local batch is split into M microbatches; inputs (microbatched
    features, coords, masks) are REPLICATED over `stages`, so per-stage mask
    lookup is a local `dynamic_index` — only the evolving (h, x) pair rides
    `ppermute`;
  * a `lax.scan` over M+S-1 ticks: at tick t, stage s computes microbatch
    t-s (clipped; out-of-range ticks are bubble work on zeros whose outputs
    are discarded by `where` masks, the standard static-shape formulation);
  * stage 0 ingests microbatch t from the replicated input, stage S-1 writes
    its result into an output buffer; a final `psum` over `stages` publishes
    the buffer (only the last stage's contribution is non-zero);
  * embedding / embedding_out are node-wise (B·N, H) matmuls, tiny next to
    the O(N²·H) edge work — they run outside the pipeline, replicated.

Numerics are identical to `egnn_apply` (same `block_apply` per microbatch;
no cross-sample op exists in this path), pinned by
tests/test_pipeline_parallel.py for forward, gradients, the full train step
and the reverse sampling chain. jax.grad differentiates straight through the
shard_map: `ppermute` transposes to the reverse permutation, so gradients
flow backward through the pipe in reverse stage order — exactly GPipe's
backward schedule, derived rather than hand-written.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from difflinker_tpu.models.egnn import block_apply
from difflinker_tpu.models.layers import (activation_fn, linear,
                                          sinusoidal_distance_embedding)
from difflinker_tpu.ops.geometry import coord2diff
from difflinker_tpu.parallel.mesh import (DATA_AXIS, STAGE_AXIS, hints_mesh,
                                          stage_axis_size)


def active_pp_mesh():
    """The active hints mesh iff it carries a >1 `stages` axis (else None)."""
    mesh = hints_mesh()
    if mesh is not None and stage_axis_size(mesh) > 1:
        return mesh
    return None


def stack_blocks(blocks):
    """Stack a list of identically-shaped block pytrees along a new leading
    layer axis (the axis `in_specs=P('stages')` shards)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def egnn_apply_pp(p, h, x, node_mask, linker_mask, edge_mask, *, cfg, mesh,
                  n_microbatches: Optional[int] = None, remat: bool = True,
                  mean_count_static: bool = True):
    """`egnn_apply` partitioned over the mesh's `stages` axis.

    Same signature/semantics as models/egnn.egnn_apply on the dense masked
    layout (edge_mask required — FC from the collate or an in-jit distance
    mask). n_microbatches defaults to the stage count and clamps to the
    largest divisor of the local (per data-shard) batch, so ragged batches
    degrade to a bigger bubble rather than an error.
    """
    n_stages = stage_axis_size(mesh)
    n_layers = len(p['blocks'])
    if n_layers % n_stages != 0:
        raise ValueError(
            f'the stages mesh axis ({n_stages}) must divide n_layers '
            f'({n_layers}) so every stage holds the same number of blocks; '
            f'pick a stage count from the divisors of n_layers')
    layers_per_stage = n_layers // n_stages
    if edge_mask is None:
        raise ValueError('the pipeline layout needs a dense edge mask '
                         '(FC collate mask or ops/geometry.distance_edge_mask)')
    if node_mask is None:
        raise ValueError('the pipeline layout needs a node mask')
    if linker_mask is None:
        # ones == no coordinate gating (block_apply treats None the same way)
        linker_mask = jnp.ones_like(node_mask)

    act = activation_fn(cfg.activation)
    compute_dtype = jnp.dtype(cfg.dtype)
    if compute_dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
        h = h.astype(compute_dtype)
    x = x.astype(jnp.float32)  # geometry stays fp32 regardless of cfg.dtype

    n_data = (int(mesh.shape[DATA_AXIS])
              if DATA_AXIS in mesh.axis_names else 1)
    batch = h.shape[0]
    if batch % n_data:
        raise ValueError(
            f'batch {batch} must split over the data axis ({n_data}); '
            f'trainers wrap-pad ragged batches to a device multiple')
    # microbatch count clamps to the largest divisor of the LOCAL batch —
    # ragged eval batches (local batch 1) still pipeline correctly, just
    # with a full (S-1)/S bubble instead of an error
    n_micro = int(n_microbatches) if n_microbatches else n_stages
    n_micro = min(n_micro, batch // n_data)
    while (batch // n_data) % n_micro:
        n_micro -= 1

    h = linear(p['embedding'], h)
    stacked = stack_blocks(p['blocks'])
    bspec = P(DATA_AXIS) if DATA_AXIS in mesh.axis_names else P()

    def body(blocks_s, h_all, x_all, nm_all, lm_all, em_all):
        # local views: blocks_s leaves lead with layers_per_stage;
        # batch-likes lead with the local batch — split into microbatches
        sid = jax.lax.axis_index(STAGE_AXIS)

        def mb(a):
            return a.reshape((n_micro, a.shape[0] // n_micro) + a.shape[1:])
        h_all, x_all = mb(h_all), mb(x_all)
        nm_all, lm_all, em_all = mb(nm_all), mb(lm_all), mb(em_all)

        def stage_blocks(h_c, x_c, d0, nm, lm, em):
            def run_block(bp, h_, x_):
                return block_apply(bp, h_, x_, d0, nm, lm, em, cfg=cfg,
                                   act=act,
                                   mean_count_static=mean_count_static)
            fn = jax.checkpoint(run_block) if remat else run_block
            for i in range(layers_per_stage):
                bp = jax.tree.map(lambda a: a[i], blocks_s)
                h_c, x_c = fn(bp, h_c, x_c)
            return h_c, x_c

        def tick(carry, t):
            h_c, x_c, out_h, out_x = carry
            # stage s works on microbatch t-s (clipped ⇒ bubble ticks redo a
            # boundary microbatch; their outputs never reach the buffers)
            k = jnp.clip(t - sid, 0, n_micro - 1)

            def take(a):
                return jax.lax.dynamic_index_in_dim(a, k, 0, keepdims=False)
            nm, lm, em = take(nm_all), take(lm_all), take(em_all)
            first = sid == 0
            h_c = jnp.where(first, take(h_all), h_c)
            x_c = jnp.where(first, take(x_all), x_c)
            # initial-distance feature from the microbatch's INPUT coords
            # (egnn_apply computes dist0 once before the blocks); recomputing
            # the cheap O(N²) op per stage beats shipping an edge-sized
            # tensor through the pipe
            d2_0, _ = coord2diff(take(x_all))
            d0 = (sinusoidal_distance_embedding(d2_0)
                  if cfg.sin_embedding else d2_0)
            h_n, x_n = stage_blocks(h_c, x_c, d0, nm, lm, em)
            # last stage commits finished microbatch t-(S-1)
            w = t - (n_stages - 1)
            wc = jnp.clip(w, 0, n_micro - 1)
            # w < n_micro always holds (t ends at M+S-2) — kept explicit so
            # bubble recomputes provably never overwrite a committed result
            valid = (w >= 0) & (w < n_micro) & (sid == n_stages - 1)

            def commit(buf, val):
                keep = jax.lax.dynamic_index_in_dim(buf, wc, 0,
                                                    keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(valid, val, keep), wc, 0)
            out_h = commit(out_h, h_n)
            out_x = commit(out_x, x_n)
            # hand (h, x) to the next stage; the S-1 → 0 wraparound is
            # overwritten by stage 0's ingestion on the next tick
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            h_c = jax.lax.ppermute(h_n, STAGE_AXIS, perm)
            x_c = jax.lax.ppermute(x_n, STAGE_AXIS, perm)
            return (h_c, x_c, out_h, out_x), None

        init = (jnp.zeros(h_all.shape[1:], h_all.dtype),
                jnp.zeros(x_all.shape[1:], x_all.dtype),
                jnp.zeros_like(h_all), jnp.zeros_like(x_all))
        (_, _, out_h, out_x), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + n_stages - 1))
        # publish the last stage's buffers (every other stage holds zeros)
        out_h = jax.lax.psum(out_h, STAGE_AXIS)
        out_x = jax.lax.psum(out_x, STAGE_AXIS)

        def unmb(a):
            return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
        return unmb(out_h), unmb(out_x)

    h_out, x_out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(STAGE_AXIS), bspec, bspec, bspec, bspec, bspec),
        out_specs=(bspec, bspec), check_vma=False,
    )(stacked, h, x, node_mask, linker_mask, edge_mask)

    h_out = linear(p['embedding_out'], h_out)
    h_out = h_out * node_mask.astype(h_out.dtype)
    return h_out.astype(jnp.float32), x_out
