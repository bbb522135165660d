"""Device-mesh construction and sharding helpers.

The reference trains single-device (`Trainer(devices=1)`,
train_difflinker.py:102-110); distribution is a new first-class subsystem
here. Design (SURVEY.md §2.7): the atom axis is small (N ≤ ~1000), so scale
comes primarily from **batch data-parallelism** over a 1-D `data` mesh axis.
XLA emits the gradient all-reduce over ICI from the sharding annotations;
DCN is only for multi-host input pipelines and checkpoint IO.

For pocket-scale graphs the live (B, N, N, H) edge activations are the HBM
bottleneck (BASELINE.md: 537 MB at B=1024 ZINC; O(N²·H) growth). A 2-D
`data × atoms` mesh additionally shards every node axis over `atoms`
(**sequence parallelism**): GSPMD keeps the edge tensors row-sharded —
each device holds N/a receiver rows — and inserts per-layer all-gathers of
the (B, N, H) node features (~MBs over ICI). Pure annotation-level: the
dense masked formulation (models/egnn.py) needs no code changes, verified
by tests/test_atom_sharding.py (no full-size edge op survives in the
compiled HLO).

A 3-D `data × atoms × senders` mesh adds **tensor parallelism over the
pairwise graph op**: `senders` shards the SENDER node axis of every
(B, N, N, ·) tensor, so each device holds an (N/a × N/s) edge block and the
edge memory/FLOP split scales as 1/(a·s). Collectives stay node-sized
(O(B·N·H) feature reshards + a psum of the message aggregate). Sender
sharding needs trace-time pinning for in-jit-built pairwise tensors — see
`sharding_hints` / `constrain_pair` below and docs/ARCHITECTURE.md §3;
equality + per-device HLO shapes pinned in tests/test_sender_sharding.py.
"""
from __future__ import annotations

import contextlib
import math
import threading
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
ATOM_AXIS = 'atoms'
SENDER_AXIS = 'senders'
STAGE_AXIS = 'stages'


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = (DATA_AXIS,),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D (or user-shaped) device mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'requested a {n_devices}-device mesh but only '
                f'{len(devices)} device(s) are visible '
                f'({jax.default_backend()} backend); for virtual CPU devices '
                f'set XLA_FLAGS=--xla_force_host_platform_device_count='
                f'{n_devices} before any backend initialises')
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def make_mesh_2d(n_data: int, n_atoms: int) -> Mesh:
    """data × atoms mesh: batch DP over `data`, node axes sharded over
    `atoms` (sequence parallelism for HBM-bound pocket-scale graphs)."""
    return make_mesh(n_data * n_atoms, axes=(DATA_AXIS, ATOM_AXIS),
                     shape=(n_data, n_atoms))


def make_mesh_3d(n_data: int, n_atoms: int, n_senders: int) -> Mesh:
    """data × atoms × senders mesh: DP + 2-D partitioning of the pairwise
    edge work. `atoms` shards the RECEIVER node axis of every (B, N, ...)
    tensor (sequence parallelism); `senders` shards the SENDER node axis of
    the (B, N, N, ·) edge tensors (tensor parallelism over the graph op):
    each device holds an (N/a × N/s) block of every O(N²·H) edge activation.
    Collectives stay O(B·N·H): per-layer gathers of node features plus a
    psum of the message aggregate over `senders` — never an edge-sized
    transfer (tests/test_sender_sharding.py pins both equality and the
    per-device HLO shapes)."""
    return make_mesh(n_data * n_atoms * n_senders,
                     axes=(DATA_AXIS, ATOM_AXIS, SENDER_AXIS),
                     shape=(n_data, n_atoms, n_senders))


def make_mesh_pp(n_data: int, n_stages: int) -> Mesh:
    """data × stages mesh: batch DP over `data`, EGNN blocks partitioned
    over `stages` (pipeline parallelism, parallel/pipeline.py). Of all the
    mesh axes this one has the smallest communication footprint — each
    pipeline tick moves only the node-sized (mb, N, H+3) activation to the
    next stage (point-to-point over ICI; no per-layer feature all-gathers
    like `atoms`/`senders`) — at the cost of an (S-1)/(M+S-1) bubble."""
    return make_mesh(n_data * n_stages, axes=(DATA_AXIS, STAGE_AXIS),
                     shape=(n_data, n_stages))


def atom_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or ATOM_AXIS not in mesh.axis_names:
        return 1
    return int(mesh.shape[ATOM_AXIS])


def sender_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or SENDER_AXIS not in mesh.axis_names:
        return 1
    return int(mesh.shape[SENDER_AXIS])


def stage_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or STAGE_AXIS not in mesh.axis_names:
        return 1
    return int(mesh.shape[STAGE_AXIS])


def node_pad_multiple(mesh: Optional[Mesh]) -> int:
    """The node axis must divide BOTH node-sharding axes: receivers shard
    over `atoms`, and the sender axis of (B, N, N, ·) edge tensors (same N)
    over `senders`. Pad N to lcm(atoms, senders)."""
    return math.lcm(atom_axis_size(mesh), sender_axis_size(mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def node_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, ...) tensors: batch over `data`, node axis over `atoms` when
    the mesh has one (a (B, N, N, ·) edge tensor gets its RECEIVER axis
    sharded; the sender axis stays replicated — GSPMD propagates that to
    every O(N²) intermediate)."""
    if atom_axis_size(mesh) > 1:
        return NamedSharding(mesh, P(DATA_AXIS, ATOM_AXIS))
    return batch_sharding(mesh)


def pair_sharding(mesh: Mesh, n_lead: int = 0) -> NamedSharding:
    """(B, N, N, ·) pairwise tensors: batch over `data`, receiver axis over
    `atoms`, sender axis over `senders` (each only when the mesh has it)."""
    spec = (None,) * n_lead + (DATA_AXIS,)
    spec = spec + ((ATOM_AXIS,) if atom_axis_size(mesh) > 1 else (None,))
    if sender_axis_size(mesh) > 1:
        spec = spec + (SENDER_AXIS,)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- trace-time sharding hints ----------------------------------------------
#
# Receiver-axis (atoms) sharding is pure annotation-level: GSPMD propagates it
# from the INPUT shardings because every (B, N, N, ·) tensor inherits the
# receiver sharding of the (B, N, ·) node tensors it is built from. The sender
# axis has no such anchor for distance-graph models (their edge masks are
# built in-jit from coordinates), and propagation alone may resolve the
# receiver/sender conflict on the node tensors by all-gathering an edge-sized
# intermediate. `sharding_hints` makes the intent explicit: while a mesh with
# a >1 `senders` axis is active, `constrain_pair` pins every freshly built
# (B, N, N, ·) tensor to pair_sharding. With no hints (or no senders axis) it
# is a no-op, so single-device / DP / DP×SP programs are byte-identical to
# before.

_HINTS = threading.local()


@contextlib.contextmanager
def sharding_hints(mesh: Optional[Mesh]):
    prev = getattr(_HINTS, 'mesh', None)
    _HINTS.mesh = mesh
    try:
        yield
    finally:
        _HINTS.mesh = prev


def hints_mesh() -> Optional[Mesh]:
    """The mesh of the innermost active `sharding_hints` context (None when
    no hints are active). The pipeline layout (parallel/pipeline.py) reads
    this at trace time to route the dense EGNN through the `stages` axis."""
    return getattr(_HINTS, 'mesh', None)


def constrain_pair(x, n_lead: int = 0):
    """Constrain a (B, N_recv, N_send, F) pairwise tensor to the active hints
    mesh's pair sharding (no-op without an active senders>1 hints mesh)."""
    mesh = getattr(_HINTS, 'mesh', None)
    if mesh is None or sender_axis_size(mesh) <= 1:
        return x
    if getattr(x, 'ndim', 0) != n_lead + 4:
        return x
    return jax.lax.with_sharding_constraint(x, pair_sharding(mesh, n_lead))


# tensors carrying a SECOND node axis ((..., N, N, ·) pairwise layout);
# all other arrays are (..., N, features) and only pad/shard their first
# node axis — a feature axis that coincidentally equals N (e.g. one_hot
# with nf == N) must never be touched
_EDGE_PAIR_KEYS = frozenset({'edge_mask'})


def pad_nodes_to_multiple(batch: dict, multiple: int, n_lead: int = 0,
                          min_nodes: int = 0) -> dict:
    """Zero-pad the node axes in a padded-batch/template dict up to a
    `multiple` so they divide an `atoms` mesh axis. Padded rows carry
    node_mask 0 (and edge_mask 0), which the dense masked formulation
    ignores by construction — numerics-exact for aggregation_method='sum'
    (every shipped recipe); a 'mean' FC model's static per-node count would
    shift, as with any node padding. The node axis is axis n_lead+1
    (N = positions.shape[n_lead+1]); only _EDGE_PAIR_KEYS additionally pad
    axis n_lead+2. `n_lead` skips unsharded leading dims (1 for stacked
    (S, B, ...)). `min_nodes` raises the floor before rounding (multi-host
    callers pass the cross-host max so every process pads to one shape).

    Padding materialises arrays host-side, so inputs must be process-local
    (ndarrays / single-host jax arrays); the shape probe itself never
    materialises, so already-conforming globally-sharded batches pass
    through untouched."""
    if multiple <= 1 and min_nodes <= 0:
        return batch
    n = int(np.shape(batch['positions'])[n_lead + 1])
    target = max(n, min_nodes)
    if multiple > 1:
        target = -(-target // multiple) * multiple
    if target == n:
        return batch
    ax = n_lead + 1
    out = {}
    for k, v in batch.items():
        if (hasattr(v, 'ndim') and getattr(v, 'ndim', 0) >= ax + 1
                and np.shape(v)[ax] == n):
            v = np.asarray(v)
            pads = [(0, 0)] * v.ndim
            pads[ax] = (0, target - n)
            if (k in _EDGE_PAIR_KEYS and v.ndim >= ax + 2
                    and v.shape[ax + 1] == n):
                pads[ax + 1] = (0, target - n)
            out[k] = np.pad(v, pads)
        else:
            out[k] = v
    return out


def batch_shardings(mesh: Mesh, batch: dict, n_lead: int = 0) -> dict:
    """Per-key NamedShardings for a batch pytree: leading batch dim over
    `data`, node axes (length == positions' N) over `atoms` when the mesh
    has one. `n_lead` unsharded leading dims (1 for stacked (S, B, ...)
    epoch tensors). Non-arrays map to None (replicated by jit)."""
    lead = (None,) * n_lead
    atoms = atom_axis_size(mesh) > 1
    senders = sender_axis_size(mesh) > 1
    # shape only — never materialise (multi-host globally-sharded arrays
    # cannot be converted to a host ndarray)
    n = (int(np.shape(batch['positions'])[n_lead + 1])
         if (atoms or senders) and 'positions' in batch else -1)
    out = {}
    for k, v in batch.items():
        if not (hasattr(v, 'ndim') and getattr(v, 'ndim', 0) >= n_lead + 1):
            out[k] = None
            continue
        spec = lead + (DATA_AXIS,)
        if ((atoms or senders) and v.ndim >= n_lead + 2
                and v.shape[n_lead + 1] == n):
            if n % node_pad_multiple(mesh) != 0:
                raise ValueError(
                    f'node axis {n} of {k!r} does not divide the node mesh '
                    f'axes (atoms={atom_axis_size(mesh)}, '
                    f'senders={sender_axis_size(mesh)}); pad with '
                    'pad_nodes_to_multiple (LinkerSampler does this '
                    'automatically; trainers should pick bucket/pad-nodes '
                    'sizes divisible by node_pad_multiple(mesh))')
            spec = lead + (DATA_AXIS,) + ((ATOM_AXIS,) if atoms else (None,))
            if (senders and k in _EDGE_PAIR_KEYS
                    and v.ndim >= n_lead + 3 and v.shape[n_lead + 2] == n):
                spec = spec + (SENDER_AXIS,)
        out[k] = NamedSharding(mesh, P(*spec))
    return out


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place every array in a batch dict with its leading dim sharded over
    `data` (and node axes over `atoms` on a 2-D mesh). Non-array entries
    pass through."""
    shs = batch_shardings(mesh, batch)
    out = {}
    for k, v in batch.items():
        if shs.get(k) is not None:
            out[k] = jax.device_put(np.asarray(v), shs[k])
        else:
            out[k] = v
    return out


def replicate_params(mesh: Mesh, params):
    rep = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, rep), params)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, \
        f'global batch {global_batch} not divisible by data axis {n}'
    return global_batch // n
