"""Production sampling service: dynamic request batching over warm chains.

The reference's inference story is one-shot CLIs (generate.py builds a batch,
samples, exits) — fine for a workstation, wrong for serving: on TPU each
(B, N) chain shape costs a full XLA compile (plus a multi-minute program
load through tunneled backends), so per-request dispatch either recompiles
constantly or wastes the chip between requests. This module is the
deployment subsystem the TPU rebuild adds on top of
`sample.sampler.LinkerSampler`:

  * **Warm compiled chains.** One LinkerSampler per node bucket, each pinned
    to a single (pad_batch_to, pad_nodes_to) shape — the whole service runs
    a small fixed set of XLA programs, compiled once, reused forever.
  * **Dynamic batching.** Requests accumulate for up to `max_wait_s` after
    the first arrival (or until `batch_size` rows), then run as ONE chain
    call per node bucket; the sampler wrap-pads the remainder. Classic
    batching-window serving: latency bounded by max_wait_s + one chain,
    throughput approaching the offline batch rate under load.
  * **Hot weight swap.** `update_params` enqueues the swap in request order
    and reuses every compiled chain (params are jit arguments) — a training
    loop can serve from its latest checkpoint with zero recompiles.
  * **Row-exact routing.** Each request's rows come back by position from
    the batched output; tests pin that fragment coordinates round-trip
    exactly per request (recenter_output leaves fragments in the input
    frame), so co-batched requests can never leak rows into each other.

A request is a raw per-molecule sample dict (the `data.collate.collate`
unit: positions/one_hot/charges/fragment_mask/linker_mask/anchors, as built
by cli.generate.fragment_sample_dict or `sample_from_file` below),
replicated `n_samples` times with linker sizes resolved per request
(`sample.sampler.resolve_linker_sizes` polymorphism: int, range, 'prior',
'ground_truth', or a trained size predictor).
"""
from __future__ import annotations

import collections
import itertools
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from difflinker_tpu.config import ExperimentConfig
from difflinker_tpu.data.collate import collate
from difflinker_tpu.sample.sampler import (LinkerSampler, SizeSpec,
                                           resolve_linker_sizes)


def sample_from_file(path: str, *, is_geom: bool = False,
                     anchors: Optional[Sequence[int]] = None) -> Dict:
    """Raw sample dict from a fragment file (sdf/mol/xyz), CoM-centred —
    the standalone twin of cli.generate.fragment_sample_dict
    (generate.py:101-135 reading protocol). `anchors` are 1-based."""
    import os
    from difflinker_tpu.chem.io_rdkit import parse_molecule, read_molecule
    mol = read_molecule(path)
    positions, one_hot, charges = parse_molecule(mol, is_geom=is_geom)
    positions = positions - positions.mean(0, keepdims=True)
    n = len(charges)
    anchor_flags = np.zeros(n, np.float32)
    for a in anchors or ():
        anchor_flags[int(a) - 1] = 1
    return {
        'uuid': 0, 'name': os.path.splitext(os.path.basename(path))[0],
        'positions': positions.astype(np.float32),
        'one_hot': one_hot.astype(np.float32),
        'charges': charges.astype(np.float32),
        'anchors': anchor_flags,
        'fragment_mask': np.ones(n, np.float32),
        'linker_mask': np.zeros(n, np.float32),
        'num_atoms': n,
    }


def pocket_sample_from_files(fragments: str, *, pocket: Optional[str] = None,
                             protein: Optional[str] = None,
                             backbone: bool = False,
                             anchors: Optional[Sequence[int]] = None,
                             is_geom: bool = True):
    """Raw pocket-conditioned sample dict from a fragment file plus either a
    pre-cut pocket PDB (`pocket`) or a full protein PDB (`protein`, pocket
    extracted as the 6Å-contact residues — generate_with_protein.py:85-147).

    Returns `(sample, center)`: the sample is CoM-centred on the fragments
    ([fragment | pocket] row order, MOAD mask convention); `center` (1, 3)
    restores outputs to the protein frame. `anchors` are 1-based fragment
    atom indices."""
    import os
    from difflinker_tpu.chem.io_rdkit import parse_molecule, read_molecule
    from difflinker_tpu.chem.pdb import extract_pocket, read_pocket_pdb
    if (pocket is None) == (protein is None):
        raise ValueError('pass exactly one of pocket= (pre-cut PDB) or '
                         'protein= (full PDB, 6Å extraction)')
    mol = read_molecule(fragments)
    frag_pos, frag_oh, frag_q = parse_molecule(mol, is_geom=is_geom)
    if pocket is not None:
        pk_pos, pk_oh, pk_q = read_pocket_pdb(pocket, backbone)
    else:
        pk_pos, pk_oh, pk_q = extract_pocket(frag_pos, protein, backbone)

    positions = np.concatenate([frag_pos, pk_pos], axis=0)
    center = frag_pos.mean(0, keepdims=True)
    positions = positions - center
    one_hot = np.concatenate([frag_oh, pk_oh], axis=0)
    charges = np.concatenate([frag_q, pk_q], axis=0)
    n_frag, n = len(frag_q), len(charges)

    anchor_flags = np.zeros(n, np.float32)
    for a in anchors or ():
        anchor_flags[int(a) - 1] = 1

    def seg(lo, hi):
        m = np.zeros(n, np.float32)
        m[lo:hi] = 1
        return m

    sample = {
        'uuid': 0,
        'name': os.path.splitext(os.path.basename(fragments))[0],
        'positions': positions.astype(np.float32),
        'one_hot': one_hot.astype(np.float32),
        'charges': charges.astype(np.float32),
        'anchors': anchor_flags,
        'fragment_only_mask': seg(0, n_frag),
        'pocket_mask': seg(n_frag, n),
        'fragment_mask': seg(0, n),
        'linker_mask': np.zeros(n, np.float32),
        'num_atoms': n,
    }
    return sample, center


@dataclass
class _Request:
    samples: List[Dict]          # n_samples copies of the raw sample dict
    sizes: np.ndarray            # (n_samples,) resolved linker sizes
    bucket: int                  # node bucket this request routes to
    recenter: bool
    # (steps, sampler, noise_scale) chain override
    variant: tuple = (None, None, None)
    t_submit: float = 0.0        # monotonic submit time (latency stats)
    future: Future = field(default_factory=Future)


_STOP = object()


class SamplingService:
    """Threaded batching front-end over per-bucket LinkerSamplers.

    Args:
      cfg/params: as LinkerSampler.
      batch_size: rows per chain call (the compiled batch shape; smaller
        waves wrap-pad up to it).
      max_wait_s: batching window measured from the first queued request.
      node_buckets: padded node sizes; each gets its own warm sampler.
        Requests needing more nodes than the largest bucket route to an
        overflow sampler with natural (per-batch) shapes.
      mesh: optional device mesh, forwarded to every sampler (DP/SP/TP/PP
        all compose with serving — the chain is the same jitted program).
      seed: service-level PRNG root. Per-request size draws fold the submit
        counter, so they replay for a given (seed, submission order); chain
        noise additionally folds the batch counter and a request's row
        placement within its wave, so generated coordinates depend on
        arrival timing (how requests co-batched) — exact replay needs the
        same batching, e.g. a single client submitting the same waves.
    """

    def __init__(self, cfg: ExperimentConfig, params, *, batch_size: int = 32,
                 max_wait_s: float = 0.05,
                 node_buckets: Sequence[int] = (32, 64, 128), mesh=None,
                 seed: int = 0, max_retries: int = 5):
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_s)
        self.node_buckets = tuple(sorted(int(b) for b in node_buckets))
        self._mesh = mesh
        self._max_retries = max_retries
        self._params = params
        # samplers keyed (bucket, variant); bucket 0 = overflow (natural
        # per-batch shapes), variant (None, None, None) = the service defaults.
        # Default-variant samplers are built eagerly; per-request
        # steps/sampler variants compile lazily on their first request and
        # stay warm after (each distinct chain length IS a distinct XLA
        # program — that cost is physics, paid once per variant+bucket).
        _default = (None, None, None)
        self._samplers: Dict[tuple, LinkerSampler] = {
            (b, _default): LinkerSampler(
                cfg, params, mesh=mesh, max_retries=max_retries,
                pad_batch_to=self.batch_size, pad_nodes_to=b)
            for b in self.node_buckets}
        self._samplers[(0, _default)] = LinkerSampler(
            cfg, params, mesh=mesh, max_retries=max_retries,
            pad_batch_to=self.batch_size)
        self._queue: queue.Queue = queue.Queue()
        self._key = jax.random.PRNGKey(seed)
        self._submit_counter = itertools.count()
        self._batch_counter = itertools.count()
        # LRU order over lazily built variant samplers (see _sampler_for)
        self._variant_order: 'collections.OrderedDict' = \
            collections.OrderedDict()
        self.stats = {'requests': 0, 'rows': 0, 'batches': 0,
                      'padded_rows': 0, 'chain_seconds': 0.0}
        # submit -> result, per request; bounded (a rolling window) so a
        # long-lived serve process doesn't grow a float per request forever
        self.latencies_s: 'collections.deque[float]' = collections.deque(
            maxlen=50_000)
        self._closed = False
        # serializes the closed-check-plus-enqueue against close(): without
        # it a submit that passes the check just before close() flips the
        # flag can enqueue after the final _fail_drained(), leaving its
        # Future unresolved forever (the worker has already exited)
        self._close_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name='sampling-service')
        self._worker.start()

    # -- client API -----------------------------------------------------------

    def submit(self, sample: Dict, *, n_samples: int = 1,
               size_spec: SizeSpec = 'prior',
               recenter_output: bool = True,
               steps: Optional[int] = None,
               sampler: Optional[str] = None,
               noise_scale: Optional[float] = None) -> Future:
        """Queue one fragment set for linker generation; returns a Future
        resolving to the request's slice of the sampler output dict
        (positions/one_hot/node_mask/linker_mask/fragment_mask/nan_flag,
        leading dim n_samples).

        `steps` / `sampler` / `noise_scale` override the chain per request
        (the fast lane: e.g. steps=50 respaced with noise_scale=0.5 — the
        measured best operating point, BASELINE.md round 5 — or
        sampler='ddim' for a deterministic chain; exact-subsequence
        semantics on the service model's trained grid, config.respace_config).
        Requests sharing a (steps, sampler, noise_scale) variant co-batch
        together; a variant's first request pays its chain compile, then
        it's warm."""
        if self._closed or not self._worker.is_alive():
            raise RuntimeError('service is closed')
        if steps is not None and int(steps) <= 0:
            raise ValueError(f'steps must be positive, got {steps}')
        if sampler is not None and sampler not in ('ancestral', 'ddim'):
            raise ValueError(f"sampler must be 'ancestral' or 'ddim', "
                             f'got {sampler!r}')
        if noise_scale is not None:
            noise_scale = float(noise_scale)
            if not 0.0 < noise_scale:
                raise ValueError(
                    f'noise_scale must be positive, got {noise_scale}')
            eff_sampler = sampler or self.cfg.diffusion.sampler
            if eff_sampler == 'ddim' and noise_scale != 1.0:
                # fail in the caller: the eta=0 integrator has no noise to
                # scale, so the knob would be silently ignored
                raise ValueError(
                    'noise_scale has no effect under the ddim sampler '
                    '(eta=0); drop it or use the ancestral sampler')
        # normalize no-op overrides onto the default variant so they reuse
        # the eagerly compiled programs instead of duplicating them
        if sampler == self.cfg.diffusion.sampler:
            sampler = None
        if steps is not None and int(steps) == self.cfg.diffusion.timesteps:
            steps = None  # respacing at T'=T is exact (bitwise the schedule)
        if (noise_scale is not None
                and noise_scale == self.cfg.diffusion.noise_scale):
            noise_scale = None
        variant = (int(steps) if steps is not None else None, sampler,
                   noise_scale)
        if int(n_samples) > self.batch_size:
            raise ValueError(
                f'n_samples={n_samples} exceeds batch_size={self.batch_size} '
                f'(one request must fit one chain call — split it, or raise '
                f'batch_size)')
        nf = int(np.asarray(sample['one_hot']).shape[-1])
        if nf != self.cfg.model.in_node_nf:
            # fail in the caller, not as an XLA broadcast error in the worker
            raise ValueError(
                f'atom-type vocab mismatch: model expects '
                f'{self.cfg.model.in_node_nf} one-hot channels, request has '
                f'{nf} (ZINC vocab is 8 channels, GEOM is 9)')
        i = next(self._submit_counter)
        key = jax.random.fold_in(self._key, i)
        samples = [dict(sample) for _ in range(int(n_samples))]
        # sizes resolve on a collated view so 'ground_truth'/predictor specs
        # see the same (B, N, ·) layout the samplers do
        mini = collate(samples)
        sizes = resolve_linker_sizes(size_spec, mini, key)
        if self.cfg.diffusion.inpainting:
            needed = int(np.asarray(sample['positions']).shape[0])
        else:
            n_frag = int(np.asarray(sample['fragment_mask']).sum())
            needed = n_frag + int(sizes.max())
        bucket = next((b for b in self.node_buckets if needed <= b), 0)
        req = _Request(samples=samples, sizes=sizes, bucket=bucket,
                       recenter=recenter_output, variant=variant,
                       t_submit=time.monotonic())
        with self._close_lock:
            if self._closed:
                raise RuntimeError('service is closed')
            self._queue.put(req)
        return req.future

    def generate(self, sample: Dict, **kw) -> Dict[str, np.ndarray]:
        """Blocking convenience wrapper around submit()."""
        return self.submit(sample, **kw).result()

    def update_params(self, params):
        """Swap weights between batches, in request order (compiled chains
        are reused — params are jit arguments)."""
        if self._closed or not self._worker.is_alive():
            # without this the swap item sits in a dead queue and the
            # returned Future hangs forever (close() has already drained)
            raise RuntimeError('service is closed')
        done = Future()
        with self._close_lock:
            if self._closed:
                raise RuntimeError('service is closed')
            self._queue.put(('params', params, done))
        return done

    def close(self):
        with self._close_lock:
            self._closed = True
            self._queue.put(_STOP)
        self._worker.join()
        self._fail_drained()  # anything that raced ahead of _STOP is served

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker ---------------------------------------------------------------

    def _run(self):
        carried = None  # request deferred because it didn't fit the wave
        while True:
            item = carried if carried is not None else self._queue.get()
            carried = None
            if item is _STOP:
                self._fail_drained()
                return
            if isinstance(item, tuple) and item[0] == 'params':
                self._apply_params(item[1], item[2])
                continue
            wave = [item]
            rows = len(item.samples)
            deadline = time.monotonic() + self.max_wait_s
            while rows < self.batch_size:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is _STOP:
                    self._flush(wave)
                    self._fail_drained()
                    return
                if isinstance(nxt, tuple) and nxt[0] == 'params':
                    # honour ordering: finish the wave, then swap
                    self._flush(wave)
                    self._apply_params(nxt[1], nxt[2])
                    wave, rows = [], 0
                    deadline = time.monotonic() + self.max_wait_s
                    continue
                if rows + len(nxt.samples) > self.batch_size:
                    # never overshoot the compiled batch shape — a ragged
                    # (B > batch_size) wave would compile a fresh program;
                    # this request seeds the next wave instead
                    carried = nxt
                    break
                wave.append(nxt)
                rows += len(nxt.samples)
            if wave:
                self._flush(wave)

    def _fail_drained(self):
        """Fail anything still queued at shutdown so no Future ever hangs."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is _STOP:
                continue
            fut = (item[2] if isinstance(item, tuple) and item[0] == 'params'
                   else item.future)
            if not fut.done():
                fut.set_exception(RuntimeError('service closed'))

    def _apply_params(self, params, done: Future):
        try:
            self._params = params  # lazily built variants pick these up
            for s in self._samplers.values():
                s.update_params(params)
            done.set_result(True)
        except Exception as e:  # pragma: no cover - defensive
            done.set_exception(e)

    def latency_percentiles(self) -> Dict[str, float]:
        """p50/p95/p99/mean request latency (submit -> result, seconds)."""
        lat = np.asarray(self.latencies_s, np.float64)
        if lat.size == 0:
            return {'count': 0}
        return {'count': int(lat.size),
                'p50_s': round(float(np.percentile(lat, 50)), 4),
                'p95_s': round(float(np.percentile(lat, 95)), 4),
                'p99_s': round(float(np.percentile(lat, 99)), 4),
                'mean_s': round(float(lat.mean()), 4)}

    def _variant_config(self, variant: tuple) -> ExperimentConfig:
        import dataclasses
        from difflinker_tpu.config import respace_config
        steps, sampler, noise_scale = variant
        cfg = respace_config(self.cfg, steps)  # exact-subsequence semantics
        if sampler is not None:
            cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
                cfg.diffusion, sampler=sampler))
        if noise_scale is not None:
            cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
                cfg.diffusion, noise_scale=noise_scale))
        return cfg

    # lazily built per-request-variant samplers kept warm at once; least
    # recently used beyond this is dropped (it rebuilds — and recompiles —
    # on its next request). Bounds what an adversarial/per-request-varying
    # client can pin: without it every distinct (steps, sampler,
    # noise_scale) holds a compiled chain for the process lifetime.
    max_variant_samplers = 8

    def _sampler_for(self, bucket: int, variant: tuple) -> LinkerSampler:
        key = (bucket, variant)
        s = self._samplers.get(key)
        if s is not None:
            if key in self._variant_order:
                self._variant_order.move_to_end(key)
            return s
        # first request of this variant: build (compiles lazily)
        s = LinkerSampler(self._variant_config(variant), self._params,
                          mesh=self._mesh, max_retries=self._max_retries,
                          pad_batch_to=self.batch_size,
                          pad_nodes_to=bucket or None)
        self._samplers[key] = s
        self._variant_order[key] = True
        if len(self._variant_order) > self.max_variant_samplers:
            oldest, _ = self._variant_order.popitem(last=False)
            del self._samplers[oldest]
        return s

    def _flush(self, wave: List[_Request]):
        groups: Dict[tuple, List[_Request]] = {}
        for req in wave:
            groups.setdefault((req.bucket, req.recenter, req.variant),
                              []).append(req)
        for (bucket, _, variant), reqs in groups.items():
            self._run_bucket(bucket, reqs, variant)

    def _run_bucket(self, bucket: int, reqs: List[_Request],
                    variant: tuple = (None, None, None)):
        sampler = self._sampler_for(bucket if bucket in self.node_buckets
                                    else 0, variant)
        try:
            samples = [s for r in reqs for s in r.samples]
            sizes = np.concatenate([r.sizes for r in reqs])
            # collate straight to the bucket's node count: for inpainting
            # cfgs the template IS the batch (sampler pad_nodes_to never
            # applies), so this is what keeps those chains one warm shape
            batch = collate(samples, n_nodes=bucket or None)
            # distinct key stream from the submit-counter folds (salted)
            key = jax.random.fold_in(
                jax.random.fold_in(self._key, 0x5e41ce),
                next(self._batch_counter))
            t0 = time.monotonic()
            out = sampler.sample(
                batch, key, size_spec=lambda _b: sizes,
                recenter_output=reqs[0].recenter)
            self.stats['chain_seconds'] += time.monotonic() - t0
            self.stats['batches'] += 1
            self.stats['requests'] += len(reqs)
            self.stats['rows'] += len(samples)
            self.stats['padded_rows'] += max(
                0, (sampler.pad_batch_to or 0) - len(samples))
            off = 0
            for r in reqs:
                n = len(r.samples)
                sl = {}
                for k, v in out.items():
                    if k == 'num_retries':
                        continue
                    if (isinstance(v, np.ndarray) and v.ndim > 0
                            and v.shape[0] == len(samples)):
                        sl[k] = v[off:off + n]
                    elif isinstance(v, list) and len(v) == len(samples):
                        sl[k] = v[off:off + n]
                    else:
                        sl[k] = v
                sl['linker_sizes'] = r.sizes
                r.future.set_result(sl)
                if r.t_submit:
                    self.latencies_s.append(time.monotonic() - r.t_submit)
                off += n
        except Exception as e:
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)
