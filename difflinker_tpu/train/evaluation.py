"""Sampling-based evaluation during/after training.

Port of DDPM.sample_and_analyze (src/lightning.py:322-403): sample
n_stability_samples linkers per val input, build molecules geometrically, and
aggregate our metrics + the DeLinker battery.

Host-device overlap: the reference runs sampling and chemistry strictly
serially (its eval loop alternates GPU chains with RDKit work,
src/lightning.py:322-403), which at TPU sampling throughput leaves the chip
idle during chemistry and the host idle during chains (SURVEY.md §7 hard
part 7). Here the per-result chemistry (geometric molecule building +
bookkeeping) runs on ONE worker thread while the main thread blocks on the
next device chain — the main thread's wait inside the tunneled
`block_until_ready` releases the GIL, so even a single host core genuinely
overlaps: eval wall-clock goes from sample+chem to ~max(sample, chem).
Results are gathered in submission order, so metrics are bit-identical to
the serial path (pinned in tests/test_train.py). `overlap=False` restores
strictly serial execution.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable

import jax
import numpy as np

from difflinker_tpu.chem import delinker, metrics
from difflinker_tpu.chem.molgraph import build_molecules
from difflinker_tpu.sample.sampler import LinkerSampler


def _chem_for_result(out, true_batch, frag_batch, keep_pocket, is_geom):
    """Host chemistry for one sampling result: build predicted molecules and
    keep (pred, true, frag) triples for samples that are NaN-free and whose
    ground truth is valid (src/lightning.py:336-375 semantics)."""
    node_mask = out['node_mask']
    if 'pocket_mask' in out and not keep_pocket:
        node_mask = node_mask - out['pocket_mask']
    ok = ~out['nan_flag']
    pred_batch = build_molecules(out['one_hot'], out['positions'],
                                 node_mask, is_geom)
    triples = []
    for i, (pred, true, frag) in enumerate(
            zip(pred_batch, true_batch, frag_batch)):
        if ok[i] and metrics.is_valid(true):
            triples.append((pred, true, frag))
    return triples


def sample_and_analyze(sampler: LinkerSampler, batches: Iterable[Dict],
                       key, *, n_samples: int = 10, is_geom: bool = False,
                       keep_pocket: bool = False,
                       size_spec='ground_truth',
                       overlap: bool = True) -> Dict[str, float]:
    pred_mols, true_mols, true_frags = [], [], []
    pool = ThreadPoolExecutor(max_workers=1) if overlap else None
    pending = None  # depth-1 pipeline: at most one undrained chemistry job

    def _gather(triples):
        for pred, true, frag in triples:
            pred_mols.append(pred)
            true_mols.append(true)
            true_frags.append(frag)

    try:
        for b_idx, batch in enumerate(batches):
            atom_mask = batch['atom_mask']
            fragment_mask = batch['fragment_mask']
            if 'pocket_mask' in batch and not keep_pocket:
                # strip pocket atoms from saved molecules
                # (src/lightning.py:332-334)
                atom_mask = atom_mask - batch['pocket_mask']
                fragment_mask = batch['fragment_only_mask']

            true_batch = build_molecules(batch['one_hot'], batch['positions'],
                                         atom_mask, is_geom)
            frag_batch = build_molecules(batch['one_hot'], batch['positions'],
                                         fragment_mask, is_geom)

            for s_idx in range(n_samples):
                out = sampler.sample(
                    batch, jax.random.fold_in(key, b_idx * 1000 + s_idx),
                    size_spec=size_spec)
                if pool is not None:
                    # chemistry of THIS result overlaps the NEXT device
                    # chain; drain the previous job first so at most two
                    # results are alive at once
                    if pending is not None:
                        _gather(pending.result())
                    pending = pool.submit(
                        _chem_for_result, out, true_batch, frag_batch,
                        keep_pocket, is_geom)
                else:
                    _gather(_chem_for_result(
                        out, true_batch, frag_batch, keep_pocket, is_geom))

        if pending is not None:
            _gather(pending.result())
    finally:
        if pool is not None:
            pool.shutdown(wait=True)

    ours = metrics.compute_metrics(pred_mols, true_mols)
    dl = delinker.get_delinker_metrics(pred_mols, true_mols, true_frags)
    return {**ours, **dl}


def best_validation_metrics(history: Dict[str, list]) -> (Dict[str, float], int):
    """Model selection by argmax validity_and_connectivity
    (src/lightning.py:468-476).

    Sampling metrics run on a sparser cadence than per-epoch losses, so only
    same-cadence series are indexed by the argmax (avoids the reference's
    index misalignment between dense and sparse /val lists); the returned
    epoch is resolved through history['sampling_epochs'] when present.
    """
    series = history['validity_and_connectivity/val']
    best_idx = int(np.argmax(series))
    best = {k: v[best_idx] for k, v in history.items()
            if k.endswith('/val') and len(v) == len(series)}
    epochs = history.get('sampling_epochs')
    best_epoch = int(epochs[best_idx]) if epochs else best_idx
    return best, best_epoch
