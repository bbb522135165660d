"""Sampling-based evaluation during/after training.

Port of DDPM.sample_and_analyze (src/lightning.py:322-403): sample
n_stability_samples linkers per val input, build molecules geometrically, and
aggregate our metrics + the DeLinker battery. Chemistry runs host-side
(optionally in a process pool — reference precedent: joblib workers,
src/delinker_utils/frag_utils.py:130-138).
"""
from __future__ import annotations

from typing import Dict, Iterable

import jax
import numpy as np

from difflinker_tpu.chem import delinker, metrics
from difflinker_tpu.chem.molgraph import build_molecules
from difflinker_tpu.sample.sampler import LinkerSampler


def sample_and_analyze(sampler: LinkerSampler, batches: Iterable[Dict],
                       key, *, n_samples: int = 10, is_geom: bool = False,
                       keep_pocket: bool = False,
                       size_spec='ground_truth') -> Dict[str, float]:
    pred_mols, true_mols, true_frags = [], [], []

    for b_idx, batch in enumerate(batches):
        atom_mask = batch['atom_mask']
        fragment_mask = batch['fragment_mask']
        if 'pocket_mask' in batch and not keep_pocket:
            # strip pocket atoms from saved molecules (src/lightning.py:332-334)
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
            node_mask = out['node_mask']
            if 'pocket_mask' in out and not keep_pocket:
                node_mask = node_mask - out['pocket_mask']
            ok = ~out['nan_flag']
            pred_batch = build_molecules(out['one_hot'], out['positions'],
                                         node_mask, is_geom)
            for i, (pred, true, frag) in enumerate(
                    zip(pred_batch, true_batch, frag_batch)):
                if ok[i] and metrics.is_valid(true):
                    pred_mols.append(pred)
                    true_mols.append(true)
                    true_frags.append(frag)

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
