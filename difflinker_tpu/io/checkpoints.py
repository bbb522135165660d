"""Native checkpointing (Orbax) + run resumption.

Replaces Lightning's ModelCheckpoint / find_last_checkpoint
(train_difflinker.py:15-22,96-119): every-epoch step checkpoints with the
experiment config stored alongside, so `load_run(dir)` reconstructs the full
trainer the way `DDPM.load_from_checkpoint` does.
"""
from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Dict, Optional

import jax
import numpy as np


def _cfg_to_jsonable(obj):
    if dataclasses.is_dataclass(obj):
        return {k: _cfg_to_jsonable(v)
                for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, enum.Enum):
        return obj.value
    if isinstance(obj, (list, tuple)):
        return [_cfg_to_jsonable(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _cfg_to_jsonable(v) for k, v in obj.items()}
    return obj


def save_config(cfg, run_dir: str) -> None:
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, 'config.json'), 'w') as f:
        json.dump(_cfg_to_jsonable(cfg), f, indent=2, default=str)


def load_config(run_dir: str):
    from difflinker_tpu.config import (CenterOfMass, DataConfig,
                                       DatasetFamily, DiffusionConfig,
                                       ExperimentConfig, GraphType,
                                       ModelConfig, PocketMode, TrainConfig)
    with open(os.path.join(run_dir, 'config.json')) as f:
        raw = json.load(f)
    m = dict(raw['model'])
    m['graph_type'] = GraphType(m['graph_type'])
    d = dict(raw['data'])
    d['family'] = DatasetFamily(d['family'])
    d['pocket_mode'] = PocketMode(d['pocket_mode'])
    t = dict(raw['train'])
    t['center_of_mass'] = CenterOfMass(t['center_of_mass'])
    t['mesh_shape'] = tuple(t.get('mesh_shape', (1,)))
    t['mesh_axes'] = tuple(t.get('mesh_axes', ('data',)))
    df = dict(raw['diffusion'])
    df['norm_values'] = tuple(df['norm_values'])
    df['norm_biases'] = tuple(None if v in (None, 'None') else v
                              for v in df['norm_biases'])
    return ExperimentConfig(exp_name=raw['exp_name'],
                            model=ModelConfig(**m), diffusion=DiffusionConfig(**df),
                            data=DataConfig(**d), train=TrainConfig(**t))


class CheckpointManager:
    """Thin orbax wrapper keyed by integer step; keeps every checkpoint
    (reference keeps every epoch: save_top_k=-1, train_difflinker.py:96-101)."""

    def __init__(self, run_dir: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.run_dir, 'checkpoints'),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: Dict, metrics: Optional[Dict] = None):
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics={k: float(v) for k, v in (metrics or {}).items()})
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Dict, step: Optional[int] = None) -> Dict:
        import orbax.checkpoint as ocp
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f'no checkpoints under {self.run_dir}')
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def restore_raw(self, step: Optional[int] = None) -> Dict:
        """Restore whatever the checkpoint holds, template-free (host numpy).

        Inference loaders use this: a run trained with --ema carries an
        `ema_params` tree the training-template restore would need to know
        about in advance; raw restore lets callers prefer it when present.
        Template-free restore is orbax-version-sensitive about list nodes
        (some versions hand back {'0': ..., '1': ...} dicts); `_relistify`
        normalises those back to lists so params trees keep their shape."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f'no checkpoints under {self.run_dir}')
        return _relistify(self._mgr.restore(step))

    def close(self):
        self._mgr.close()


def _relistify(tree):
    """Convert dict nodes whose keys are exactly '0'..'n-1' back into lists
    (template-free orbax restores may stringify list indices; downstream code
    iterates params['egnn']['blocks'] as a list)."""
    if isinstance(tree, dict):
        conv = {k: _relistify(v) for k, v in tree.items()}
        keys = list(conv.keys())
        if keys and all(isinstance(k, str) and k.isdigit() for k in keys) \
                and sorted(int(k) for k in keys) == list(range(len(keys))):
            return [conv[str(i)] for i in range(len(keys))]
        return conv
    if isinstance(tree, (list, tuple)):
        return type(tree)(_relistify(v) for v in tree)
    return tree


def save_params_npz(params: Dict, path: str, dtype=None) -> None:
    """Flat-npz export of a param pytree (portable, torch-free).

    `dtype` (e.g. np.float16) down-casts leaves for bundled release
    artifacts — halves the file; load_params_npz casts back to the
    template's dtype, so the round-trip costs one fp16 quantisation."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                        for k in keypath)
        arr = np.asarray(leaf)
        flat[name] = arr.astype(dtype) if dtype is not None else arr
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, params_like: Dict) -> Dict:
    z = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params_like)
    names = ['/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                      for k in kp) for kp, _ in leaves]
    missing = [n for n in names if n not in z.files]
    if missing:
        raise ValueError(
            f'{path} lacks {len(missing)} leaves of the template '
            f'(first: {missing[:3]}) — saved from a different model config?')
    extra = sorted(set(z.files) - set(names))
    if extra:
        raise ValueError(
            f'{path} carries {len(extra)} leaves the template has no slot '
            f'for (first: {extra[:3]}) — e.g. a learned-gamma artifact '
            'loaded against a fixed-schedule template; those weights would '
            'be silently dropped. Rebuild the template from the artifact\'s '
            '.config.json recipe.')
    new_leaves = []
    for n, (_, like) in zip(names, leaves):
        leaf = z[n]
        if leaf.shape != np.shape(like):
            raise ValueError(
                f'{path}[{n}] has shape {leaf.shape}, template expects '
                f'{np.shape(like)} — saved from a different model config '
                '(e.g. another hidden size / context width)?')
        # fp16-stored release artifacts come back at the template's dtype
        # (a dtype change would otherwise silently fork the jit program)
        new_leaves.append(leaf.astype(np.asarray(like).dtype, copy=False))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_like), new_leaves)
