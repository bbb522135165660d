"""Typed configuration system.

Replaces the reference's argparse+YAML merge and its prefix string-sniffing
(`'.' in train_data_prefix` selects pocket mode at src/lightning.py:76-81,116;
`'geom' in prefix` selects the vocabulary at src/lightning.py:73) with explicit
enums/dataclasses. YAML configs in /root/repo/configs mirror the reference's
nine canonical configs (configs/*.yml).
"""
from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


class DatasetFamily(str, enum.Enum):
    ZINC = 'zinc'
    GEOM = 'geom'
    MOAD = 'moad'


class PocketMode(str, enum.Enum):
    NONE = 'none'
    BACKBONE = 'bb'
    FULL = 'full'


class GraphType(str, enum.Enum):
    """Edge-construction policy (reference: src/egnn.py:383,495)."""
    FC = 'FC'              # fully connected intra-sample graph
    A4 = '4A'              # all pairs within 4 Angstrom
    FC_4A = 'FC-4A'        # ligand FC + pocket<=4A + ligand-pocket<=4A
    FC_10A_4A = 'FC-10A-4A'  # ligand FC + pocket<=4A + ligand-pocket<=10A


class CenterOfMass(str, enum.Enum):
    FRAGMENTS = 'fragments'
    ANCHORS = 'anchors'


@dataclass(frozen=True)
class ModelConfig:
    """EGNN denoiser hyperparameters (reference Dynamics/EGNN ctor args,
    src/egnn.py:323-372,181-216)."""
    in_node_nf: int = 8               # one-hot size (+1 if include_charges)
    context_node_nf: int = 2          # anchors + fragment flag (3 for pockets)
    n_dims: int = 3
    hidden_nf: int = 128
    n_layers: int = 8
    inv_sublayers: int = 2
    attention: bool = False
    tanh: bool = False
    coords_range: float = 15.0
    norm_constant: float = 1e-6
    sin_embedding: bool = False
    normalization_factor: float = 100.0
    aggregation_method: str = 'sum'   # 'sum' | 'mean'
    activation: str = 'silu'
    condition_time: bool = True
    model: str = 'egnn_dynamics'      # 'egnn_dynamics' | 'gnn_dynamics'
    normalization: Optional[str] = None  # None | 'batch_norm' (GNN ablation only)
    centering: bool = False           # inpainting: recentre predicted velocity
    graph_type: GraphType = GraphType.FC
    # numerics / kernels
    dtype: str = 'float32'            # compute dtype: 'float32' | 'bfloat16'
    # Per-block jax.checkpoint on the training path: True | False | 'auto'.
    # Required at fp32 pocket shapes (backward without it OOMs holding every
    # block's (B,N,N,H) edge activations); disabling buys ~17% where the
    # backward fits HBM (measured, scripts/bench_train_pocket.py +
    # BASELINE.md). 'auto' estimates the live edge-activation bytes from the
    # traced batch shape and drops remat exactly when they fit
    # (resolve_remat below, calibrated to the round-2 OOM/fit measurements).
    remat: object = 'auto'
    # 'xla' is the only compute path: two generations of fused Pallas kernels
    # were built, measured on-chip at ZINC and pocket shapes, and both lost
    # ~2x to XLA's own fusion (the dense EGNN is VPU/HBM-roofline-bound at
    # H=128; full numbers in docs/ARCHITECTURE.md §5). The field stays so
    # saved configs keep loading.
    kernel_impl: str = 'xla'
    # Distance-graph sparsity: keep only the K nearest admissible neighbours
    # per node (static shapes). Exact vs the dense path when K >= the true
    # max degree; None = dense (B, N, N) masks. Ignored for FC graphs.
    neighbor_k: Optional[int] = None
    # Block-sparse alternative to neighbor_k: nodes grouped in contiguous
    # tiles of `tile_size` rows, each row-tile keeping its `tile_neighbors`
    # most-connected neighbour tiles; edge work runs MXU-dense over
    # (T, M*T) blocks with whole-tile gathers. Exact when M covers every
    # tile pair holding an admissible edge. Ignored for FC graphs;
    # takes precedence over neighbor_k when both are set.
    tile_size: Optional[int] = None
    tile_neighbors: Optional[int] = None
    # Pipeline parallelism (parallel/pipeline.py): microbatches per local
    # batch when a `stages` mesh axis is active. 0 = stage count. The bubble
    # fraction is (S-1)/(M+S-1): raise M to amortise it.
    pipeline_microbatches: int = 0

    @property
    def edge_feat_nf(self) -> int:
        # [current distance feature, initial distance feature]
        return 2 * self.sin_embedding_dim if self.sin_embedding else 2

    @property
    def sin_embedding_dim(self) -> int:
        # SinusoidsEmbeddingNew: 6 frequencies x (sin, cos) (src/egnn.py:281-292)
        import math
        max_res, min_res, div = 15.0, 15.0 / 2000.0, 4
        return 2 * (int(math.log(max_res / min_res, div)) + 1)

    @property
    def dynamics_in_nf(self) -> int:
        return self.in_node_nf + self.context_node_nf + int(self.condition_time)


def resolve_remat(cfg: 'ModelConfig', batch_shape) -> bool:
    """Decide per-block jax.checkpoint for a concrete (B, N, ...) batch shape
    (trace-time static, so the decision is free).

    Model: the backward without remat keeps ~k live (B, N, N, H) edge
    tensors per GCL (edge-MLP input/hidden/output, k≈1.5 after XLA fusion);
    remat only pays when those exceed the HBM budget. Calibrated against the
    round-2 measurements (BASELINE.md): fp32 (32, 256) H=128 ×12 GCLs OOMs
    without remat, bf16 (32, 256) fits (and runs 17% faster), bf16 (16, 512)
    OOMs — k=1.5 with a 12 GB budget reproduces all three. Override the
    budget via DIFFLINKER_REMAT_BUDGET_GB."""
    if cfg.remat != 'auto':
        return bool(cfg.remat)
    import os
    budget_gb = float(os.environ.get('DIFFLINKER_REMAT_BUDGET_GB', 12.0))
    b, n = int(batch_shape[0]), int(batch_shape[1])
    if cfg.neighbor_k is not None or cfg.tile_size is not None:
        # sparse layouts hold K·N (or tile-pair) edges, not N² — scale n_eff
        n_eff = cfg.neighbor_k or (cfg.tile_size * (cfg.tile_neighbors or 1))
        n_edges = b * n * min(n_eff, n)
    else:
        n_edges = b * n * n
    itemsize = 2 if cfg.dtype == 'bfloat16' else 4
    n_gcl = cfg.n_layers * cfg.inv_sublayers
    live_bytes = 1.5 * n_gcl * n_edges * cfg.hidden_nf * itemsize
    return live_bytes > budget_gb * 1e9


@dataclass(frozen=True)
class DiffusionConfig:
    """EDM hyperparameters (reference EDM ctor, src/edm.py:15-39)."""
    timesteps: int = 500
    noise_schedule: str = 'polynomial_2'   # 'polynomial_<p>' | 'cosine' | 'learned'
    noise_precision: float = 1e-5
    loss_type: str = 'l2'                  # 'l2' | 'vlb'
    norm_values: Tuple[float, float, float] = (1.0, 4.0, 10.0)
    norm_biases: Tuple[Optional[float], float, float] = (None, 0.0, 0.0)
    inpainting: bool = False
    # RePaint resampling (Lugmayr et al. 2022): at each reverse step run the
    # transition `resample_steps` times, re-noising z_s -> z_t between
    # repeats, so the generated part harmonises with the conditioning part.
    # 1 = the reference's plain formulation. On the inpainting EDM the p/q
    # mix is repeated (fragments re-q-sampled, src/edm.py:568-598); on the
    # masked EDM only the linker is re-noised (fragments stay exactly
    # frozen). Inference-only; chain cost scales linearly with it.
    resample_steps: int = 1
    # Low-temperature sampling: multiply the posterior noise sigma of every
    # reverse transition (and the final p(x,h|z0) draw) by this factor.
    # 1.0 = the reference's exact ancestral sampler; <1 trades diversity for
    # validity/connectivity (0 degenerates to the posterior-mean chain).
    # Prior draws (init_z) and RePaint re-noising stay at scale 1 — only the
    # *generative* noise is cooled. Inference-only knob.
    noise_scale: float = 1.0
    # Reverse-transition integrator. 'ancestral' is the reference's exact
    # stochastic sampler (src/edm.py:178-208). 'ddim' replaces every p-side
    # transition with the deterministic DDIM (eta=0) update
    # z_s = alpha_s*x_hat + sigma_s*eps_hat (Song et al. 2021) and decodes
    # z_0 to the posterior mean — the whole chain becomes a deterministic
    # function of the initial noise, which holds sample quality at far fewer
    # steps than ancestral respacing and is the integrator step-distillation
    # teachers require. Inference-only; q-side conditioning draws
    # (inpainting fragments, RePaint re-noising) stay stochastic.
    sampler: str = 'ancestral'             # 'ancestral' | 'ddim'
    # Final-decode mode for p(x,h|z0): 'draw' adds the sigma_0-scaled noise
    # (reference src/edm.py:210-235 semantics, the default); 'mean' takes the
    # posterior mean mu_x instead. Inference-only diagnostic knob — with a
    # learned schedule whose gamma_0 sits high (vlb training), 'mean'
    # separates denoiser quality from the schedule's final noise floor
    # (docs/demo_vlb_results.json).
    final_decode: str = 'draw'             # 'draw' | 'mean'
    # Exact-subsequence respacing: the gamma grid of the TRAINED schedule.
    # None -> `timesteps` (normal training / full-grid sampling). Set to the
    # trained T while lowering `timesteps` to sample on a coarser loop whose
    # gamma values are read off the trained table at round(t*schedule_T) —
    # precisely the reference's `model.edm.T = n_steps` override semantics
    # (sample.py:94-95 + src/noise.py:126-128), i.e. ancestral subsequence
    # sampling on the original grid rather than a rebuilt-T' schedule.
    schedule_timesteps: Optional[int] = None


@dataclass(frozen=True)
class DataConfig:
    data_path: str = 'datasets'
    train_prefix: str = 'zinc_final_train'
    val_prefix: str = 'zinc_final_val'
    family: DatasetFamily = DatasetFamily.ZINC
    pocket_mode: PocketMode = PocketMode.NONE
    include_charges: bool = False
    size_buckets: Sequence[int] = field(default=None)

    @property
    def is_geom(self) -> bool:
        return self.family in (DatasetFamily.GEOM, DatasetFamily.MOAD)

    @property
    def has_pocket(self) -> bool:
        return self.pocket_mode != PocketMode.NONE


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-4
    batch_size: int = 128
    n_epochs: int = 1000
    test_epochs: int = 20
    n_stability_samples: int = 10
    weight_decay: float = 1e-12
    amsgrad: bool = True
    data_augmentation: bool = False
    center_of_mass: CenterOfMass = CenterOfMass.FRAGMENTS
    anchors_context: bool = True
    seed: int = 0
    log_iterations: Optional[int] = None
    checkpoints_dir: str = 'models'
    samples_dir: Optional[str] = None
    # parallelism
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ('data',)


@dataclass(frozen=True)
class ExperimentConfig:
    exp_name: str = 'zinc_difflinker'
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    @property
    def context_node_nf(self) -> int:
        """Derive context width the way train_difflinker.py:50-56 does:
        fragment flag (+ anchors flag) (+ extra pocket channel)."""
        n = 1 + int(self.train.anchors_context)
        if self.data.has_pocket:
            n += 1
        return n


# ---------------------------------------------------------------------------
# YAML loading (compatible with the reference's config keys)
# ---------------------------------------------------------------------------

_REFERENCE_KEY_MAP = {
    # reference yml key -> (section, our field)
    'nf': ('model', 'hidden_nf'),
    'n_layers': ('model', 'n_layers'),
    'inv_sublayers': ('model', 'inv_sublayers'),
    'attention': ('model', 'attention'),
    'tanh': ('model', 'tanh'),
    'norm_constant': ('model', 'norm_constant'),
    'sin_embedding': ('model', 'sin_embedding'),
    'normalization_factor': ('model', 'normalization_factor'),
    'aggregation_method': ('model', 'aggregation_method'),
    'activation': ('model', 'activation'),
    'condition_time': ('model', 'condition_time'),
    'model': ('model', 'model'),
    'normalization': ('model', 'normalization'),
    'graph_type': ('model', 'graph_type'),
    'diffusion_steps': ('diffusion', 'timesteps'),
    'diffusion_noise_schedule': ('diffusion', 'noise_schedule'),
    'diffusion_noise_precision': ('diffusion', 'noise_precision'),
    'diffusion_loss_type': ('diffusion', 'loss_type'),
    'normalize_factors': ('diffusion', 'norm_values'),
    'inpainting': ('diffusion', 'inpainting'),
    'data': ('data', 'data_path'),
    'train_data_prefix': ('data', 'train_prefix'),
    'val_data_prefix': ('data', 'val_prefix'),
    'include_charges': ('data', 'include_charges'),
    'lr': ('train', 'lr'),
    'batch_size': ('train', 'batch_size'),
    'n_epochs': ('train', 'n_epochs'),
    'test_epochs': ('train', 'test_epochs'),
    'n_stability_samples': ('train', 'n_stability_samples'),
    'data_augmentation': ('train', 'data_augmentation'),
    'center_of_mass': ('train', 'center_of_mass'),
    'log_iterations': ('train', 'log_iterations'),
    'checkpoints': ('train', 'checkpoints_dir'),
    'seed': ('train', 'seed'),
}


def respace_config(cfg: 'ExperimentConfig', steps: Optional[int],
                   mode: str = 'subsequence') -> 'ExperimentConfig':
    """Apply a steps override to an ExperimentConfig.

    mode='subsequence' (default): sample `steps` loop iterations whose gamma
    values are read off the TRAINED schedule's grid — bitwise the trained
    schedule at steps == trained T, and the reference's own n_steps-override
    semantics below it (sample.py:94-95 sets model.edm.T while
    PredefinedNoiseSchedule keeps its original grid, src/noise.py:126-128).
    Required for imported reference checkpoints, where schedule parity is the
    whole methodology.

    mode='rebuild': legacy behavior — rebuild the schedule at T'=steps
    (gamma_{T'} != the trained gamma's subsequence because
    clip_noise_schedule cumprods per-step ratios). Kept for comparison
    sweeps (scripts/bench_respacing.py)."""
    if not steps:
        return cfg
    d = cfg.diffusion
    if mode == 'rebuild':
        return dataclasses.replace(
            cfg, diffusion=dataclasses.replace(d, timesteps=steps,
                                               schedule_timesteps=None))
    if mode != 'subsequence':
        raise ValueError(f'unknown respace mode: {mode!r}')
    trained_T = d.schedule_timesteps or d.timesteps
    return dataclasses.replace(
        cfg, diffusion=dataclasses.replace(d, timesteps=steps,
                                           schedule_timesteps=trained_T))


def _family_from_prefix(prefix: str) -> Tuple[DatasetFamily, PocketMode]:
    """Backwards-compatible translation of the reference's prefix sniffing
    (src/lightning.py:73-81, src/datasets.py:110-115). Our own configs set the
    enums explicitly; this exists so the reference's ymls load unmodified."""
    if '.' in prefix:
        mode = prefix.split('.')[-1]
        return DatasetFamily.MOAD, PocketMode(mode)
    if 'geom' in prefix:
        return DatasetFamily.GEOM, PocketMode.NONE
    if 'MOAD' in prefix:
        return DatasetFamily.MOAD, PocketMode.FULL
    return DatasetFamily.ZINC, PocketMode.NONE


def load_config(path: str) -> ExperimentConfig:
    """Load an ExperimentConfig from a YAML file.

    Accepts both our explicit format (nested sections ``model:``, ``diffusion:``
    ...) and the reference's flat key format (configs/zinc_difflinker.yml etc.).
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    sections = {'model': {}, 'diffusion': {}, 'data': {}, 'train': {}}
    exp_name = raw.pop('exp_name', 'experiment')

    nested = all(k in ('model', 'diffusion', 'data', 'train', 'exp_name') for k in raw)
    if nested and any(isinstance(v, dict) for v in raw.values()):
        for sec in sections:
            sections[sec].update(raw.get(sec) or {})
    else:
        # Flat, reference-style keys.
        if raw.get('remove_anchors_context'):
            sections['train']['anchors_context'] = False
        for key, value in raw.items():
            if key in _REFERENCE_KEY_MAP and value is not None:
                sec, name = _REFERENCE_KEY_MAP[key]
                sections[sec][name] = value
        prefix = sections['data'].get('train_prefix', '')
        family, pocket = _family_from_prefix(prefix)
        sections['data'].setdefault('family', family)
        sections['data'].setdefault('pocket_mode', pocket)

    # Coerce enums / tuples.
    d = sections['data']
    if 'family' in d:
        d['family'] = DatasetFamily(d['family'])
    if 'pocket_mode' in d:
        d['pocket_mode'] = PocketMode(d['pocket_mode'])
    t = sections['train']
    if 'center_of_mass' in t:
        t['center_of_mass'] = CenterOfMass(t['center_of_mass'])
    m = sections['model']
    if 'graph_type' in m and m['graph_type'] is not None:
        m['graph_type'] = GraphType(m['graph_type'])
    df = sections['diffusion']
    if 'norm_values' in df:
        df['norm_values'] = tuple(float(v) for v in df['norm_values'])

    # the reference couples dynamics CoM-centering to inpainting
    # (src/lightning.py:99: Dynamics(centering=inpainting))
    if df.get('inpainting'):
        m.setdefault('centering', True)

    data = DataConfig(**{k: v for k, v in d.items()
                         if k in {f.name for f in dataclasses.fields(DataConfig)}})
    train = TrainConfig(**{k: v for k, v in t.items()
                           if k in {f.name for f in dataclasses.fields(TrainConfig)}})
    diffusion = DiffusionConfig(**{k: v for k, v in df.items()
                                   if k in {f.name for f in dataclasses.fields(DiffusionConfig)}})

    # Derive vocab width and context width if not given explicitly.
    from difflinker_tpu import constants
    n_types = (constants.GEOM_NUMBER_OF_ATOM_TYPES if data.is_geom
               else constants.NUMBER_OF_ATOM_TYPES)
    in_node_nf = m.pop('in_node_nf', n_types + int(data.include_charges))
    context_nf = m.pop('context_node_nf', None)
    if context_nf is None:
        context_nf = 1 + int(train.anchors_context) + int(data.has_pocket)
    if data.has_pocket and 'graph_type' not in m:
        m['graph_type'] = GraphType.A4
    model = ModelConfig(in_node_nf=in_node_nf, context_node_nf=context_nf,
                        **{k: v for k, v in m.items()
                           if k in {f.name for f in dataclasses.fields(ModelConfig)}})

    return ExperimentConfig(exp_name=exp_name, model=model, diffusion=diffusion,
                            data=data, train=train)
