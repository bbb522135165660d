"""Demo-recipe registry: rebuild the ExperimentConfig, validation dataset and
params for a `--save-params` npz artifact from its sidecar `.config.json`.

Every learning demo (`scripts/demo_learning*.py`) writes a small meta dict
next to the weights it saves; this module is the single place that maps that
meta back to the exact training recipe, shared by the analysis scripts
(`scripts/analyze_multifrag.py`, `scripts/bench_respacing.py`) and the
bundled-weights demo (`scripts/demo_pretrained.py`). Recipes mirror the
reference's config families (configs/zinc_difflinker.yml,
geom_difflinker[_given_anchors].yml, pockets_difflinker_full.yml).

Meta schema (all optional except hidden/layers/timesteps):
  hidden, layers, timesteps     int
  pocket: true  + com           pocket recipe (graph_type=4A, 3-ch context)
  n_fragments: [lo, hi]         GEOM multifrag recipe (+ given_anchors)
  noise_schedule / loss_type    vlb + learned-gamma training mode
  inpainting: true              replace-inpainting (InpaintingEDM)
"""
import json

from difflinker_tpu.config import (CenterOfMass, DataConfig, DatasetFamily,
                                   DiffusionConfig, ExperimentConfig,
                                   GraphType, ModelConfig, PocketMode,
                                   TrainConfig)


def recipe_config(meta: dict, timesteps: int = None,
                  exp_name: str = 'demo') -> ExperimentConfig:
    """ExperimentConfig for a saved demo meta dict (see module docstring).

    `timesteps` overrides the chain length with a REBUILT schedule — for the
    trained-grid subsequence semantics pass the trained T here and respace
    with cli.common.respace_config afterwards."""
    T = timesteps or meta['timesteps']
    diffusion = DiffusionConfig(
        timesteps=T,
        # distilled students run a short chain whose gamma lives on the
        # teacher's trained grid with the DDIM integrator (demo_distill.py
        # sidecars record both) — honouring them here is what lets a student
        # npz round-trip through cli.sample/cli.serve unchanged
        schedule_timesteps=meta.get('schedule_timesteps'),
        sampler=meta.get('sampler', 'ancestral'),
        noise_schedule=meta.get('noise_schedule', 'polynomial_2'),
        loss_type=meta.get('loss_type', 'l2'),
        inpainting=bool(meta.get('inpainting', False)))
    if meta.get('n_fragments') is not None:  # GEOM multifrag recipe
        anchors = bool(meta.get('given_anchors'))
        return ExperimentConfig(
            exp_name=exp_name,
            model=ModelConfig(in_node_nf=9,
                              context_node_nf=2 if anchors else 1,
                              hidden_nf=meta['hidden'],
                              n_layers=meta['layers'], norm_constant=1e-6),
            diffusion=diffusion,
            data=DataConfig(family=DatasetFamily.GEOM),
            train=TrainConfig(n_stability_samples=1,
                              anchors_context=anchors,
                              center_of_mass=(CenterOfMass.ANCHORS if anchors
                                              else CenterOfMass.FRAGMENTS)))
    pocket = bool(meta.get('pocket'))
    return ExperimentConfig(
        exp_name=exp_name,
        model=ModelConfig(
            # vocab width defaults to ZINC(8); demos trained on the GEOM
            # vocab (9, e.g. the pocket size-journey whose CLI leg parses
            # real files with is_geom) record in_node_nf in the sidecar
            in_node_nf=int(meta.get('in_node_nf', 8)),
            context_node_nf=3 if pocket else 2,
            hidden_nf=meta['hidden'], n_layers=meta['layers'],
            norm_constant=1e-6,
            # replace-inpainting recentres the predicted velocity
            # (demo_learning_inpainting recipe)
            centering=bool(meta.get('inpainting', False)),
            graph_type=GraphType.A4 if pocket else GraphType.FC),
        diffusion=diffusion,
        data=(DataConfig(family=DatasetFamily.MOAD,
                         pocket_mode=PocketMode.FULL)
              if pocket else DataConfig()),
        train=TrainConfig(
            n_stability_samples=1,
            center_of_mass=CenterOfMass(meta.get('com', 'fragments'))))


def recipe_val_dataset(meta: dict, size: int, seed: int = 1):
    """The validation set each demo recipe scores against (same generator
    settings the corresponding demo_learning* script uses)."""
    from difflinker_tpu.data.synthetic_molecules import (
        synthetic_molecule_dataset, synthetic_multifrag_dataset)
    if meta.get('n_fragments') is not None:
        return synthetic_multifrag_dataset(
            size, seed=seed, n_fragments=tuple(meta['n_fragments']))
    if meta.get('pocket'):
        return synthetic_molecule_dataset(size, seed=seed,
                                          pocket_range=(8, 16))
    return synthetic_molecule_dataset(size, seed=seed)


def load_demo_model(npz_path: str, timesteps: int = None,
                    exp_name: str = 'demo'):
    """(cfg, params, meta) from a --save-params npz + sidecar config.json.
    Leaf shapes are validated against the recipe template (load_params_npz
    raises on a recipe/weights mismatch)."""
    import jax
    from difflinker_tpu.diffusion.edm import make_edm
    from difflinker_tpu.io.checkpoints import load_params_npz

    with open(npz_path + '.config.json') as f:
        meta = json.load(f)
    cfg = recipe_config(meta, timesteps=timesteps, exp_name=exp_name)
    template = make_edm(cfg.model, cfg.diffusion).init_params(
        jax.random.PRNGKey(0))
    return cfg, load_params_npz(npz_path, template), meta
