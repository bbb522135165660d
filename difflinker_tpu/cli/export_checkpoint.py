"""Export a model trained in this framework as a reference-format
PyTorch-Lightning `.ckpt`.

Completes checkpoint interop in both directions (the reverse of loading a
released DiffLinker checkpoint via --ckpt): the exported file has the exact
`hyper_parameters` + `edm.*` state_dict layout the published checkpoints
use, so the reference's `generate.py` / `sample.py` / torch tooling can
consume models trained here. Verified against the reference's own modules
with load_state_dict(strict=True) (tests/test_checkpoint_export.py).

    python -m difflinker_tpu.cli.export_checkpoint --run models/<run>/ \
        --out my_model.ckpt
    python -m difflinker_tpu.cli.export_checkpoint \
        --params examples/params/zinc_h256.npz --out zinc_h256.ckpt
"""
import argparse

from difflinker_tpu.cli import common
from difflinker_tpu.io.lightning_export import save_ddpm_checkpoint


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--run', type=str, help='training run dir (orbax)')
    p.add_argument('--params', type=str,
                   help='demo-weights .npz (examples/params/*.npz) instead')
    p.add_argument('--size-npz', type=str,
                   help='cli.train_size_gnn artifact (size_gnn_<task>.npz '
                        'with its .config.json sidecar): export a '
                        'SizeClassifier/Ordinal/Regressor .ckpt instead')
    p.add_argument('--out', type=str, required=True, help='output .ckpt path')
    p.add_argument('--epoch', type=int, default=0,
                   help="stamped into the checkpoint's 'epoch' field")
    return p


def _export_size(args):
    import json
    import jax
    from difflinker_tpu import constants
    from difflinker_tpu.io.checkpoints import load_params_npz
    from difflinker_tpu.io.lightning_export import save_size_checkpoint
    from difflinker_tpu.models.size_gnn import SizePredictor

    with open(args.size_npz + '.config.json') as f:
        meta = json.load(f)
    is_geom = bool(meta.get('geom', False))
    predictor = SizePredictor(
        in_node_nf=meta['in_node_nf'], hidden_nf=meta['hidden'],
        out_node_nf=meta['out_node_nf'], n_layers=meta['layers'],
        task=meta['task'],
        size2id=(constants.GEOM_TRAIN_LINKER_SIZE2ID if is_geom
                 else constants.ZINC_TRAIN_LINKER_SIZE2ID),
        id2size=(constants.GEOM_TRAIN_LINKER_ID2SIZE if is_geom
                 else constants.ZINC_TRAIN_LINKER_ID2SIZE))
    params, state = predictor.init(jax.random.PRNGKey(0))
    tree = load_params_npz(args.size_npz,
                           {'params': params, 'bn_state': state})
    save_size_checkpoint(args.out, predictor, tree['params'],
                         tree['bn_state'], epoch=args.epoch, is_geom=is_geom)
    common.log(f'wrote reference-format size checkpoint: {args.out} '
               f'(task={predictor.task}, H={predictor.hidden_nf}, '
               f'L={predictor.n_layers})')


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.size_npz:
        _export_size(args)
        return 0
    if not args.run and not args.params:
        raise SystemExit('pass one of --run / --params / --size-npz')
    args.ckpt = None  # satisfy sample.load_model's flag contract
    from difflinker_tpu.cli.sample import load_model
    cfg, params = load_model(args)
    save_ddpm_checkpoint(args.out, cfg, params, epoch=args.epoch)
    common.log(f'wrote reference-format checkpoint: {args.out} '
               f'(model={cfg.model.model}, H={cfg.model.hidden_nf}, '
               f'L={cfg.model.n_layers}, T={cfg.diffusion.timesteps}, '
               f'schedule={cfg.diffusion.noise_schedule})')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
