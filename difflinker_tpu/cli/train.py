"""Train the linker-diffusion model.

TPU-native counterpart of train_difflinker.py: YAML config (reference format
accepted), bucketed data pipeline, one jitted DP train step, orbax
checkpoints every epoch, periodic sampling evaluation, resume from the latest
checkpoint.

    python -m difflinker_tpu.cli.train --config configs/zinc_difflinker.yml \
        [--epochs N] [--mesh N] [--resume RUN_DIR] [--synthetic N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

from difflinker_tpu.cli import common
from difflinker_tpu.config import load_config
from difflinker_tpu.data.datasets import LinkerDataset, synthetic_dataset
from difflinker_tpu.io import checkpoints as ckpt_lib
from difflinker_tpu.sample.sampler import LinkerSampler
from difflinker_tpu.train.evaluation import sample_and_analyze
from difflinker_tpu.train.trainer import Trainer


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    common.add_config_arg(p)
    p.add_argument('--epochs', type=int, default=None, help='override n_epochs')
    common.add_mesh_args(p)
    p.add_argument('--resume', type=str, default=None,
                   help='run dir to resume from')
    p.add_argument('--synthetic', type=int, default=None,
                   help='use N synthetic molecules instead of disk data '
                        '(smoke testing)')
    p.add_argument('--eval-every', type=int, default=None,
                   help='override test_epochs')
    p.add_argument('--no-sampling-eval', action='store_true')
    p.add_argument('--logs', type=str, default='logs')
    p.add_argument('--wandb', type=str, default=None,
                   help='wandb project name (logging off when unset)')
    p.add_argument('--wandb-entity', type=str, default=None)
    p.add_argument('--profile', type=str, default=None,
                   help='capture a jax.profiler trace of the first resumed '
                        'epoch into this directory')
    p.add_argument('--samples-dir', type=str, default=None,
                   help='save a denoising-chain gif per sampling eval here')
    p.add_argument('--ema', type=float, default=None,
                   help='EMA decay for a parallel parameter average')
    p.add_argument('--adaptive-clip', action='store_true',
                   help='adaptive gradient clipping (1.5x mean + 2 std of '
                        'recent grad norms)')
    return p


def load_datasets(cfg, synthetic):
    if synthetic:
        pocket_range = (5, 12) if cfg.data.has_pocket else None
        return (synthetic_dataset(synthetic, seed=0, is_geom=cfg.data.is_geom,
                                  pocket_range=pocket_range),
                synthetic_dataset(max(synthetic // 8, 4), seed=1,
                                  is_geom=cfg.data.is_geom,
                                  pocket_range=pocket_range))
    train = LinkerDataset.from_pt(cfg.data.data_path, cfg.data.train_prefix)
    val = LinkerDataset.from_pt(cfg.data.data_path, cfg.data.val_prefix)
    return train, val


def save_epoch_animation(cfg, sampler, val_ds, epoch, key):
    """Denoising-chain gif of the first val molecule every sampling-eval epoch
    (reference DDPM.generate_animation, src/lightning.py:306-320, FRAMES=100)."""
    import numpy as np
    from difflinker_tpu.io.visualizer import visualize_chain
    from difflinker_tpu.io.xyz import save_xyz_file

    frames = min(100, cfg.diffusion.timesteps)
    batch = next(val_ds.iter_batches(1))
    out = sampler.sample(batch, key, size_spec='ground_truth',
                         keep_frames=frames)
    mol_dir = os.path.join(cfg.train.samples_dir, f'epoch_{epoch}', 'mol_0')
    os.makedirs(mol_dir, exist_ok=True)
    # one-hot columns only — exclude the trailing charge column when present
    # (reference src/lightning.py:314)
    nf = cfg.model.in_node_nf - int(cfg.data.include_charges)
    node_mask = np.repeat(out['node_mask'][0][None], frames, axis=0)
    save_xyz_file(mol_dir, out['chain'][:, 0, :, 3:3 + nf],
                  out['chain'][:, 0, :, :3], node_mask,
                  names=[f'mol_0_{j}' for j in range(frames)],
                  is_geom=cfg.data.is_geom)
    return visualize_chain(mol_dir, is_geom=cfg.data.is_geom)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    common.enable_compilation_cache()
    if args.resume:
        cfg = ckpt_lib.load_config(args.resume)
        run_dir = args.resume
        run_id = os.path.basename(run_dir.rstrip('/'))
    else:
        assert args.config, '--config or --resume required'
        cfg = load_config(args.config)
        run_id, log_dir, run_dir = common.setup_run_dirs(
            args.logs, cfg.train.checkpoints_dir, cfg.exp_name)
        ckpt_lib.save_config(cfg, run_dir)
    sys.stdout = common.Logger(os.path.join(args.logs, 'general_logs',
                                            run_id, 'log.log'))
    common.log(f'run {run_id}; backend={jax.default_backend()}')

    if args.samples_dir:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           samples_dir=args.samples_dir))

    n_epochs = args.epochs or cfg.train.n_epochs
    eval_every = args.eval_every or cfg.train.test_epochs

    mesh = common.build_mesh(args)
    trainer = Trainer(cfg, mesh=mesh, ema_beta=args.ema,
                      adaptive_clip=args.adaptive_clip)
    mgr = ckpt_lib.CheckpointManager(run_dir)

    wandb_run = None
    if args.wandb:
        try:
            import wandb
            wandb_run = wandb.init(project=args.wandb,
                                   entity=args.wandb_entity, name=run_id,
                                   config=ckpt_lib._cfg_to_jsonable(cfg))
        except Exception as e:
            common.log(f'wandb unavailable, logging to stdout only: {e}')

    key = jax.random.PRNGKey(cfg.train.seed)
    state = trainer.init_state(key)
    start_epoch = 0
    latest = mgr.latest_step()
    if latest is not None:
        state = mgr.restore(state, latest)
        start_epoch = int(latest)
        common.log(f'resumed from epoch {start_epoch}')

    train_ds, val_ds = load_datasets(cfg, args.synthetic)
    common.log(f'train={len(train_ds)} val={len(val_ds)} '
               f'batch={cfg.train.batch_size}')

    history = {}
    history_path = os.path.join(run_dir, 'history.json')
    if start_epoch and os.path.exists(history_path):
        with open(history_path) as f:
            history = json.load(f)  # keep pre-resume series
    eval_sampler = None
    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        key, ktrain, keval, ksample = jax.random.split(key, 4)
        batches = train_ds.iter_batches(cfg.train.batch_size, shuffle=True,
                                        seed=epoch)
        profiling = args.profile and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(args.profile)
        state, train_metrics = trainer.fit_epoch(
            state, batches, ktrain, log_every=cfg.train.log_iterations)
        if profiling:
            jax.profiler.stop_trace()
            common.log(f'profiler trace written to {args.profile}')
        val_metrics = trainer.evaluate(
            state, val_ds.iter_batches(cfg.train.batch_size), keval)
        dt = time.time() - t0
        for k, v in train_metrics.items():
            history.setdefault(f'{k}/train', []).append(v)
        for k, v in val_metrics.items():
            history.setdefault(f'{k}/val', []).append(v)
        if 'loss' not in train_metrics:
            raise RuntimeError(
                'no trainable batches this epoch — every bucket group was '
                'smaller than the device mesh; reduce --mesh or add data')
        # tiny val sets can yield no mesh-divisible batches -> no metrics
        val_loss = (f"{val_metrics['loss']:.4f}" if 'loss' in val_metrics
                    else 'n/a')
        common.log(f'epoch {epoch}: loss/train={train_metrics["loss"]:.4f} '
                   f'loss/val={val_loss} ({dt:.1f}s)')

        if (not args.no_sampling_eval and eval_every > 0
                and (epoch + 1) % eval_every == 0):
            # one sampler for the whole run (compiled chains persist across
            # evals; weights are swapped as jit arguments). With --ema the
            # EMA weights are evaluated — they are what inference loads.
            if eval_sampler is None:
                eval_sampler = LinkerSampler(
                    cfg, state['params'], trainer.edm,
                    pad_batch_to=cfg.train.batch_size)
            sampler = eval_sampler.update_params(
                state.get('ema_params', state['params']))
            sampling = sample_and_analyze(
                sampler, val_ds.iter_batches(cfg.train.batch_size), ksample,
                n_samples=cfg.train.n_stability_samples,
                is_geom=cfg.data.is_geom)
            # sampling metrics run every `eval_every` epochs — record the
            # epoch alongside so series stay alignable (the per-epoch loss
            # lists have a different cadence)
            history.setdefault('sampling_epochs', []).append(epoch)
            for k, v in sampling.items():
                history.setdefault(f'{k}/val', []).append(v)
            common.log('sampling eval: ' + json.dumps(
                {k: round(float(v), 4) for k, v in sampling.items()}))
            if cfg.train.samples_dir:
                gif = save_epoch_animation(cfg, sampler, val_ds, epoch,
                                           ksample)
                common.log(f'animation: {gif}')
                if wandb_run is not None:
                    import wandb as _wandb
                    wandb_run.log({'chain': _wandb.Video(gif)}, step=epoch)

        if wandb_run is not None:
            wandb_run.log({f'{k}/train': v for k, v in train_metrics.items()}
                          | {f'{k}/val': v for k, v in val_metrics.items()},
                          step=epoch)
        mgr.save(epoch + 1, state,
                 metrics={'loss_val': val_metrics.get(
                     'loss', train_metrics['loss'])})
        with open(history_path, 'w') as f:
            json.dump(history, f)
    common.log('training done')
    if wandb_run is not None:
        wandb_run.finish()
    mgr.close()
    return 0


if __name__ == '__main__':
    sys.exit(main())
