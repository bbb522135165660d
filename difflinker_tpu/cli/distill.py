"""Progressive step distillation of a trained diffusion model.

Halves the teacher's DDIM chain stage by stage (train/distill.Distiller,
Salimans & Ho 2022): T -> T/2 -> ... -> the smallest requested stage. Each
stage trains a student to reproduce its teacher's TWO DDIM transitions in
ONE; the student then teaches the next stage. Students are written as
ordinary run dirs, so every downstream CLI loads them directly:

    python -m difflinker_tpu.cli.distill --run models/my_run \
        --data datasets --prefix zinc_final_train \
        --stages auto --save-students 32,16,8 --out-dir models/distilled
    python -m difflinker_tpu.cli.sample --run models/distilled/student_T16 ...

The trained schedule grid must be divisible by 2*student_T at every stage
(train at a power-of-two T, e.g. 512). Teacher sources: --run (orbax run
dir), --ckpt (reference Lightning .ckpt), or --params (bundled demo npz).

Measured study (quality per stage vs the undistilled baselines at the same
step count): scripts/demo_distill.py -> docs/distill_results.json and the
BASELINE.md "Progressive distillation" section. The honest headline there:
students more than double undistilled-DDIM quality at T<=16, but ancestral
subsequence respacing (`cli.sample --steps`) still wins at every T on the
demo family — reach for distilled students when you need a DETERMINISTIC
fast lane. Addresses the O(T) sampling-cost regime of the reference
(src/edm.py:146-163).
"""
import argparse
import dataclasses
import json
import os

from difflinker_tpu.cli import common


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--run', type=str, help='teacher training run dir (orbax)')
    p.add_argument('--ckpt', type=str,
                   help='teacher reference Lightning .ckpt')
    p.add_argument('--params', type=str,
                   help='teacher bundled demo-weights .npz')
    p.add_argument('--data', type=str, default=None,
                   help='dataset dir with {prefix}.pt / npz cache')
    p.add_argument('--prefix', type=str, default=None)
    p.add_argument('--synthetic', type=int, default=None,
                   help='train on N synthetic molecules instead of --data')
    p.add_argument('--stages', type=str, default='auto',
                   help="comma-separated student_T per halving stage, or "
                        "'auto' (halve the trained grid down to 8)")
    p.add_argument('--steps-per-stage', type=int, default=2500)
    p.add_argument('--batch-size', type=int, default=128)
    # a converged teacher + fresh Adam state: low peak lr with warmup, or
    # the early steps wreck the init (measured in docs/distill_results.json:
    # lr 2e-4 took stage-1 loss 0.26 -> 0.30 and V+C down 16 points)
    p.add_argument('--lr', type=float, default=5e-5)
    p.add_argument('--warmup', type=int, default=100)
    p.add_argument('--scan-chunk', type=int, default=25,
                   help='distill steps fused into one lax.scan program')
    p.add_argument('--save-students', type=str, default='all',
                   help="comma-separated student_T values to export as run "
                        "dirs, or 'all'")
    p.add_argument('--out-dir', type=str, default='models/distilled')
    p.add_argument('--results', type=str, default=None,
                   help='write per-stage loss trajectories to this JSON')
    p.add_argument('--seed', type=int, default=11)
    return p


def _auto_stages(grid: int, floor: int = 8):
    stages, t = [], grid // 2
    while t >= floor and grid % (2 * t) == 0:
        stages.append(t)
        t //= 2
    return stages


def save_student_run(cfg, student_T: int, grid: int, params, out_dir: str,
                     step: int):
    """Write one student as a run dir every sampling CLI accepts via --run."""
    from difflinker_tpu.io.checkpoints import CheckpointManager, save_config

    student_cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
        cfg.diffusion, timesteps=student_T, schedule_timesteps=grid,
        sampler='ddim', resample_steps=1))
    run_dir = os.path.join(out_dir, f'student_T{student_T}')
    os.makedirs(run_dir, exist_ok=True)
    save_config(student_cfg, run_dir)
    mgr = CheckpointManager(run_dir)
    mgr.save(step, {'params': params})
    mgr.close()
    return run_dir


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from difflinker_tpu.cli.sample import load_model
    from difflinker_tpu.data.datasets import LinkerDataset, synthetic_dataset
    from difflinker_tpu.train.distill import Distiller, run_distill_stage

    common.enable_compilation_cache()
    cfg, teacher_params = load_model(args)
    grid = cfg.diffusion.schedule_timesteps or cfg.diffusion.timesteps
    if args.stages == 'auto':
        stages = _auto_stages(grid)
        if not stages:
            raise SystemExit(
                f'trained grid T={grid} cannot halve onto shared grid '
                f'points; retrain at a power-of-two T (e.g. 512)')
    else:
        stages = [int(s) for s in args.stages.split(',')]
    save_set = (set(stages) if args.save_students == 'all'
                else {int(s) for s in args.save_students.split(',') if s})
    common.log(f'distilling grid T={grid} through stages {stages}')

    if args.synthetic:
        ds = synthetic_dataset(args.synthetic, seed=0,
                               is_geom=cfg.data.is_geom)
    elif args.data and args.prefix:
        ds = LinkerDataset.from_pt(args.data, args.prefix)
    else:
        raise SystemExit('pass --data/--prefix or --synthetic N')

    results = {'grid': grid, 'stages': []}
    current = teacher_params
    for student_T in stages:
        common.log(f'--- stage: T={2 * student_T} -> {student_T} ---')
        d = Distiller(cfg.model, cfg.diffusion, student_T)
        try:
            student, stats = run_distill_stage(
                cfg, d, current, ds, steps_per_stage=args.steps_per_stage,
                batch_size=args.batch_size, lr=args.lr, warmup=args.warmup,
                scan_chunk=args.scan_chunk, seed=args.seed)
        except ValueError as e:
            raise SystemExit(str(e))

        row = {'student_T': student_T,
               'loss_first': round(stats['loss_first'], 6),
               'loss_last': round(stats['loss_last'], 6),
               'steps': stats['steps'],
               'train_s': round(stats['train_s'], 1)}
        if student_T in save_set:
            row['run_dir'] = save_student_run(
                cfg, student_T, grid, student, args.out_dir,
                step=args.steps_per_stage)
            common.log(f'saved {row["run_dir"]}')
        results['stages'].append(row)
        common.log(json.dumps(row))
        current = student
        if args.results:
            with open(args.results, 'w') as f:
                json.dump(results, f, indent=2)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
