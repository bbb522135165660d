#!/usr/bin/env python
"""Progressive step distillation, measured end to end (VERDICT r4 item 1).

Halves a trained teacher's DDIM chain stage by stage
(train/distill.py, Salimans & Ho 2022): T -> T/2 -> ... -> 8. Each stage
trains a student to reproduce its teacher's TWO DDIM transitions in ONE,
then the student becomes the next stage's teacher. Every stage is scored
with the standard battery (validity / valid+connected / uniqueness on a
synthetic val set) next to the UNDISTILLED baselines at the same step count
(ancestral subsequence respacing and plain DDIM), so the JSON answers the
real question: what does distillation buy over just respacing?

The teacher must be trained on a power-of-two-friendly grid (the stage
constraint is grid % (2*student_T) == 0):

    python scripts/demo_learning.py --hidden 256 --layers 6 --timesteps 512 \
        --train-size 4000 --epochs 1500 --cosine \
        --save-params examples/params/zinc_h256_t512.npz
    python scripts/demo_distill.py --teacher examples/params/zinc_h256_t512.npz

Matches the O(T) sampling-cost regime of the reference
(/root/reference/src/edm.py:146-163 — it always pays T sequential EGNN
forwards); this is TPU-serving headroom beyond parity.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    p = argparse.ArgumentParser()
    p.add_argument('--teacher', default='examples/params/zinc_h256_t512.npz')
    p.add_argument('--stages', default='256,128,64,32,16,8',
                   help='comma-separated student_T per halving stage')
    p.add_argument('--steps-per-stage', type=int, default=2500)
    p.add_argument('--batch-size', type=int, default=128)
    # a converged teacher + fresh Adam state: low peak lr with warmup, or
    # the early steps wreck the init (measured: lr 2e-4 took stage-1 loss
    # 0.26 -> 0.30 and V+C down 16 points)
    p.add_argument('--lr', type=float, default=5e-5)
    p.add_argument('--warmup', type=int, default=100)
    p.add_argument('--train-size', type=int, default=4000)
    p.add_argument('--eval-n', type=int, default=256)
    p.add_argument('--eval-batch', type=int, default=64)
    p.add_argument('--scan-chunk', type=int, default=25,
                   help='distill steps fused into one lax.scan program')
    p.add_argument('--save-students', default='32,16,8',
                   help='student_T values exported as npz (+ sidecar config)')
    p.add_argument('--out', default='docs/distill_results.json')
    args = p.parse_args()

    import dataclasses
    import jax

    from difflinker_tpu.cli import common
    from difflinker_tpu.config import respace_config
    from difflinker_tpu.data.packed import PackedDataset
    from difflinker_tpu.data.synthetic_molecules import synthetic_molecule_dataset
    from difflinker_tpu.demo import load_demo_model, recipe_val_dataset
    from difflinker_tpu.io.checkpoints import save_params_npz
    from difflinker_tpu.sample.sampler import LinkerSampler
    from difflinker_tpu.train.distill import Distiller, run_distill_stage
    from difflinker_tpu.train.evaluation import sample_and_analyze

    common.enable_compilation_cache()
    cfg, teacher_params, meta = load_demo_model(args.teacher,
                                                exp_name='distill')
    grid = cfg.diffusion.schedule_timesteps or cfg.diffusion.timesteps
    stages = [int(s) for s in args.stages.split(',')]
    save_set = {int(s) for s in args.save_students.split(',') if s}
    print(f'teacher: {args.teacher} (grid T={grid}); stages {stages}',
          flush=True)

    train_raw = synthetic_molecule_dataset(args.train_size, seed=0)
    train_ds = PackedDataset(train_raw.samples)
    val_ds = recipe_val_dataset(meta, args.eval_n, seed=1)

    # one sampler per distinct chain program, weights swapped via
    # update_params (jit args — no recompile): the student eval and the
    # undistilled-ddim baseline at the same T share a program, and chain
    # builds through the tunnel cost 150 s+ each (CLAUDE.md)
    _eval_samplers = {}

    def eval_quality(eval_cfg, params, label):
        d = eval_cfg.diffusion
        prog = (d.timesteps, d.schedule_timesteps, d.sampler,
                d.resample_steps, d.noise_scale)
        sampler = _eval_samplers.get(prog)
        if sampler is None:
            sampler = _eval_samplers[prog] = LinkerSampler(
                eval_cfg, params, pad_batch_to=args.eval_batch)
        else:
            sampler = sampler.update_params(params)
        t0 = time.time()
        m = sample_and_analyze(sampler,
                               val_ds.iter_batches(args.eval_batch),
                               jax.random.PRNGKey(7), n_samples=1)
        row = {'label': label,
               'T': eval_cfg.diffusion.timesteps,
               'sampler': eval_cfg.diffusion.sampler,
               'validity': round(m['validity'], 4),
               'validity_and_connectivity':
                   round(m['validity_and_connectivity'], 4),
               'uniqueness': round(m['uniqueness'], 4),
               'eval_s': round(time.time() - t0, 1)}
        print(json.dumps(row), flush=True)
        return row

    results = {'teacher': args.teacher, 'grid': grid, 'stages': [],
               'baselines': []}

    # teacher reference point on its full grid
    results['baselines'].append(eval_quality(cfg, teacher_params,
                                             'teacher_ancestral_T%d' % grid))

    current = teacher_params
    for student_T in stages:
        print(f'--- stage: T={2 * student_T} -> {student_T} ---', flush=True)
        d = Distiller(cfg.model, cfg.diffusion, student_T)
        # the shared scan-chunked stage loop (train/distill.run_distill_stage
        # — the same code cli.distill ships)
        student, stats = run_distill_stage(
            cfg, d, current, train_ds, steps_per_stage=args.steps_per_stage,
            batch_size=args.batch_size, lr=args.lr, warmup=args.warmup,
            scan_chunk=args.scan_chunk)

        # student quality at its step count (ddim, shared trained grid)
        student_cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
            cfg.diffusion, timesteps=student_T, schedule_timesteps=grid,
            sampler='ddim', resample_steps=1))
        row = eval_quality(student_cfg, student, f'student_T{student_T}')
        row.update({'loss_first': round(stats['loss_first'], 5),
                    'loss_last': round(stats['loss_last'], 5),
                    'train_s': round(stats['train_s'], 1),
                    'steps': stats['steps']})

        # undistilled baselines at the SAME step count
        base_ddim = dataclasses.replace(cfg, diffusion=dataclasses.replace(
            cfg.diffusion, timesteps=student_T, schedule_timesteps=grid,
            sampler='ddim', resample_steps=1))
        row['baseline_ddim'] = eval_quality(
            base_ddim, teacher_params, f'undistilled_ddim_T{student_T}')
        base_anc = respace_config(cfg, student_T)
        row['baseline_ancestral'] = eval_quality(
            base_anc, teacher_params, f'undistilled_ancestral_T{student_T}')

        results['stages'].append(row)
        if student_T in save_set:
            out_npz = args.teacher.replace('.npz',
                                           f'_distill_T{student_T}.npz')
            save_params_npz(student, out_npz)
            with open(out_npz + '.config.json', 'w') as f:
                json.dump({**meta, 'timesteps': student_T,
                           'schedule_timesteps': grid, 'sampler': 'ddim',
                           'distilled_from': os.path.basename(args.teacher)},
                          f)
            row['saved'] = out_npz
            print(f'saved {out_npz}', flush=True)
        current = student
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)

    with open(args.out, 'w') as f:
        json.dump(results, f, indent=2)
    print('done ->', args.out, flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
