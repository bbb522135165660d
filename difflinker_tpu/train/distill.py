"""Progressive step distillation (Salimans & Ho 2022) for linker EDMs.

Halves the reverse-chain length per stage: a student with T steps learns to
reproduce, in ONE deterministic DDIM update, the result of its teacher's TWO
DDIM updates on a 2T-step grid. Iterating stages turns a T=500-trained model
into an 8-16-step sampler — sampling cost is exactly O(T), so this is the
~30-60x serving-throughput lever once plain respacing (quality flat only to
T~50, BASELINE.md) runs out.

Both models read gamma off the SAME trained schedule grid
(DiffusionConfig.schedule_timesteps, the exact-subsequence respacing
machinery): the student's step i sits on the identical grid point as the
teacher's step 2i, so the two-step target is well-defined without schedule
drift. The dynamics stay epsilon-parametrized (checkpoint compatibility);
the distillation loss is computed in x-hat space with the truncated-SNR
weight max(alpha^2/sigma^2, 1) the paper prescribes, which keeps the target
well-conditioned as t -> 0 where epsilon-space targets blow up.

No reference counterpart (the reference always samples its full training T,
src/edm.py:146-163); this is TPU-serving headroom beyond parity.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from difflinker_tpu.config import DiffusionConfig, ModelConfig, resolve_remat
from difflinker_tpu.diffusion import schedules
from difflinker_tpu.diffusion.edm import EDM, _inflate
from difflinker_tpu.models.dynamics import dynamics_apply
from difflinker_tpu.ops import geometry


def ddim_distill_targets(z_t, z_target, gamma_t, gamma_s):
    """Solve for the (x_hat, eps_hat) pair whose single DDIM step from z_t
    lands exactly on z_target.

    DDIM: z_s = alpha_s*x + sigma_s*eps with z_t = alpha_t*x + sigma_t*eps.
    Eliminating eps:  x = (z_target - (sigma_s/sigma_t)*z_t)
                          / (alpha_s - sigma_s*alpha_t/sigma_t).
    The denominator is positive whenever SNR(s) > SNR(t), i.e. on every
    forward-noising schedule.
    """
    alpha_t = schedules.alpha_from_gamma(gamma_t)
    sigma_t = schedules.sigma_from_gamma(gamma_t)
    alpha_s = schedules.alpha_from_gamma(gamma_s)
    sigma_s = schedules.sigma_from_gamma(gamma_s)
    denom = alpha_s - sigma_s * alpha_t / sigma_t
    x = (z_target - (sigma_s / sigma_t) * z_t) / denom
    eps = (z_t - alpha_t * x) / sigma_t
    return x, eps


class Distiller:
    """One halving stage: teacher at 2T steps -> student at T steps.

    Both EDMs carry the trained gamma grid via schedule_timesteps; the
    teacher runs the DDIM integrator (cfg.sampler='ddim'). Student params
    should be initialised to the teacher's (`init_student`).
    """

    def __init__(self, model_cfg: ModelConfig, diff_cfg: DiffusionConfig,
                 student_T: int):
        if diff_cfg.inpainting:
            raise ValueError('distillation supports the masked-linker EDM')
        grid = diff_cfg.schedule_timesteps or diff_cfg.timesteps
        if (2 * student_T > grid or grid % (2 * student_T) != 0):
            raise ValueError(
                f'student_T={student_T}: the trained grid ({grid}) must be '
                f'divisible by 2*student_T so teacher and student steps sit '
                f'on shared grid points')
        self.mcfg = model_cfg
        self.student_T = student_T
        # resample_steps is forced to 1: with RePaint repeats the teacher's
        # sample_step injects noise BETWEEN repeats even under sampler='ddim',
        # which would silently make the deterministic two-step target
        # stochastic and bias the regression.
        self.student = EDM(model_cfg, dataclasses.replace(
            diff_cfg, timesteps=student_T, schedule_timesteps=grid,
            sampler='ddim', resample_steps=1))
        self.teacher = EDM(model_cfg, dataclasses.replace(
            diff_cfg, timesteps=2 * student_T, schedule_timesteps=grid,
            sampler='ddim', resample_steps=1))

    @staticmethod
    def init_student(teacher_params) -> Dict:
        return jax.tree.map(jnp.copy, teacher_params)

    def distill_loss(self, student_params, teacher_params, key, x, h,
                     node_mask, fragment_mask, linker_mask, edge_mask,
                     context=None, sample_weight=None):
        """One-step-student vs two-step-teacher x-hat regression.

        Draws t uniformly over the student's grid points {1..T}, forms
        z_t = alpha_t*x + sigma_t*eps on linker rows (fragments frozen, as
        the EDM loss does), runs the teacher's two DDIM transitions
        2t -> 2t-1 -> 2t-2 on its grid, and regresses the student's implied
        x-hat onto the teacher target with the truncated-SNR weight.
        """
        bs, n_nodes = x.shape[0], x.shape[1]
        kt, keps = jax.random.split(key)
        w = (jnp.ones((bs,), x.dtype) if sample_weight is None
             else jnp.asarray(sample_weight, x.dtype).reshape(bs))

        xn, hn = self.student.normalize(x, h)
        xh = jnp.concatenate([xn, hn], axis=-1)

        # student timestep t_int in [1, T]; teacher indices 2t, 2t-1, 2t-2
        t_int = jax.random.randint(kt, (bs, 1), 1,
                                   self.student_T + 1).astype(jnp.float32)
        t = t_int / self.student_T
        s = (t_int - 1.0) / self.student_T

        gamma_t = _inflate(self.student.gamma(student_params, t), xh.ndim)
        gamma_s = _inflate(self.student.gamma(student_params, s), xh.ndim)
        alpha_t = schedules.alpha_from_gamma(gamma_t)
        sigma_t = schedules.sigma_from_gamma(gamma_t)

        eps = self.student.sample_noise(keps, (bs, n_nodes), linker_mask)
        z_t = alpha_t * xh + sigma_t * eps
        z_t = xh * fragment_mask + z_t * linker_mask

        # teacher: two DDIM transitions on the 2T grid (keys unused: ddim)
        step_args = (node_mask, fragment_mask, linker_mask, edge_mask,
                     context)
        t2 = 2.0 * t_int
        z_mid, nan1 = self.teacher.sample_step(
            teacher_params, key, t2 - 1.0, z_t, *step_args)
        z_pp, nan2 = self.teacher.sample_step(
            teacher_params, key, t2 - 2.0, z_mid, *step_args)
        z_pp = jax.lax.stop_gradient(z_pp)

        x_target, _ = ddim_distill_targets(z_t, z_pp, gamma_t, gamma_s)
        x_target = jax.lax.stop_gradient(x_target * linker_mask)

        eps_hat, nan3 = dynamics_apply(
            student_params['dynamics'], t, z_t, node_mask, linker_mask,
            edge_mask, context, cfg=self.mcfg,
            remat=resolve_remat(self.mcfg, z_t.shape))
        x_hat = (z_t - sigma_t * eps_hat * linker_mask) / alpha_t
        x_hat = x_hat * linker_mask

        snr_w = jnp.maximum(jnp.exp(-gamma_t), 1.0)  # max(alpha^2/sigma^2, 1)
        err = geometry.sum_except_batch(snr_w * (x_hat - x_target) ** 2)
        norm = ((self.student.n_dims + self.student.in_node_nf)
                * geometry.numbers_of_nodes(linker_mask))
        loss_each = err / norm
        loss = jnp.sum(loss_each * w) / jnp.maximum(jnp.sum(w), 1.0)
        return {'loss': loss, 'nan_flag': nan1 | nan2 | nan3}


def run_distill_stage(cfg, distiller: Distiller, teacher_params, ds, *,
                      steps_per_stage: int, batch_size: int, lr: float,
                      warmup: int, scan_chunk: int, seed: int = 11) -> tuple:
    """Train one halving stage (the loop shared by cli.distill and
    scripts/demo_distill): Adam with warmup-cosine onto a fresh optimizer
    state, `scan_chunk` distill steps fused per dispatch, fresh data each
    chunk (the batch enters as a jit argument, not a constant).

    `cfg` is the full ExperimentConfig (context assembly / CoM removal use
    its train+data sections — the Trainer's exact preprocessing; rotation
    aug is free for an E(3)-equivariant denoiser, skipped). Returns
    (student_params, stats) with stats keys loss_first (the stage's actual
    step-1 loss — the early-divergence quantity), loss_last, train_s, steps.
    """
    import time

    import numpy as np
    import optax

    from difflinker_tpu.ops.geometry import fc_edge_mask
    from difflinker_tpu.train.trainer import assemble_context, com_mask_for

    student = distiller.init_student(teacher_params)
    # a converged teacher + fresh Adam state: low peak lr with warmup, or the
    # early steps wreck the init (measured in docs/distill_results.json:
    # lr 2e-4 took stage-1 loss 0.26 -> 0.30 and V+C down 16 points)
    warmup = min(warmup, max(1, steps_per_stage // 4))
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, steps_per_stage))
    opt = tx.init(student)
    st_teacher = teacher_params  # device-resident through the jit closure

    def prepare(batch):
        x = batch['positions']
        node_mask = batch['atom_mask']
        ctx = assemble_context(batch,
                               anchors_context=cfg.train.anchors_context,
                               has_pocket=cfg.data.has_pocket)
        com = com_mask_for(batch, center_of_mass=cfg.train.center_of_mass,
                           has_pocket=cfg.data.has_pocket, inpainting=False)
        x = geometry.remove_partial_mean_with_mask(x, node_mask, com)
        return x, ctx

    @jax.jit
    def run_chunk(st, op, batch, keys):
        def body(carry, key):
            st, op = carry
            x, ctx = prepare(batch)

            def loss_fn(p):
                out = distiller.distill_loss(
                    p, st_teacher, key, x, batch['one_hot'],
                    batch['atom_mask'], batch['fragment_mask'],
                    batch['linker_mask'], batch['edge_mask'], ctx,
                    sample_weight=batch.get('sample_weight'))
                return out['loss']

            loss, g = jax.value_and_grad(loss_fn)(st)
            upd, op2 = tx.update(g, op, st)
            return (optax.apply_updates(st, upd), op2), loss
        (st, op), losses = jax.lax.scan(body, (st, op), keys)
        return st, op, losses

    student_T = distiller.student_T
    key = jax.random.PRNGKey(seed + student_T)
    batch_iter = iter(ds.iter_batches(batch_size, shuffle=True,
                                      seed=student_T, drop_last=True))
    losses_log, loss_first, step, t_stage = [], None, 0, time.time()
    while step < steps_per_stage:
        try:
            batch = next(batch_iter)
        except StopIteration:
            batch_iter = iter(ds.iter_batches(
                batch_size, shuffle=True, seed=student_T + step,
                drop_last=True))
            try:
                batch = next(batch_iter)
            except StopIteration:
                raise ValueError(
                    f'dataset yields no batches at batch_size={batch_size} '
                    f'(drop_last): {len(ds)} molecules — shrink the batch '
                    f'size or grow the dataset')
        # keep numeric tensors only: dataset batches carry id/name sidecars
        # that cannot enter the jit boundary
        batch = {k: v for k, v in batch.items()
                 if hasattr(v, 'dtype')
                 and np.issubdtype(np.asarray(v).dtype, np.number)}
        if 'edge_mask' not in batch:
            batch['edge_mask'] = fc_edge_mask(jnp.asarray(batch['atom_mask']))
        key, kc = jax.random.split(key)
        keys = jax.random.split(kc, scan_chunk)
        student, opt, losses = run_chunk(student, opt, batch, keys)
        step += scan_chunk
        if loss_first is None:
            loss_first = float(losses[0])
        losses_log.append(float(losses[-1]))

    stats = {'loss_first': loss_first, 'loss_last': losses_log[-1],
             'train_s': time.time() - t_stage, 'steps': steps_per_stage}
    return student, stats
