"""Progressive step distillation: target algebra, loss mechanics, and a
stage actually compressing a chain (train/distill.py)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from difflinker_tpu.config import (DataConfig, DiffusionConfig,
                                   ExperimentConfig, ModelConfig, TrainConfig)
from difflinker_tpu.diffusion import schedules
from difflinker_tpu.diffusion.edm import make_edm
from difflinker_tpu.train.distill import Distiller, ddim_distill_targets

from conftest import make_batch


def test_ddim_distill_targets_algebra(rng):
    """The defining property: one DDIM step using the recovered
    (x_hat, eps_hat) from z_t lands exactly on z_target, and the pair is
    consistent with z_t."""
    table = jnp.asarray(schedules.gamma_lookup_table('polynomial_2', 16, 1e-5))
    g_t = schedules.gamma_from_table(table, jnp.full((4, 1), 0.5), 16)
    g_s = schedules.gamma_from_table(table, jnp.full((4, 1), 0.375), 16)
    g_t = g_t[:, :, None]
    g_s = g_s[:, :, None]
    z_t = jnp.asarray(rng.standard_normal((4, 6, 11)), jnp.float32)
    z_pp = jnp.asarray(rng.standard_normal((4, 6, 11)), jnp.float32)
    x, eps = ddim_distill_targets(z_t, z_pp, g_t, g_s)
    a_t = schedules.alpha_from_gamma(g_t)
    s_t = schedules.sigma_from_gamma(g_t)
    a_s = schedules.alpha_from_gamma(g_s)
    s_s = schedules.sigma_from_gamma(g_s)
    np.testing.assert_allclose(np.asarray(a_t * x + s_t * eps),
                               np.asarray(z_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_s * x + s_s * eps),
                               np.asarray(z_pp), atol=1e-5)


@pytest.fixture(scope='module')
def setup():
    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=16,
                          n_layers=1, norm_constant=1e-6),
        diffusion=DiffusionConfig(timesteps=16),
        data=DataConfig(),
        train=TrainConfig(batch_size=4),
    )
    edm = make_edm(cfg.model, cfg.diffusion)
    teacher_params = edm.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=4, N=12, n_frag=5, n_real=10)
    return cfg, teacher_params, batch


def _loss_args(batch):
    ctx = jnp.concatenate([jnp.asarray(batch['anchors']),
                           jnp.asarray(batch['fragment_mask'])], -1)
    return (jnp.asarray(batch['positions']), jnp.asarray(batch['one_hot']),
            jnp.asarray(batch['atom_mask']),
            jnp.asarray(batch['fragment_mask']),
            jnp.asarray(batch['linker_mask']),
            jnp.asarray(batch['edge_mask']), ctx)


def test_distiller_grid_alignment_guard(setup):
    cfg, _, _ = setup
    with pytest.raises(ValueError, match='divisible'):
        Distiller(cfg.model, cfg.diffusion, student_T=3)
    with pytest.raises(ValueError, match='divisible'):
        Distiller(cfg.model, cfg.diffusion, student_T=16)
    Distiller(cfg.model, cfg.diffusion, student_T=8)  # 2*8 == grid: ok


def test_distill_loss_runs_and_is_finite(setup):
    cfg, teacher_params, batch = setup
    d = Distiller(cfg.model, cfg.diffusion, student_T=8)
    sp = d.init_student(teacher_params)
    out = jax.jit(d.distill_loss)(sp, teacher_params, jax.random.PRNGKey(1),
                                  *_loss_args(batch))
    assert np.isfinite(float(out['loss']))
    assert not np.asarray(out['nan_flag']).any()
    g = jax.grad(lambda p: d.distill_loss(
        p, teacher_params, jax.random.PRNGKey(1),
        *_loss_args(batch))['loss'])(sp)
    gn = float(optax.global_norm(g))
    assert np.isfinite(gn) and gn > 0


def test_distillation_stage_reduces_loss(setup):
    """A few optimizer steps on a tiny model measurably shrink the
    student-teacher gap (the stage mechanism works end to end)."""
    cfg, teacher_params, batch = setup
    d = Distiller(cfg.model, cfg.diffusion, student_T=8)
    sp = d.init_student(teacher_params)
    tx = optax.adam(1e-3)
    opt = tx.init(sp)
    args = _loss_args(batch)

    @jax.jit
    def step(sp, opt, key):
        loss, g = jax.value_and_grad(
            lambda p: d.distill_loss(p, teacher_params, key,
                                     *args)['loss'])(sp)
        upd, opt = tx.update(g, opt, sp)
        return optax.apply_updates(sp, upd), opt, loss

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(30):
        sp, opt, loss = step(sp, opt, jax.random.fold_in(key, i % 4))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_student_chain_runs_at_half_steps(setup):
    """The distilled student samples a full chain at T/2 with the shared
    trained grid; fragments frozen, outputs finite."""
    cfg, teacher_params, batch = setup
    d = Distiller(cfg.model, cfg.diffusion, student_T=8)
    sp = d.init_student(teacher_params)
    args = _loss_args(batch)
    xs, hs, nan = jax.jit(lambda p, k: d.student.sample_chain(
        p, k, *args))(sp, jax.random.PRNGKey(3))
    assert not np.asarray(nan).any()
    assert np.isfinite(np.asarray(xs)).all()
    fm = np.asarray(batch['fragment_mask'])[..., 0].astype(bool)
    np.testing.assert_allclose(np.asarray(xs)[fm],
                               np.asarray(batch['positions'])[fm], atol=1e-5)


def test_distiller_forces_deterministic_teacher(setup):
    """RePaint repeats would inject noise between the teacher's two DDIM
    transitions, silently making the deterministic target stochastic — the
    Distiller must force resample_steps=1 on both EDMs (ADVICE r4)."""
    cfg, _, _ = setup
    noisy = dataclasses.replace(cfg.diffusion, resample_steps=3)
    d = Distiller(cfg.model, noisy, student_T=8)
    assert d.teacher.cfg.resample_steps == 1
    assert d.student.cfg.resample_steps == 1
    assert d.teacher.cfg.sampler == 'ddim'
