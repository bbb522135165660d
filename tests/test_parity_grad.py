"""Training-step numerics parity vs the torch reference: gradients, the
AdamW(amsgrad) optimizer update, and a 10-step lockstep training trajectory.

Every other parity test is forward-only (torch.no_grad throughout
test_parity_egnn.py / test_parity_edm.py); these pin the backward pass and the
optimizer so a sign flip, a missed stop-gradient, or an optax-vs-torch
bias-correction ordering cannot train differently while passing the suite.
Reference: loss composition src/lightning.py:148-209, optimizer
src/lightning.py:465-466 (AdamW lr, amsgrad=True, weight_decay=1e-12).
"""
import sys
from unittest import mock

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_stubs  # noqa: E402

reference_stubs.install()  # rdkit/pl/wandb stubs: src.lightning is importable

from src.noise import GammaNetwork as TorchGammaNetwork  # noqa: E402
from src.egnn import Dynamics as TorchDynamics  # noqa: E402
from src.edm import EDM as TorchEDM  # noqa: E402
from src.lightning import DDPM as TorchDDPM  # noqa: E402
from src.linker_size import SizeGNN as TorchSizeGNN  # noqa: E402

from difflinker_tpu.config import (  # noqa: E402
    DataConfig, DiffusionConfig, ExperimentConfig, ModelConfig, TrainConfig)
from difflinker_tpu.diffusion.edm import EDM  # noqa: E402
from difflinker_tpu.io.lightning_import import (  # noqa: E402
    convert_dynamics, convert_gamma_network, convert_size_gnn)
from difflinker_tpu.models.size_gnn import SizePredictor  # noqa: E402
from difflinker_tpu.train.optim import adamw_amsgrad  # noqa: E402
from difflinker_tpu.train.trainer import Trainer  # noqa: E402

from conftest import make_batch  # noqa: E402
from test_parity_edm import _build_pair, _NoiseRecorder  # noqa: E402


def _tree_allclose(got, ref, rtol, atol, what=''):
    def check(path, g, r):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=rtol, atol=atol,
            err_msg=f'{what} at {jax.tree_util.keystr(path)}')
    jax.tree_util.tree_map_with_path(check, got, ref)


def _tree_relnorm_close(got, ref, rel, abs_floor=0.0, what=''):
    """Per-leaf ‖g−r‖ ≤ rel·‖r‖ + abs_floor — the right criterion when fp32
    accumulation-order noise is amplified by large loss scale factors
    (e.g. the vlb's T·(SNR−1)·error_t weighting) but the gradient as a
    vector must still agree. `abs_floor` covers cancellation-limited leaves:
    e.g. the GammaNetwork l1.bias grad is a near-total cancellation of
    ±40-magnitude contributions (f64 truth −0.0806; torch f32 gives −0.0938
    and jax f32 −0.0625, both ~0.02 of fp32 noise around it — measured)."""
    def check(path, g, r):
        g, r = np.asarray(g, np.float64), np.asarray(r, np.float64)
        err = np.linalg.norm(g - r)
        bound = rel * np.linalg.norm(r) + abs_floor
        assert err <= bound, (f'{what} at {jax.tree_util.keystr(path)}: '
                              f'norm err {err:.2e} > {bound:.2e}')
    jax.tree_util.tree_map_with_path(check, got, ref)


def _torch_grads(module):
    return {name: p.grad for name, p in module.named_parameters()}


def _pin_noise(jedm, records):
    """Make our EDM replay the torch noise draws: records come in [x, h]
    pairs per sample_noise call (see test_parity_edm._NoiseRecorder)."""
    pairs = [np.concatenate([records[i], records[i + 1]], axis=-1)
             for i in range(0, len(records), 2)]
    it = iter(pairs)
    jedm.sample_noise = lambda key, shape_bn, mask: jnp.asarray(next(it))
    return pairs


# ---------------------------------------------------------------------------
# Pure optimizer parity
# ---------------------------------------------------------------------------

def test_adamw_amsgrad_multistep_parity():
    """50 optimizer steps on synthetic grads: torch AdamW(amsgrad) vs our
    scale_by_amsgrad_torch chain, bitwise-tight. (optax.scale_by_amsgrad
    maxes the bias-CORRECTED second moment and drifts ~1e-4 by step 10;
    train/optim.py docstring.)"""
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(64).astype(np.float32)
    grads = [rng.standard_normal(64).astype(np.float32) for _ in range(50)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.AdamW([tp], lr=2e-4, amsgrad=True, weight_decay=1e-12)
    for g in grads:
        tp.grad = torch.tensor(g)
        opt.step()

    tx = adamw_amsgrad(2e-4, 1e-12, True)
    params = jnp.asarray(p0.copy())
    st = tx.init(params)
    for g in grads:
        u, st = tx.update(jnp.asarray(g), st, params)
        params = params + u
    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# EDM l2-loss gradients + one optimizer step
# ---------------------------------------------------------------------------

def _l2_grad_pair(rng):
    """Shared setup: torch l2 loss backward vs jax.grad on converted weights,
    pinned t and noise. Returns (tdyn, ref_grads_tree, jax_grads, params)."""
    T = 50
    tedm, jedm, params = _build_pair(T=T)
    batch = make_batch(rng, B=4, N=12, nf=8, n_frag=5, n_real=10)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)
    B, N = batch['positions'].shape[:2]

    # spread of t incl. the t=0 row (exercises the L0 branch in the graph)
    t_int = np.array([[0.0], [17.0], [33.0], [50.0]], np.float32)
    rec = _NoiseRecorder(5)

    with mock.patch('src.utils.sample_gaussian_with_mask', rec.torch_gaussian), \
         mock.patch('src.edm.torch.randint',
                    lambda lo, hi, size, device=None: torch.tensor(t_int)):
        terms = tedm.forward(
            x=torch.tensor(batch['positions']),
            h=torch.tensor(batch['one_hot']),
            node_mask=torch.tensor(batch['atom_mask']),
            fragment_mask=torch.tensor(batch['fragment_mask']),
            linker_mask=torch.tensor(batch['linker_mask']),
            edge_mask=torch.tensor(batch['edge_mask'].reshape(B * N * N, 1)),
            context=torch.tensor(context))
    l2_loss = terms[4]
    l2_loss.backward()
    tdyn = tedm.dynamics
    ref = convert_dynamics(_torch_grads(tdyn), '', model='egnn_dynamics',
                           n_layers=2, inv_sublayers=2, attention=False)

    _pin_noise(jedm, rec.records)

    def loss_of(p):
        with mock.patch('jax.random.randint',
                        lambda key, shape, lo, hi: jnp.asarray(t_int)):
            out = jedm.loss(
                p, jax.random.PRNGKey(0), jnp.asarray(batch['positions']),
                jnp.asarray(batch['one_hot']), jnp.asarray(batch['atom_mask']),
                jnp.asarray(batch['fragment_mask']),
                jnp.asarray(batch['linker_mask']),
                jnp.asarray(batch['edge_mask']), jnp.asarray(context))
        return out['l2_loss']

    grads = jax.grad(loss_of)(params)
    return tedm, ref, grads, params


def test_edm_l2_grad_parity(rng):
    """Every param-leaf gradient of the l2 training loss matches
    loss.backward() on the reference (fp32, converted weights)."""
    _, ref, grads, _ = _l2_grad_pair(rng)
    _tree_allclose(grads['dynamics'], ref, rtol=5e-3, atol=2e-6,
                   what='l2 grad')


def test_edm_l2_optimizer_step_parity(rng):
    """One torch AdamW(amsgrad, wd=1e-12) step on the real l2 gradients vs
    one optax update: the updated parameters must match."""
    tedm, _, grads, params = _l2_grad_pair(rng)
    opt = torch.optim.AdamW(tedm.parameters(), lr=2e-4, amsgrad=True,
                            weight_decay=1e-12)
    opt.step()
    ref_new = convert_dynamics(
        tedm.dynamics.state_dict(), '', model='egnn_dynamics', n_layers=2,
        inv_sublayers=2, attention=False)

    tx = adamw_amsgrad(2e-4, 1e-12, True)
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    _tree_allclose(new['dynamics'], ref_new, rtol=1e-5, atol=2e-6,
                   what='post-step param')


# ---------------------------------------------------------------------------
# vlb loss + learned GammaNetwork gradients
# ---------------------------------------------------------------------------

def test_edm_vlb_gamma_grad_parity(rng):
    """vlb-loss gradients through the learned GammaNetwork AND the dynamics:
    loss = kl_prior + loss_term_t + loss_term_0 - delta_log_px
    (src/lightning.py:202-209) with pinned t (incl. t=0) and noise."""
    T = 50
    mcfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                       n_layers=2, norm_constant=1e-6)
    dcfg = DiffusionConfig(timesteps=T, noise_schedule='learned',
                           loss_type='vlb', norm_values=(1.0, 4.0, 10.0))
    torch.manual_seed(13)
    tdyn = TorchDynamics(
        n_dims=3, in_node_nf=8, context_node_nf=2, hidden_nf=32,
        activation=torch.nn.SiLU(), n_layers=2, attention=False,
        condition_time=True, tanh=False, norm_constant=1e-6, inv_sublayers=2,
        sin_embedding=False, normalization_factor=100,
        aggregation_method='sum', model='egnn_dynamics')
    tedm = TorchEDM(dynamics=tdyn, in_node_nf=8, n_dims=3, timesteps=T,
                    noise_schedule='learned', noise_precision=1e-5,
                    loss_type='vlb', norm_values=(1.0, 4.0, 10.0),
                    norm_biases=(None, 0.0, 0.0))
    assert isinstance(tedm.gamma, TorchGammaNetwork)

    jedm = EDM(mcfg, dcfg)
    params = {
        'dynamics': convert_dynamics(tdyn.state_dict(), '',
                                     model='egnn_dynamics', n_layers=2,
                                     inv_sublayers=2, attention=False),
        'gamma': convert_gamma_network(tedm.gamma.state_dict(), ''),
    }

    batch = make_batch(rng, B=4, N=12, nf=8, n_frag=5, n_real=10)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)
    B, N = batch['positions'].shape[:2]
    t_int = np.array([[0.0], [9.0], [25.0], [50.0]], np.float32)
    rec = _NoiseRecorder(7)

    with mock.patch('src.utils.sample_gaussian_with_mask', rec.torch_gaussian), \
         mock.patch('src.edm.torch.randint',
                    lambda lo, hi, size, device=None: torch.tensor(t_int)):
        terms = tedm.forward(
            x=torch.tensor(batch['positions']),
            h=torch.tensor(batch['one_hot']),
            node_mask=torch.tensor(batch['atom_mask']),
            fragment_mask=torch.tensor(batch['fragment_mask']),
            linker_mask=torch.tensor(batch['linker_mask']),
            edge_mask=torch.tensor(batch['edge_mask'].reshape(B * N * N, 1)),
            context=torch.tensor(context))
    delta_log_px, kl_prior, loss_term_t, loss_term_0 = terms[:4]
    vlb = kl_prior + loss_term_t + loss_term_0 - delta_log_px
    vlb.backward()
    ref_dyn = convert_dynamics(_torch_grads(tdyn), '', model='egnn_dynamics',
                               n_layers=2, inv_sublayers=2, attention=False)
    ref_gamma = convert_gamma_network(_torch_grads(tedm.gamma), '')

    _pin_noise(jedm, rec.records)

    def loss_of(p):
        with mock.patch('jax.random.randint',
                        lambda key, shape, lo, hi: jnp.asarray(t_int)):
            out = jedm.loss(
                p, jax.random.PRNGKey(0), jnp.asarray(batch['positions']),
                jnp.asarray(batch['one_hot']), jnp.asarray(batch['atom_mask']),
                jnp.asarray(batch['fragment_mask']),
                jnp.asarray(batch['linker_mask']),
                jnp.asarray(batch['edge_mask']), jnp.asarray(context))
        return out['vlb_loss']

    grads = jax.grad(loss_of)(params)
    # vlb magnitudes are ~1e2-1e3 (T·(SNR−1)·error_t), so elementwise fp32
    # noise is amplified — bound the per-leaf relative norm error instead
    _tree_relnorm_close(grads['dynamics'], ref_dyn, rel=2e-3, abs_floor=0.01,
                        what='vlb dynamics grad')
    # The scalar l1 leaves of the gamma net are cancellation-limited at fp32
    # in BOTH frameworks (measured: l1.w f64 truth +0.047, torch f32 −0.207,
    # jax f32 +0.127 — torch's own fp32 noise exceeds the true value 5×), so
    # per-leaf bounds are meaningless there. Check the gamma gradient as one
    # flattened vector (norm dominated by the well-conditioned gamma_0/
    # gamma_1 leaves, ±40) plus a per-leaf floor at the measured noise scale.
    g_all = np.concatenate([np.asarray(l, np.float64).ravel()
                            for l in jax.tree.leaves(grads['gamma'])])
    r_all = np.concatenate([np.asarray(l, np.float64).ravel()
                            for l in jax.tree.leaves(ref_gamma)])
    assert np.linalg.norm(g_all - r_all) < 1e-2 * np.linalg.norm(r_all)
    _tree_relnorm_close(grads['gamma'], ref_gamma, rel=2e-3, abs_floor=0.5,
                        what='vlb gamma grad')


# ---------------------------------------------------------------------------
# SizeGNN train-mode BatchNorm gradients
# ---------------------------------------------------------------------------

def test_size_gnn_train_bn_grad_parity(rng):
    """Cross-entropy gradients through TRAIN-mode BatchNorm (batch statistics
    over all B·N rows incl. padding, src/egnn.py:31-38): torch backward vs
    jax.grad on the converted SizeGNN."""
    from difflinker_tpu.data.collate import reference_edge_mask
    from src.egnn import coord2diff as torch_coord2diff
    from torch.nn.functional import cross_entropy

    batch = make_batch(rng, B=4, N=12, nf=8, n_frag=6, n_real=10)
    batch['edge_mask'] = reference_edge_mask(batch['fragment_mask'][..., 0])
    B, N = batch['positions'].shape[:2]

    torch.manual_seed(21)
    tmodel = TorchSizeGNN(in_node_nf=8, hidden_nf=16, out_node_nf=10,
                          n_layers=2, normalization='batch_norm').train()
    params, state = convert_size_gnn(tmodel.state_dict(), '', n_layers=2)

    # torch forward mirroring SizeClassifier.forward (linker_size_lightning
    # .py:83-113): fragment-masked inputs, <6A distance edges, mean-pool, CE
    x = torch.tensor(batch['positions'] * batch['fragment_mask']).view(B * N, -1)
    h = torch.tensor(batch['one_hot'] * batch['fragment_mask']).view(B * N, -1)
    frag = torch.tensor(batch['fragment_mask']).view(B * N, 1)
    edge_mask = torch.tensor(batch['edge_mask'].reshape(B * N * N, 1))
    rows = [i + b * N for b in range(B) for i in range(N) for _ in range(N)]
    cols = [j + b * N for b in range(B) for _ in range(N) for j in range(N)]
    edges = [torch.LongTensor(rows), torch.LongTensor(cols)]
    distances, _ = torch_coord2diff(x, edges)
    dist_edge_mask = (edge_mask.bool() & (distances < 6)).long()
    out = tmodel.forward(h, edges, distances, frag, dist_edge_mask)
    logits = out.view(B, N, -1).mean(1)
    labels = torch.tensor([2, 3, 4, 5])
    loss = cross_entropy(logits, labels)
    loss.backward()
    gsd = _torch_grads(tmodel)
    # BN running stats are buffers, not parameters — pad with zeros so the
    # grad mapping has the full state_dict key set the converter expects
    for n, b in tmodel.named_buffers():
        gsd[n] = torch.zeros_like(b)
    ref, _ = convert_size_gnn(gsd, '', n_layers=2)

    pred = SizePredictor(in_node_nf=8, hidden_nf=16, out_node_nf=10, n_layers=2)

    def loss_of(p):
        logits, _ = pred.forward(p, batch, state=state, train=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, jnp.asarray([2, 3, 4, 5])[:, None], axis=1))

    jloss, grads = jax.value_and_grad(loss_of)(params)
    np.testing.assert_allclose(float(jloss), float(loss.detach()), rtol=1e-4)
    _tree_allclose(grads, ref, rtol=5e-3, atol=2e-6, what='size-gnn grad')


# ---------------------------------------------------------------------------
# Lockstep 10-step training trajectory (full composition)
# ---------------------------------------------------------------------------

def test_lockstep_training_trajectory(rng):
    """10 full training steps with identical init/batches/t/noise: the
    reference DDPM module (manual Lightning loop: forward -> loss ->
    backward -> AdamW step, src/lightning.py:148-209,465-466) vs our Trainer.
    Pins the whole composition — context assembly, fragment-CoM removal,
    t-sampling, normalization, gradient, optimizer — per-step losses and the
    final parameters must track."""
    T = 50
    n_steps = 10
    tddpm = TorchDDPM(
        in_node_nf=8, n_dims=3, context_node_nf=2, hidden_nf=32,
        activation='silu', tanh=False, n_layers=2, attention=False,
        norm_constant=1.0, inv_sublayers=2, sin_embedding=False,
        normalization_factor=100, aggregation_method='sum',
        diffusion_steps=T, diffusion_noise_schedule='polynomial_2',
        diffusion_noise_precision=1e-5, diffusion_loss_type='l2',
        normalize_factors=[1, 4, 10], include_charges=False,
        model='egnn_dynamics', data_path='unused',
        train_data_prefix='zinc_final_train', val_data_prefix='zinc_final_val',
        batch_size=4, lr=2e-4, torch_device='cpu', test_epochs=1,
        n_stability_samples=1, center_of_mass='fragments',
        anchors_context=True, data_augmentation=False)

    cfg = ExperimentConfig(
        model=ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                          n_layers=2, norm_constant=1.0),
        diffusion=DiffusionConfig(timesteps=T, noise_schedule='polynomial_2',
                                  noise_precision=1e-5, loss_type='l2',
                                  norm_values=(1.0, 4.0, 10.0)),
        data=DataConfig(), train=TrainConfig(lr=2e-4))
    trainer = Trainer(cfg)
    params0 = {'dynamics': convert_dynamics(
        tddpm.state_dict(), 'edm.dynamics', model='egnn_dynamics',
        n_layers=2, inv_sublayers=2, attention=False)}
    state = {'params': params0, 'opt_state': trainer.tx.init(params0),
             'step': jnp.zeros((), jnp.int32)}

    batches = [make_batch(np.random.default_rng(100 + i),
                          B=4, N=12, nf=8, n_frag=5, n_real=10)
               for i in range(n_steps)]
    ts = [np.asarray(np.random.default_rng(200 + i).integers(0, T + 1, (4, 1)),
                     np.float32) for i in range(n_steps)]

    # --- torch loop ---------------------------------------------------------
    opt = tddpm.configure_optimizers()
    rec = _NoiseRecorder(31)
    ref_losses = []
    B, N = 4, 12
    for i in range(n_steps):
        data = {k: torch.tensor(v) for k, v in batches[i].items()}
        data['edge_mask'] = torch.tensor(
            batches[i]['edge_mask'].reshape(B * N * N, 1))
        with mock.patch('src.utils.sample_gaussian_with_mask',
                        rec.torch_gaussian), \
             mock.patch('src.edm.torch.randint',
                        lambda lo, hi, size, device=None, t=ts[i]:
                        torch.tensor(t)):
            metrics = tddpm.training_step(data)
        opt.zero_grad()
        metrics['loss'].backward()
        opt.step()
        ref_losses.append(float(metrics['loss']))

    noise_pairs = [np.concatenate([rec.records[2 * i], rec.records[2 * i + 1]],
                                  axis=-1) for i in range(n_steps)]

    # --- our loop ------------------------------------------------------------
    got_losses = []
    for i in range(n_steps):
        trainer.edm.sample_noise = \
            lambda key, shape_bn, mask, eps=noise_pairs[i]: jnp.asarray(eps)
        jbatch = {k: jnp.asarray(v) for k, v in batches[i].items()}
        with mock.patch('jax.random.randint',
                        lambda key, shape, lo, hi, t=ts[i]: jnp.asarray(t)):
            state, metrics = trainer.train_step(
                state, jbatch, jax.random.PRNGKey(i))
        got_losses.append(float(metrics['loss']))

    np.testing.assert_allclose(got_losses, ref_losses, rtol=2e-4, atol=2e-5)

    ref_final = convert_dynamics(
        tddpm.state_dict(), 'edm.dynamics', model='egnn_dynamics',
        n_layers=2, inv_sublayers=2, attention=False)
    _tree_allclose(state['params']['dynamics'], ref_final,
                   rtol=1e-4, atol=5e-6, what='final param after 10 steps')
