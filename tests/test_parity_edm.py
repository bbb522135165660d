"""Golden parity tests for the diffusion layer: schedules, gamma algebra, the
reverse-sampling step and the 7-term training loss must match the torch
reference when t and ε are pinned to the same values."""
import sys
from unittest import mock

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from src.noise import GammaNetwork as TorchGammaNetwork  # noqa: E402
from src.noise import PredefinedNoiseSchedule  # noqa: E402
from src.egnn import Dynamics as TorchDynamics  # noqa: E402
from src.edm import EDM as TorchEDM  # noqa: E402
from src.edm import InpaintingEDM as TorchInpaintingEDM  # noqa: E402

from difflinker_tpu.config import DiffusionConfig, ModelConfig  # noqa: E402
from difflinker_tpu.diffusion import schedules  # noqa: E402
from difflinker_tpu.diffusion.edm import EDM, InpaintingEDM  # noqa: E402
from difflinker_tpu.io.lightning_import import (  # noqa: E402
    convert_dynamics, convert_gamma_network)

from conftest import make_batch  # noqa: E402


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('name,T,prec', [
    ('polynomial_2', 500, 1e-5),
    ('polynomial_3', 100, 1e-4),
    ('cosine', 250, 1e-4),
])
def test_gamma_table_parity(name, T, prec):
    theirs = PredefinedNoiseSchedule(name, timesteps=T, precision=prec)
    ours = schedules.gamma_lookup_table(name, T, prec)
    np.testing.assert_allclose(ours, theirs.gamma.numpy(), rtol=0, atol=0)

    # continuous-time lookup parity (rounding semantics incl. negative wrap)
    t = np.linspace(-1.0 / T, 1.0, 37, dtype=np.float32).reshape(-1, 1)
    ref = theirs.forward(torch.tensor(t)).numpy()
    got = np.asarray(schedules.gamma_from_table(jnp.asarray(ours), jnp.asarray(t), T))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_gamma_network_parity():
    torch.manual_seed(0)
    tnet = TorchGammaNetwork()
    params = convert_gamma_network(tnet.state_dict(), '')
    t = np.linspace(0, 1, 23, dtype=np.float32).reshape(-1, 1)
    with torch.no_grad():
        ref = tnet.forward(torch.tensor(t)).numpy()
    got = np.asarray(schedules.gamma_network_apply(params, jnp.asarray(t)))
    # 1024-wide fp32 reductions accumulate ~3e-4 order-dependent noise
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_gamma_algebra_parity():
    g_t = torch.linspace(-8, 8, 17)
    g_s = g_t - 0.7

    class _Shim:
        inflate_batch_array = staticmethod(lambda a, t: a)
        expm1 = staticmethod(torch.expm1)
        softplus = staticmethod(torch.nn.functional.softplus)

    s2, s, a = TorchEDM.sigma_and_alpha_t_given_s(_Shim(), g_t, g_s, torch.zeros(17))
    o2, os_, oa = schedules.sigma_alpha_t_given_s(
        jnp.asarray(g_t.numpy()), jnp.asarray(g_s.numpy()))
    np.testing.assert_allclose(np.asarray(o2), s2.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(os_), s.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oa), a.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# Paired EDM construction
# ---------------------------------------------------------------------------

def _build_pair(inpainting=False, T=50):
    mcfg = ModelConfig(in_node_nf=8, context_node_nf=2, hidden_nf=32,
                       n_layers=2, norm_constant=1e-6, centering=inpainting)
    dcfg = DiffusionConfig(timesteps=T, noise_schedule='polynomial_2',
                           noise_precision=1e-5, loss_type='l2',
                           norm_values=(1.0, 4.0, 10.0), inpainting=inpainting)
    torch.manual_seed(11)
    tdyn = TorchDynamics(
        n_dims=3, in_node_nf=8, context_node_nf=2, hidden_nf=32,
        activation=torch.nn.SiLU(), n_layers=2, attention=False,
        condition_time=True, tanh=False, norm_constant=1e-6, inv_sublayers=2,
        sin_embedding=False, normalization_factor=100,
        aggregation_method='sum', model='egnn_dynamics',
        centering=inpainting).eval()
    tklass = TorchInpaintingEDM if inpainting else TorchEDM
    tedm = tklass(dynamics=tdyn, in_node_nf=8, n_dims=3, timesteps=T,
                  noise_schedule='polynomial_2', noise_precision=1e-5,
                  loss_type='l2', norm_values=(1.0, 4.0, 10.0),
                  norm_biases=(None, 0.0, 0.0)).eval()

    jedm = (InpaintingEDM if inpainting else EDM)(mcfg, dcfg)
    params = {'dynamics': convert_dynamics(
        tdyn.state_dict(), '', model='egnn_dynamics', n_layers=2,
        inv_sublayers=2, attention=False)}
    return tedm, jedm, params


def _tensors(batch, keys):
    return {k: torch.tensor(batch[k]) for k in keys}


class _NoiseRecorder:
    """Record the reference's noise draws (in call order, post mask /
    projection) so our sampler can replay the exact same values.

    The reference draws [x-part, h-part] as two separate tensors
    (sample_combined_position_feature_noise, src/edm.py:328-340); our
    sample_noise draws them fused — the replay stub pops two records per call
    and concatenates.
    """

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.records = []

    def torch_gaussian(self, size, device, node_mask):
        out = torch.tensor(self.rng.standard_normal(size).astype(np.float32)) * node_mask
        self.records.append(out.numpy())
        return out

    def torch_com_free_gaussian(self, size, device, node_mask):
        import src.utils as rutils
        x = torch.tensor(self.rng.standard_normal(size).astype(np.float32)) * node_mask
        out = rutils.remove_mean_with_mask(x, node_mask)
        self.records.append(out.numpy())
        return out

    def replay_stub(self):
        replay = iter(self.records)

        def sample_noise(key, shape_bn, mask):
            zx = jnp.asarray(next(replay))
            zh = jnp.asarray(next(replay))
            return jnp.concatenate([zx, zh], axis=-1)
        return sample_noise


def test_sample_chain_parity(rng):
    """Full reverse chain with pinned per-step noise: torch loop vs eager
    replay of our sampler (both run the same converted weights)."""
    T = 6
    tedm, jedm, params = _build_pair(T=T)
    batch = make_batch(rng, B=2, N=12, nf=8, n_frag=5, n_real=10)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)
    B, N = batch['positions'].shape[:2]

    rec = _NoiseRecorder(3)
    with mock.patch('src.utils.sample_gaussian_with_mask', rec.torch_gaussian):
        with torch.no_grad():
            chain = tedm.sample_chain(
                torch.tensor(batch['positions']), torch.tensor(batch['one_hot']),
                torch.tensor(batch['atom_mask']), torch.tensor(batch['fragment_mask']),
                torch.tensor(batch['linker_mask']),
                torch.tensor(batch['edge_mask'].reshape(B * N * N, 1)),
                torch.tensor(context), keep_frames=1)
    ref_xh = chain[0].numpy()

    jedm.sample_noise = rec.replay_stub()
    xs, hs, nan = jedm.sample_chain(
        params, jax.random.PRNGKey(0), jnp.asarray(batch['positions']),
        jnp.asarray(batch['one_hot']), jnp.asarray(batch['atom_mask']),
        jnp.asarray(batch['fragment_mask']), jnp.asarray(batch['linker_mask']),
        jnp.asarray(batch['edge_mask']), jnp.asarray(context), eager=True)
    got = np.concatenate([np.asarray(xs), np.asarray(hs)], axis=-1)
    assert not np.asarray(nan).any()
    np.testing.assert_allclose(got, ref_xh, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize('inpainting', [False, True])
def test_loss_parity(rng, inpainting):
    """7-term loss parity with pinned t and ε."""
    T = 50
    tedm, jedm, params = _build_pair(T=T, inpainting=inpainting)
    batch = make_batch(rng, B=4, N=12, nf=8, n_frag=5, n_real=10)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)
    B, N = batch['positions'].shape[:2]

    if inpainting:
        # the inpainting model assumes CoM-free inputs
        x = batch['positions']
        m = batch['atom_mask']
        x = (x - (x * m).sum(1, keepdims=True) / m.sum(1, keepdims=True)) * m
        batch['positions'] = x.astype(np.float32)

    t_int = np.array([[0.0], [17.0], [33.0], [50.0]], np.float32)
    rec = _NoiseRecorder(5)

    def torch_randint(low, high, size, device=None):
        return torch.tensor(t_int)

    with mock.patch('src.utils.sample_gaussian_with_mask', rec.torch_gaussian), \
         mock.patch('src.utils.sample_center_gravity_zero_gaussian_with_mask',
                    rec.torch_com_free_gaussian), \
         mock.patch('src.edm.torch.randint', torch_randint):
        with torch.no_grad():
            ref = tedm.forward(
                x=torch.tensor(batch['positions']),
                h=torch.tensor(batch['one_hot']),
                node_mask=torch.tensor(batch['atom_mask']),
                fragment_mask=torch.tensor(batch['fragment_mask']),
                linker_mask=torch.tensor(batch['linker_mask']),
                edge_mask=torch.tensor(batch['edge_mask'].reshape(B * N * N, 1)),
                context=torch.tensor(context))
    names = ['delta_log_px', 'kl_prior', 'loss_term_t', 'loss_term_0',
             'l2_loss', 'noise_t', 'noise_0']
    ref = {k: float(v) for k, v in zip(names, ref)}

    jedm.sample_noise = rec.replay_stub()
    with mock.patch('jax.random.randint',
                    lambda key, shape, lo, hi: jnp.asarray(t_int)):
        got = jedm.loss(
            params, jax.random.PRNGKey(0), jnp.asarray(batch['positions']),
            jnp.asarray(batch['one_hot']), jnp.asarray(batch['atom_mask']),
            jnp.asarray(batch['fragment_mask']),
            jnp.asarray(batch['linker_mask']), jnp.asarray(batch['edge_mask']),
            jnp.asarray(context))

    for k in names:
        np.testing.assert_allclose(float(got[k]), ref[k], rtol=2e-3, atol=2e-3,
                                   err_msg=k)


def test_inpainting_sample_chain_parity(rng):
    """Inpainting reverse chain (replace-inpainting + per-step CoM
    projection, src/edm.py:549-616) with pinned noise."""
    T = 5
    tedm, jedm, params = _build_pair(T=T, inpainting=True)
    batch = make_batch(rng, B=2, N=12, nf=8, n_frag=5, n_real=10)
    context = np.concatenate([batch['anchors'], batch['fragment_mask']], -1)
    B, N = batch['positions'].shape[:2]

    # inpainting expects CoM-free inputs
    x = batch['positions']
    m = batch['atom_mask']
    x = (x - (x * m).sum(1, keepdims=True) / m.sum(1, keepdims=True)) * m
    batch['positions'] = x.astype(np.float32)

    rec = _NoiseRecorder(7)
    with mock.patch('src.utils.sample_gaussian_with_mask', rec.torch_gaussian), \
         mock.patch('src.utils.sample_center_gravity_zero_gaussian_with_mask',
                    rec.torch_com_free_gaussian):
        with torch.no_grad():
            chain = tedm.sample_chain(
                torch.tensor(batch['positions']), torch.tensor(batch['one_hot']),
                torch.tensor(batch['atom_mask']),
                torch.tensor(batch['edge_mask'].reshape(B * N * N, 1)),
                torch.tensor(batch['fragment_mask']),
                torch.tensor(batch['linker_mask']),
                torch.tensor(context), keep_frames=1)
    ref_xh = chain[0].numpy()

    jedm.sample_noise = rec.replay_stub()
    xs, hs, nan = jedm.sample_chain(
        params, jax.random.PRNGKey(0), jnp.asarray(batch['positions']),
        jnp.asarray(batch['one_hot']), jnp.asarray(batch['atom_mask']),
        jnp.asarray(batch['fragment_mask']), jnp.asarray(batch['linker_mask']),
        jnp.asarray(batch['edge_mask']), jnp.asarray(context), eager=True)
    got = np.concatenate([np.asarray(xs), np.asarray(hs)], axis=-1)
    assert not np.asarray(nan).any()
    np.testing.assert_allclose(got, ref_xh, atol=5e-4, rtol=1e-3)
