"""E(3)-equivariant denoising diffusion (EDM) — training losses and the
reverse-sampling loop.

TPU-first redesign of the reference EDM / InpaintingEDM (src/edm.py:14-730):

  * The entire reverse chain is ONE jitted `lax.scan` over timesteps — the
    reference dispatches T=500 separate EGNN forwards from Python
    (src/edm.py:146-163); here the loop body is traced once and the whole
    chain is a single XLA program per (batch, bucket) shape.
  * RNG is functional: each step derives its key via `jax.random.fold_in`.
  * NaN events are carried as a per-sample flag through the scan instead of a
    raised exception (src/utils.py:274-289); callers re-draw flagged samples.
  * γ(t) is a (T+1,) lookup table resident on device (or the learned
    GammaNetwork when noise_schedule == 'learned').

`EDM` handles fragment-conditioned linker generation (only linker nodes are
noised/denoised; fragments and pocket stay frozen). `InpaintingEDM` noises all
nodes and re-imposes the fragments by replace-inpainting each step.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from difflinker_tpu.config import DiffusionConfig, ModelConfig, resolve_remat
from difflinker_tpu.diffusion import schedules
from difflinker_tpu.models.dynamics import dynamics_apply, init_dynamics
from difflinker_tpu.ops import geometry


def _inflate(a, ndim):
    """(B,) or (B,1) -> (B, 1, ..., 1) with `ndim` total dims."""
    return a.reshape(a.shape[0], *([1] * (ndim - 1)))


class EDM:
    """Fragment-conditioned linker diffusion (reference EDM, src/edm.py:14-463)."""

    def __init__(self, model_cfg: ModelConfig, diff_cfg: DiffusionConfig):
        if diff_cfg.sampler == 'ddim' and diff_cfg.noise_scale != 1.0:
            import warnings
            warnings.warn(
                'sampler=ddim is deterministic (eta=0): noise_scale='
                f'{diff_cfg.noise_scale} has no effect on the reverse '
                'transitions (only the RePaint re-noising and any final '
                'stochastic decode would see it)', stacklevel=2)
        self.mcfg = model_cfg
        self.cfg = diff_cfg
        self.T = diff_cfg.timesteps
        # schedule_T: the grid the gamma table lives on. Equal to T normally;
        # larger under exact-subsequence respacing (DiffusionConfig docs) —
        # then the T-step loop reads gamma off the TRAINED schedule_T-grid at
        # round(t*schedule_T), the reference's n_steps-override semantics.
        self.schedule_T = diff_cfg.schedule_timesteps or self.T
        # T may exceed schedule_T (--steps above the trained T): the lookup
        # rounds t*schedule_T so adjacent loop steps then share a grid point,
        # making gamma_s == gamma_t and the extra step an exact no-op
        # (sigma2_t|s = 0) — the reference's n_steps-override behaves the
        # same way (sample.py:94-95, src/noise.py:126-128).
        self.n_dims = model_cfg.n_dims
        self.in_node_nf = model_cfg.in_node_nf
        self.norm_values = diff_cfg.norm_values
        self.norm_biases = diff_cfg.norm_biases
        self.learned_gamma = diff_cfg.noise_schedule == 'learned'
        if self.learned_gamma:
            assert diff_cfg.loss_type == 'vlb', \
                'a learned noise schedule requires the vlb objective'
            self.gamma_table = None
        else:
            self.gamma_table = jnp.asarray(schedules.gamma_lookup_table(
                diff_cfg.noise_schedule, self.schedule_T,
                diff_cfg.noise_precision))

    # -- parameters --------------------------------------------------------

    def init_params(self, key):
        kd, kg = jax.random.split(key)
        params = {'dynamics': init_dynamics(kd, self.mcfg)}
        if self.learned_gamma:
            params['gamma'] = schedules.init_gamma_network(kg)
        return params

    # -- gamma -------------------------------------------------------------

    def gamma(self, params, t):
        """γ(t) for t in [0, 1]; shape-preserving over (B, 1). Lookup rounds
        on the schedule grid (= the trained grid under respacing)."""
        if self.learned_gamma:
            return schedules.gamma_network_apply(params['gamma'], t)
        return schedules.gamma_from_table(self.gamma_table, t, self.schedule_T)

    # -- normalisation (src/edm.py:347-361) ---------------------------------

    def normalize(self, x, h):
        return x / self.norm_values[0], (h - self.norm_biases[1]) / self.norm_values[1]

    def unnormalize(self, x, h):
        return x * self.norm_values[0], h * self.norm_values[1] + self.norm_biases[1]

    def unnormalize_z(self, z):
        x, h = self.unnormalize(z[..., :self.n_dims], z[..., self.n_dims:])
        return jnp.concatenate([x, h], axis=-1)

    # -- noise sampling ------------------------------------------------------

    def sample_noise(self, key, shape_bn, mask):
        """Combined [x, h] Gaussian noise restricted to `mask`
        (src/edm.py:328-340). x-noise is NOT CoM-projected for the
        linker-conditional model."""
        b, n = shape_bn
        return geometry.sample_gaussian_with_mask(
            key, (b, n, self.n_dims + self.in_node_nf), mask)

    # -- training loss (src/edm.py:41-124) -----------------------------------

    def loss(self, params, key, x, h, node_mask, fragment_mask, linker_mask,
             edge_mask, context=None, sample_weight=None):
        """Returns the 7-term loss dict. Noise mask = linker only; fragments
        (incl. pocket atoms) pass through unchanged.

        `sample_weight` (B,) re-weights every batch-mean term (weighted mean,
        sum(w·v)/sum(w)); weight-0 rows contribute exactly nothing to the
        loss or its gradient. The trainer zeroes wrap-padded duplicate rows
        this way so ragged-batch padding cannot bias gradients."""
        return self._loss_impl(params, key, x, h, node_mask, fragment_mask,
                               linker_mask, edge_mask, context,
                               noise_mask=linker_mask, freeze_fragments=True,
                               sample_weight=sample_weight)

    def _loss_impl(self, params, key, x, h, node_mask, fragment_mask,
                   linker_mask, edge_mask, context, *, noise_mask,
                   freeze_fragments, sample_weight=None):
        bs, n_nodes = x.shape[0], x.shape[1]
        kt, keps = jax.random.split(key)
        if sample_weight is None:
            w = jnp.ones((bs,), x.dtype)
        else:
            w = jnp.asarray(sample_weight, x.dtype).reshape(bs)

        def wmean(v):
            return jnp.sum(v * w) / jnp.maximum(jnp.sum(w), 1.0)

        x, h = self.normalize(x, h)
        xh = jnp.concatenate([x, h], axis=-1)

        delta_log_px = wmean(self.delta_log_px(noise_mask))

        t_int = jax.random.randint(kt, (bs, 1), 0, self.T + 1).astype(jnp.float32)
        s_int = t_int - 1
        t = t_int / self.T
        s = s_int / self.T
        t_is_zero = (t_int[:, 0] == 0).astype(xh.dtype)
        t_is_not_zero = 1.0 - t_is_zero

        gamma_t = _inflate(self.gamma(params, t), xh.ndim)
        gamma_s = _inflate(self.gamma(params, s), xh.ndim)
        alpha_t = schedules.alpha_from_gamma(gamma_t)
        sigma_t = schedules.sigma_from_gamma(gamma_t)

        eps_t = self.sample_noise(keps, (bs, n_nodes), noise_mask)
        z_t = alpha_t * xh + sigma_t * eps_t
        if freeze_fragments:
            z_t = xh * fragment_mask + z_t * linker_mask

        eps_hat, nan_flag = dynamics_apply(
            params['dynamics'], t, z_t, node_mask,
            linker_mask if freeze_fragments else None,
            edge_mask, context, cfg=self.mcfg,
            remat=resolve_remat(self.mcfg, z_t.shape))
        if freeze_fragments:
            eps_hat = eps_hat * linker_mask

        error_t = geometry.sum_except_batch((eps_t - eps_hat) ** 2)

        normalization = ((self.n_dims + self.in_node_nf)
                         * geometry.numbers_of_nodes(noise_mask))
        l2_loss = wmean(error_t / normalization)

        kl_prior = wmean(self.kl_prior(params, xh, noise_mask))

        snr_weight = (schedules.snr(gamma_s - gamma_t) - 1.0).reshape(bs)
        loss_t_each = self.T * 0.5 * snr_weight * error_t
        w_pos = t_is_not_zero * w
        n_pos = jnp.sum(w_pos)
        loss_term_t = jnp.where(
            n_pos > 0, jnp.sum(loss_t_each * w_pos) / jnp.maximum(n_pos, 1.0), 0.0)

        noise = jnp.sqrt(geometry.sum_except_batch(eps_hat ** 2))
        noise_t = jnp.where(
            n_pos > 0, jnp.sum(noise * w_pos) / jnp.maximum(n_pos, 1.0), 0.0)

        # L0 term, evaluated for every sample then masked to t==0
        # (src/edm.py:107-122). Safe under jit: both branches always computed.
        w_zero = t_is_zero * w
        n_zero = jnp.sum(w_zero)
        neg_log_constants = -self.log_constant_of_p_x_given_z0(params, x, noise_mask)
        loss_term_0_each = (-self.log_p_xh_given_z0_without_constants(
            h, z_t, gamma_t, eps_t, eps_hat, noise_mask) + neg_log_constants)
        loss_term_0 = jnp.where(
            n_zero > 0, jnp.sum(loss_term_0_each * w_zero) / jnp.maximum(n_zero, 1.0), 0.0)
        noise_0 = jnp.where(
            n_zero > 0, jnp.sum(noise * w_zero) / jnp.maximum(n_zero, 1.0), 0.0)

        vlb_loss = kl_prior + loss_term_t + loss_term_0 - delta_log_px
        loss = l2_loss if self.cfg.loss_type == 'l2' else vlb_loss
        return {
            'loss': loss,
            'delta_log_px': delta_log_px,
            'kl_prior': kl_prior,
            'loss_term_t': loss_term_t,
            'loss_term_0': loss_term_0,
            'l2_loss': l2_loss,
            'vlb_loss': vlb_loss,
            'noise_t': noise_t,
            'noise_0': noise_0,
            'nan_flag': nan_flag,
        }

    # -- loss helper terms ---------------------------------------------------

    def delta_log_px(self, mask):
        return -self.dimensionality(mask) * math.log(self.norm_values[0])

    def dimensionality(self, mask):
        return geometry.numbers_of_nodes(mask) * self.n_dims

    def kl_prior(self, params, xh, mask):
        """KL(q(z_T | x) || N(0, I)) (src/edm.py:244-272)."""
        bs = xh.shape[0]
        ones = jnp.ones((bs, 1), xh.dtype)
        gamma_T = _inflate(self.gamma(params, ones), xh.ndim)
        alpha_T = schedules.alpha_from_gamma(gamma_T)

        mu_T = alpha_T * xh
        mu_T_x, mu_T_h = mu_T[..., :self.n_dims], mu_T[..., self.n_dims:]
        sigma_T = schedules.sigma_from_gamma(gamma_T)
        sigma_T_x = sigma_T.reshape(bs)
        sigma_T_h = sigma_T

        kl_h = geometry.sum_except_batch(
            jnp.log(1.0 / sigma_T_h) + 0.5 * (sigma_T_h ** 2 + mu_T_h ** 2) - 0.5)
        d = self.dimensionality(mask)
        mu_norm2 = geometry.sum_except_batch(mu_T_x ** 2)
        kl_x = (d * jnp.log(1.0 / sigma_T_x)
                + 0.5 * (d * sigma_T_x ** 2 + mu_norm2) - 0.5 * d)
        return kl_x + kl_h

    def log_constant_of_p_x_given_z0(self, params, x, mask):
        """Constant of the L0 cross-entropy term (src/edm.py:274-283)."""
        bs = x.shape[0]
        zeros = jnp.zeros((bs, 1), x.dtype)
        gamma_0 = self.gamma(params, zeros)
        log_sigma_x = 0.5 * gamma_0.reshape(bs)
        d = self.dimensionality(mask)
        return d * (-log_sigma_x - 0.5 * math.log(2 * math.pi))

    def log_p_xh_given_z0_without_constants(self, h, z_0, gamma_0, eps,
                                            eps_hat, mask, epsilon=1e-10):
        """L0 term: Gaussian on the x-part + erf-CDF integral over one-hot
        bins for the categorical part (src/edm.py:285-326)."""
        z_h = z_0[..., self.n_dims:]
        eps_x = eps[..., :self.n_dims]
        eps_hat_x = eps_hat[..., :self.n_dims]

        sigma_0 = schedules.sigma_from_gamma(gamma_0) * self.norm_values[1]

        log_p_x = -0.5 * geometry.sum_except_batch((eps_x - eps_hat_x) ** 2)

        h_int = h * self.norm_values[1] + self.norm_biases[1]
        estimated_h = z_h * self.norm_values[1] + self.norm_biases[1]
        centered = estimated_h - 1.0

        log_p_prop = jnp.log(
            schedules.cdf_standard_gaussian((centered + 0.5) / sigma_0)
            - schedules.cdf_standard_gaussian((centered - 0.5) / sigma_0)
            + epsilon)
        log_z = jax.nn.logsumexp(log_p_prop, axis=2, keepdims=True)
        log_probs = log_p_prop - log_z
        log_p_h = geometry.sum_except_batch(log_probs * h_int * mask)
        return log_p_x + log_p_h

    # -- reverse sampling ----------------------------------------------------

    def sample_step(self, params, key, s_int, z_t, node_mask, fragment_mask,
                    linker_mask, edge_mask, context, xh_fragments=None):
        """One p(z_s | z_t) transition with s = s_int, t = s_int + 1
        (src/edm.py:178-208). Jit/scan-safe: s_int may be traced.
        `xh_fragments` is unused here (the fragment part of z_t is already the
        ground truth); InpaintingEDM needs it for q-sampling.

        With cfg.resample_steps > 1 the transition is repeated RePaint-style:
        between repeats the linker part of z_s is re-noised back to t
        (z_t' = α_{t|s}·z_s + σ_{t|s}·ε on linker rows; fragment rows stay the
        frozen ground truth), giving the linker extra chances to harmonise
        with the conditioning fragments. A pure inference-time knob over the
        reference formulation (same trick the inpainting variant uses)."""
        bs = z_t.shape[0]
        s = jnp.full((bs, 1), 0.0, z_t.dtype) + s_int / self.T
        t = s + 1.0 / self.T
        gamma_s = _inflate(self.gamma(params, s), z_t.ndim)
        gamma_t = _inflate(self.gamma(params, t), z_t.ndim)

        sigma2_tgs, sigma_tgs, alpha_tgs = schedules.sigma_alpha_t_given_s(
            gamma_t, gamma_s)
        sigma_s = schedules.sigma_from_gamma(gamma_s)
        sigma_t = schedules.sigma_from_gamma(gamma_t)
        sigma = sigma_tgs * sigma_s / sigma_t * self.cfg.noise_scale

        def one_transition(z_t, k):
            eps_hat, nan_flag = dynamics_apply(
                params['dynamics'], t, z_t, node_mask, linker_mask, edge_mask,
                context, cfg=self.mcfg)
            eps_hat = eps_hat * linker_mask
            if self.cfg.sampler == 'ddim':
                # deterministic eta=0 update: alpha_s*x_hat + sigma_s*eps_hat
                # == z_t/alpha_tgs + (sigma_s - sigma_t/alpha_tgs)*eps_hat
                z_s = z_t / alpha_tgs + (sigma_s - sigma_t / alpha_tgs) * eps_hat
            else:
                mu = (z_t / alpha_tgs
                      - (sigma2_tgs / alpha_tgs / sigma_t) * eps_hat)
                eps = self.sample_noise(k, z_t.shape[:2], linker_mask)
                z_s = mu + sigma * eps
            return z_t * fragment_mask + z_s * linker_mask, nan_flag

        r = max(int(self.cfg.resample_steps), 1)
        if r == 1:
            return one_transition(z_t, key)
        nan = jnp.zeros((bs,), bool)
        z_s = z_t
        for j in range(r):  # static unroll; r is small
            kj = jax.random.fold_in(key, j)
            z_s, nan_j = one_transition(z_t, kj)
            nan = nan | nan_j
            if j < r - 1:
                eps = self.sample_noise(jax.random.fold_in(kj, 7919),
                                        z_t.shape[:2], linker_mask)
                z_t = (z_s * fragment_mask
                       + (alpha_tgs * z_s + sigma_tgs * eps) * linker_mask)
        return z_s, nan

    def decode_z0(self, params, key, z_0, node_mask, fragment_mask,
                  linker_mask, edge_mask, context):
        """Final decode p(x, h | z_0): denoise at t=0, then argmax one-hot for
        the node features (src/edm.py:210-235)."""
        bs = z_0.shape[0]
        zeros = jnp.zeros((bs, 1), z_0.dtype)
        gamma_0 = _inflate(self.gamma(params, zeros), z_0.ndim)
        sigma_x = schedules.snr(-0.5 * gamma_0)

        eps_hat, nan_flag = dynamics_apply(
            params['dynamics'], zeros, z_0, node_mask, linker_mask, edge_mask,
            context, cfg=self.mcfg)
        eps_hat = eps_hat * linker_mask

        sigma_0 = schedules.sigma_from_gamma(gamma_0)
        alpha_0 = schedules.alpha_from_gamma(gamma_0)
        mu_x = (z_0 - sigma_0 * eps_hat) / alpha_0
        if self.cfg.final_decode == 'mean' or self.cfg.sampler == 'ddim':
            # ddim decodes x_hat directly: the deterministic chain's endpoint
            xh = mu_x
        else:
            eps = self.sample_noise(key, z_0.shape[:2], linker_mask)
            xh = mu_x + sigma_x * self.cfg.noise_scale * eps
        xh = z_0 * fragment_mask + xh * linker_mask

        x, h = xh[..., :self.n_dims], xh[..., self.n_dims:]
        x, h = self.unnormalize(x, h)
        h = (jax.nn.one_hot(jnp.argmax(h, axis=-1), self.in_node_nf, dtype=h.dtype)
             * node_mask)
        return x, h, nan_flag

    def init_z(self, key, xh, fragment_mask, linker_mask):
        z = self.sample_noise(key, xh.shape[:2], linker_mask)
        return xh * fragment_mask + z * linker_mask

    def _fragment_reference(self, xh, fragment_mask):
        """Ground-truth fragment tensor each sample_step receives; the base
        model conditions via frozen z rows instead, so: None."""
        return None

    def sample_chain(self, params, key, x, h, node_mask, fragment_mask,
                     linker_mask, edge_mask, context=None,
                     keep_frames: Optional[int] = None, eager: bool = False):
        """Full reverse chain as a single lax.scan (replaces the Python loop
        at src/edm.py:146-163).

        Returns (x, h, nan_flag[, chain]) where chain is
        (keep_frames, B, N, 3+nf) in *unnormalised* units with chain[0] being
        the final decoded sample — layout identical to the reference so the
        visualiser and trajectory CLI are drop-in.

        `eager=True` runs the loop in Python instead of lax.scan (debugging /
        noise-replay parity tests).
        """
        x, h = self.normalize(x, h)
        xh = jnp.concatenate([x, h], axis=-1)
        # Fragment ground truth threaded explicitly into each step (None for
        # the base EDM; InpaintingEDM q-samples fragments from it). Passed as
        # an argument — never stashed on `self` — so two concurrently-traced
        # samplers sharing one EDM instance cannot alias each other's tracers.
        xh_fragments = self._fragment_reference(xh, fragment_mask)

        kinit, kloop, kdec = jax.random.split(key, 3)
        z = self.init_z(kinit, xh, fragment_mask, linker_mask)
        nan0 = jnp.zeros((z.shape[0],), bool)

        collect = keep_frames is not None
        if collect:
            assert keep_frames <= self.T
            chain0 = jnp.zeros((keep_frames,) + z.shape, z.dtype)

        def body(carry, s_int):
            if collect:
                z, nan, chain = carry
            else:
                z, nan = carry
            step_key = jax.random.fold_in(kloop, s_int)
            z, step_nan = self.sample_step(
                params, step_key, jnp.asarray(s_int, z.dtype), z, node_mask,
                fragment_mask, linker_mask, edge_mask, context,
                xh_fragments=xh_fragments)
            nan = nan | step_nan
            if collect:
                idx = (s_int * keep_frames) // self.T
                chain = jax.lax.dynamic_update_slice_in_dim(
                    chain, self.unnormalize_z(z)[None], idx, axis=0)
                return (z, nan, chain), None
            return (z, nan), None

        carry = (z, nan0, chain0) if collect else (z, nan0)
        if eager:
            for s_int in range(self.T - 1, -1, -1):
                carry, _ = body(carry, s_int)
        else:
            s_ints = jnp.arange(self.T - 1, -1, -1)
            carry, _ = jax.lax.scan(body, carry, s_ints)
        if collect:
            z, nan, chain = carry
        else:
            z, nan = carry

        x, h, dec_nan = self.decode_z0(
            params, kdec, z, node_mask, fragment_mask, linker_mask, edge_mask,
            context)
        nan = nan | dec_nan
        if collect:
            chain = chain.at[0].set(jnp.concatenate([x, h], axis=-1))
            return x, h, nan, chain
        return x, h, nan


class InpaintingEDM(EDM):
    """Replace-inpainting variant: all nodes are noised; at each reverse step
    the fragment part is q-sampled from the known fragment coordinates and
    recombined with the p-sampled linker part (src/edm.py:466-730)."""

    def sample_noise(self, key, shape_bn, mask):
        """x-noise is CoM-free for the inpainting model (src/edm.py:715-727)."""
        b, n = shape_bn
        kx, kh = jax.random.split(key)
        z_x = geometry.sample_com_free_gaussian_with_mask(
            kx, (b, n, self.n_dims), mask)
        z_h = geometry.sample_gaussian_with_mask(
            kh, (b, n, self.in_node_nf), mask)
        return jnp.concatenate([z_x, z_h], axis=-1)

    def dimensionality(self, mask):
        # CoM-free subspace has (N-1)·3 degrees of freedom (src/edm.py:729-730).
        return (geometry.numbers_of_nodes(mask) - 1) * self.n_dims

    def loss(self, params, key, x, h, node_mask, fragment_mask, linker_mask,
             edge_mask, context=None, sample_weight=None):
        return self._loss_impl(params, key, x, h, node_mask, fragment_mask,
                               linker_mask, edge_mask, context,
                               noise_mask=node_mask, freeze_fragments=False,
                               sample_weight=sample_weight)

    def init_z(self, key, xh, fragment_mask, linker_mask):
        node_mask = ((fragment_mask + linker_mask) > 0).astype(xh.dtype)
        return self.sample_noise(key, xh.shape[:2], node_mask)

    def _fragment_reference(self, xh, fragment_mask):
        return xh * fragment_mask

    def sample_step(self, params, key, s_int, z_t, node_mask, fragment_mask,
                    linker_mask, edge_mask, context, xh_fragments=None):
        """p-sample everything, q-sample fragments from the ground truth
        `xh_fragments` (threaded in by sample_chain), mix, and re-project the
        CoM (src/edm.py:568-598).

        With cfg.resample_steps > 1 the p/q mix is repeated RePaint-style:
        z_s is re-noised back to t (z_t' = α_{t|s}·z_s + σ_{t|s}·ε) between
        repeats so the generated part can harmonise with the replaced
        fragments — a pure inference-time knob over the reference
        formulation."""
        bs = z_t.shape[0]
        xh_frag = xh_fragments
        s = jnp.full((bs, 1), 0.0, z_t.dtype) + s_int / self.T
        t = s + 1.0 / self.T
        gamma_s = _inflate(self.gamma(params, s), z_t.ndim)
        gamma_t = _inflate(self.gamma(params, t), z_t.ndim)
        sigma2_tgs, sigma_tgs, alpha_tgs = schedules.sigma_alpha_t_given_s(
            gamma_t, gamma_s)
        sigma_s = schedules.sigma_from_gamma(gamma_s)
        sigma_t = schedules.sigma_from_gamma(gamma_t)
        alpha_s = schedules.alpha_from_gamma(gamma_s)
        # noise_scale cools only the GENERATIVE (p-side) draw; the q-side
        # fragment conditioning keeps the true posterior dispersion so the
        # network sees in-distribution fragment latents (config.py contract).
        sigma_q = sigma_tgs * sigma_s / sigma_t
        sigma_p = sigma_q * self.cfg.noise_scale

        def one_transition(z_t, k):
            kp, kq = jax.random.split(k)
            # p(z_s | z_t) over all nodes
            eps_hat, nan_flag = dynamics_apply(
                params['dynamics'], t, z_t, node_mask, None, edge_mask,
                context, cfg=self.mcfg)
            if self.cfg.sampler == 'ddim':
                z_p = (z_t / alpha_tgs
                       + (sigma_s - sigma_t / alpha_tgs) * eps_hat)
            else:
                mu_p = (z_t / alpha_tgs
                        - (sigma2_tgs / alpha_tgs / sigma_t) * eps_hat)
                z_p = mu_p + sigma_p * self.sample_noise(kp, z_t.shape[:2],
                                                         node_mask)
            # q(z_s | z_t, x) for the fragment part (src/edm.py:650-670)
            mu_q = (alpha_tgs * (sigma_s ** 2) / (sigma_t ** 2) * z_t
                    + alpha_s * sigma2_tgs / (sigma_t ** 2) * xh_frag)
            z_q = mu_q + sigma_q * self.sample_noise(kq, z_t.shape[:2],
                                                     fragment_mask)
            z = z_p * linker_mask + z_q * fragment_mask
            z_x = geometry.remove_mean_with_mask(z[..., :self.n_dims],
                                                 node_mask)
            return jnp.concatenate([z_x, z[..., self.n_dims:]], axis=-1), \
                nan_flag

        r = max(int(self.cfg.resample_steps), 1)
        if r == 1:
            return one_transition(z_t, key)
        nan = jnp.zeros((bs,), bool)
        z_s = z_t
        for j in range(r):  # static unroll; r is small
            kj = jax.random.fold_in(key, j)
            z_s, nan_j = one_transition(z_t, kj)
            nan = nan | nan_j
            if j < r - 1:
                eps = self.sample_noise(jax.random.fold_in(kj, 7919),
                                        z_t.shape[:2], node_mask)
                z_t = alpha_tgs * z_s + sigma_tgs * eps
        return z_s, nan

    def decode_z0(self, params, key, z_0, node_mask, fragment_mask,
                  linker_mask, edge_mask, context):
        """Mix p(x,h|z0) for the linker with q(x,h|z0,x) for fragments
        (src/edm.py:600-614)."""
        bs = z_0.shape[0]
        kp, kq = jax.random.split(key)
        zeros = jnp.zeros((bs, 1), z_0.dtype)
        gamma_0 = _inflate(self.gamma(params, zeros), z_0.ndim)
        sigma_x = schedules.snr(-0.5 * gamma_0)
        sigma_0 = schedules.sigma_from_gamma(gamma_0)
        alpha_0 = schedules.alpha_from_gamma(gamma_0)

        eps_hat, nan_flag = dynamics_apply(
            params['dynamics'], zeros, z_0, node_mask, None, edge_mask,
            context, cfg=self.mcfg)
        mu_x = (z_0 - sigma_0 * eps_hat) / alpha_0
        if self.cfg.final_decode == 'mean' or self.cfg.sampler == 'ddim':
            # key-independent decode for BOTH parts: the q-side fragment
            # draw would otherwise keep a sigma_0-scaled noise term and
            # defeat the knob's purpose (isolating the schedule's noise
            # floor from the network / keeping the ddim chain deterministic)
            xh_p = mu_x
            xh_q = z_0 / alpha_0
        else:
            xh_p = mu_x + sigma_x * self.cfg.noise_scale * self.sample_noise(
                kp, z_0.shape[:2], node_mask)
            # q-side fragment decode stays at scale 1 (conditioning noise,
            # not generative noise — config.py contract)
            eps = self.sample_noise(kq, z_0.shape[:2], node_mask)
            xh_q = z_0 / alpha_0 - (sigma_0 / alpha_0) * eps

        xh = xh_p * linker_mask + xh_q * fragment_mask
        x, h = xh[..., :self.n_dims], xh[..., self.n_dims:]
        x, h = self.unnormalize(x, h)
        h = (jax.nn.one_hot(jnp.argmax(h, axis=-1), self.in_node_nf, dtype=h.dtype)
             * node_mask)
        return x, h, nan_flag

def make_edm(model_cfg: ModelConfig, diff_cfg: DiffusionConfig) -> EDM:
    cls = InpaintingEDM if diff_cfg.inpainting else EDM
    return cls(model_cfg, diff_cfg)
