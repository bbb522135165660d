"""Noise schedules and the learned gamma network.

The predefined schedules are computed in float64 numpy and cast to float32,
matching the reference construction bit-for-bit (src/noise.py:7-128) — this is
one of the checkpoint-parity-critical code paths (SURVEY.md §7 "hard parts").
At runtime the schedule is a (T+1,) gamma lookup table indexed by the integer
timestep; there is no per-step host computation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip per-step alpha ratios for sampling stability (src/noise.py:7-19)."""
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_schedule(timesteps: int, s: float = 1e-4, power: float = 3.0) -> np.ndarray:
    """alpha²(t) = precision·clip((1 - (t/T)^p)²) + s (src/noise.py:22-36)."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_beta_schedule(timesteps: int, s: float = 0.008,
                         raise_to_power: float = 1.0) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (src/noise.py:39-56)."""
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    if raise_to_power != 1:
        alphas_cumprod = np.power(alphas_cumprod, raise_to_power)
    return alphas_cumprod


def gamma_lookup_table(noise_schedule: str, timesteps: int,
                       precision: float) -> np.ndarray:
    """γ(t) = −log(α²_t / σ²_t) as a (T+1,) float32 table
    (PredefinedNoiseSchedule, src/noise.py:92-124)."""
    if noise_schedule == 'cosine':
        alphas2 = cosine_beta_schedule(timesteps)
    elif 'polynomial' in noise_schedule:
        splits = noise_schedule.split('_')
        assert len(splits) == 2, noise_schedule
        power = float(splits[1])
        alphas2 = polynomial_schedule(timesteps, s=precision, power=power)
    else:
        raise ValueError(noise_schedule)
    sigmas2 = 1 - alphas2
    log_snr = np.log(alphas2) - np.log(sigmas2)
    return (-log_snr).astype(np.float32)


def gamma_from_table(table: jnp.ndarray, t: jnp.ndarray, timesteps: int) -> jnp.ndarray:
    """γ(t) for continuous t in [0, 1] by rounding to the nearest table index
    (src/noise.py:126-128). Negative rounded indices wrap, as in torch."""
    idx = jnp.round(t * timesteps).astype(jnp.int32)
    return table[idx]


# ---------------------------------------------------------------------------
# Learned monotonic gamma network (reference GammaNetwork, src/noise.py:131-169)
# ---------------------------------------------------------------------------

def _init_positive_linear(key, in_features, out_features, offset=-2.0,
                          dtype=jnp.float32):
    """PositiveLinear init: kaiming_uniform(a=sqrt(5)) + constant offset; the
    effective weight at apply time is softplus(raw) (src/noise.py:59-89)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(wkey, (in_features, out_features), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (out_features,), dtype, -bound, bound)
    return {'w': w + offset, 'b': b}


def _positive_linear(p, x):
    return x @ jax.nn.softplus(p['w']) + p['b']


def init_gamma_network(key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        'l1': _init_positive_linear(k1, 1, 1, dtype=dtype),
        'l2': _init_positive_linear(k2, 1, 1024, dtype=dtype),
        'l3': _init_positive_linear(k3, 1024, 1, dtype=dtype),
        'gamma_0': jnp.asarray([-5.0], dtype),
        'gamma_1': jnp.asarray([10.0], dtype),
    }


def gamma_network_apply(p, t: jnp.ndarray) -> jnp.ndarray:
    """Monotone γ(t), endpoint-normalised to [γ₀, γ₁]. t: (..., 1)."""
    def tilde(u):
        l1 = _positive_linear(p['l1'], u)
        return l1 + _positive_linear(p['l3'], jax.nn.sigmoid(_positive_linear(p['l2'], l1)))

    g0 = tilde(jnp.zeros_like(t))
    g1 = tilde(jnp.ones_like(t))
    gt = tilde(t)
    normalized = (gt - g0) / (g1 - g0)
    return p['gamma_0'] + (p['gamma_1'] - p['gamma_0']) * normalized


# ---------------------------------------------------------------------------
# gamma algebra (reference EDM helpers, src/edm.py:369-432)
# ---------------------------------------------------------------------------

def sigma_from_gamma(gamma):
    return jnp.sqrt(jax.nn.sigmoid(gamma))


def alpha_from_gamma(gamma):
    return jnp.sqrt(jax.nn.sigmoid(-gamma))


def snr(gamma):
    return jnp.exp(-gamma)


def sigma_alpha_t_given_s(gamma_t, gamma_s):
    """Transition coefficients for p(z_s | z_t) (src/edm.py:381-403):
      α_{t|s} = α_t/α_s,  σ²_{t|s} = 1 − α²_{t|s}  (numerically stable forms).
    """
    sigma2_t_given_s = -jnp.expm1(jax.nn.softplus(gamma_s) - jax.nn.softplus(gamma_t))
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
    return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s


def cdf_standard_gaussian(x):
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2)))
