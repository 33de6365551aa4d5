"""Score-SDE (VP, linear beta schedule) forward/reverse dynamics.

Pure-function formulation of the reference Diffusion class
(Grad-TTS/model/diffusion.py:219-294): closed-form forward moments and a
reverse Euler integrator compiled as a single ``lax.scan`` over steps instead
of a Python loop of separate kernel launches.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def get_noise(t, beta_init: float, beta_term: float, cumulative: bool = False):
    """beta(t) (linear) or its integral from 0 to t."""
    if cumulative:
        return beta_init * t + 0.5 * (beta_term - beta_init) * t**2
    return beta_init + (beta_term - beta_init) * t


def forward_diffusion(
    x0: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    beta_min: float,
    beta_max: float,
):
    """Sample x_t ~ N(mean(t), var(t)) given x_0 (closed-form OU moments).

    x0, mu: (B, T, F); mask: (B, T); t: (B,). Returns (xt, z) both masked.
    """
    time = t[:, None, None]
    cum_noise = get_noise(time, beta_min, beta_max, cumulative=True)
    mean = x0 * jnp.exp(-0.5 * cum_noise) + mu * (1.0 - jnp.exp(-0.5 * cum_noise))
    variance = 1.0 - jnp.exp(-cum_noise)
    z = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    xt = mean + z * jnp.sqrt(variance)
    m = mask[:, :, None]
    return xt * m, z * m


def reverse_diffusion(
    score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    z: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    n_timesteps: int,
    beta_min: float,
    beta_max: float,
    stoc: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Integrate the reverse SDE/ODE from t=1 to 0 with n_timesteps Euler steps.

    ``score_fn(xt, t)`` evaluates the noise estimator (closure over params,
    mask, mu, spk). The whole loop is one lax.scan -> one compiled kernel
    sequence, no per-step host round-trips (vs the reference's Python loop,
    Grad-TTS/model/diffusion.py:254-275).
    """
    h = 1.0 / n_timesteps
    b = z.shape[0]
    m = mask[:, :, None]
    xt0 = z * m
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, i):
        xt, rng = carry
        t = (1.0 - (i.astype(z.dtype) + 0.5) * h) * jnp.ones((b,), dtype=z.dtype)
        time = t[:, None, None]
        noise_t = get_noise(time, beta_min, beta_max, cumulative=False)
        score = score_fn(xt, t)
        if stoc:
            rng, sub = jax.random.split(rng)
            dxt_det = (0.5 * (mu - xt) - score) * noise_t * h
            dxt_stoc = jax.random.normal(sub, z.shape, dtype=z.dtype) * jnp.sqrt(
                noise_t * h
            )
            dxt = dxt_det + dxt_stoc
        else:
            dxt = 0.5 * (mu - xt - score) * noise_t * h
        xt = (xt - dxt) * m
        return (xt, rng), None

    (xt, _), _ = jax.lax.scan(step, (xt0, rng), jnp.arange(n_timesteps))
    return xt


def diffusion_loss(
    score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    rng: jax.Array,
    n_feats: int,
    beta_min: float,
    beta_max: float,
    offset: float = 1e-5,
):
    """Score-matching loss at a uniformly sampled t (diffusion.py:281-294)."""
    rng_t, rng_z = jax.random.split(rng)
    t = jax.random.uniform(rng_t, (x0.shape[0],), dtype=x0.dtype)
    t = jnp.clip(t, offset, 1.0 - offset)
    xt, z = forward_diffusion(x0, mask, mu, t, rng_z, beta_min, beta_max)
    time = t[:, None, None]
    cum_noise = get_noise(time, beta_min, beta_max, cumulative=True)
    noise_estimation = score_fn(xt, t)
    noise_estimation = noise_estimation * jnp.sqrt(1.0 - jnp.exp(-cum_noise))
    loss = jnp.sum((noise_estimation + z) ** 2) / (jnp.sum(mask) * n_feats)
    return loss, xt
