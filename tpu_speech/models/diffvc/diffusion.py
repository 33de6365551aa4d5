"""DiffVC diffusion: closed-form VP-SDE algebra + pf/em/ml samplers.

Pure-function re-design of DiffVC/model/diffusion.py:109-222. The
maximum-likelihood ('ml') sampler applies the kappa/omega/sigma correction
terms from the closed-form gamma/mu/nu/sigma expressions (ICLR 2022 paper);
all three samplers compile as a single ``lax.scan`` over steps.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def get_gamma(s, t, beta_min: float, beta_max: float, p: float = 1.0):
    """exp(-0.5 * p * int_s^t beta(u) du) for the linear beta schedule."""
    beta_integral = (beta_min + 0.5 * (beta_max - beta_min) * (t + s)) * (t - s)
    return jnp.exp(-0.5 * p * beta_integral)


def get_mu(s, t, beta_min, beta_max):
    a = get_gamma(s, t, beta_min, beta_max)
    b = 1.0 - get_gamma(0, s, beta_min, beta_max, p=2.0)
    c = 1.0 - get_gamma(0, t, beta_min, beta_max, p=2.0)
    return a * b / c


def get_nu(s, t, beta_min, beta_max):
    a = get_gamma(0, s, beta_min, beta_max)
    b = 1.0 - get_gamma(s, t, beta_min, beta_max, p=2.0)
    c = 1.0 - get_gamma(0, t, beta_min, beta_max, p=2.0)
    return a * b / c


def get_sigma(s, t, beta_min, beta_max):
    a = 1.0 - get_gamma(0, s, beta_min, beta_max, p=2.0)
    b = 1.0 - get_gamma(s, t, beta_min, beta_max, p=2.0)
    c = 1.0 - get_gamma(0, t, beta_min, beta_max, p=2.0)
    return jnp.sqrt(a * b / c)


def compute_diffused_mean(x0, mask, mean, t, beta_min, beta_max):
    """E[x_t | x_0] = gamma * x0 + (1 - gamma) * mean.  mask: (B, T)."""
    x0_weight = get_gamma(0.0, t, beta_min, beta_max)
    xt_mean = x0 * x0_weight + mean * (1.0 - x0_weight)
    return xt_mean * mask[:, :, None]


def forward_diffusion(x0, mask, mean, t, rng, beta_min, beta_max):
    """t: (B,) -> (xt, z), channels-last (B, T, F)."""
    tb = t[:, None, None]
    xt_mean = x0 * get_gamma(0.0, tb, beta_min, beta_max) + mean * (
        1.0 - get_gamma(0.0, tb, beta_min, beta_max)
    )
    m = mask[:, :, None]
    variance = 1.0 - get_gamma(0.0, tb, beta_min, beta_max, p=2.0)
    z = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    xt = xt_mean * m + z * jnp.sqrt(variance)
    return xt * m, z * m


def reverse_diffusion(
    score_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    z: jnp.ndarray,
    mask: jnp.ndarray,
    mean: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    mean_ref: jnp.ndarray,
    n_timesteps: int,
    beta_min: float,
    beta_max: float,
    mode: str = "ml",
    rng: Optional[jax.Array] = None,
    return_history: bool = False,
):
    """Integrate from t=1 to 0. ``score_fn(xt, xt_ref, t_vec)`` evaluates the
    conditional estimator. mode in {'pf', 'em', 'ml'} (diffusion.py:164-196),
    plus 'dpm': DPM-Solver++(2M) on the same probability-flow ODE as 'pf'
    (one network call per step; n_timesteps=6 lands closer to the pf limit
    than 30 pf Euler steps).

    return_history=True additionally returns the per-step states stacked as
    (n_timesteps, B, T, F) — the fidelity harness uses it to measure
    cross-implementation error growth (cli/check_fidelity.py --growth)."""
    assert mode in ("pf", "em", "ml", "dpm"), mode
    if mode == "dpm":
        from tpu_speech.models.diffusion import reverse_diffusion_dpm

        def cond_score_fn(xt, t_vec):
            xt_ref = compute_diffused_mean(
                ref, ref_mask, mean_ref, t_vec[0], beta_min, beta_max
            )
            return score_fn(xt, xt_ref, t_vec)

        return reverse_diffusion_dpm(
            cond_score_fn, z, mask, mean, n_timesteps, beta_min, beta_max, order=2
        )
    h = 1.0 / n_timesteps
    b = z.shape[0]
    m = mask[:, :, None]
    xt0 = z * m
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # All per-step coefficients depend only on the step index — precompute
    # them VECTORIZED over the whole schedule and feed them through the scan
    # as xs. Evaluating the kappa/omega/sigma transcendental chains inside
    # the body emitted ~670 scalar ops per step (measured 9.9 ms of a
    # 160 ms conversion, round-4 trace); elementwise-on-vector evaluation is
    # bitwise-identical per element.
    ts = 1.0 - jnp.arange(n_timesteps, dtype=z.dtype) * h
    beta_ts = beta_min + (beta_max - beta_min) * ts
    gamma0_ts = get_gamma(0.0, ts, beta_min, beta_max)
    if mode == "ml":
        kappas = get_gamma(0, ts - h, beta_min, beta_max) * (
            1.0 - get_gamma(ts - h, ts, beta_min, beta_max, p=2.0)
        )
        kappas = kappas / (gamma0_ts * beta_ts * h)
        kappas = kappas - 1.0
        omegas = get_nu(ts - h, ts, beta_min, beta_max) / gamma0_ts
        omegas = omegas + get_mu(ts - h, ts, beta_min, beta_max)
        omegas = omegas - (0.5 * beta_ts * h + 1.0)
        sigmas = get_sigma(ts - h, ts, beta_min, beta_max)
    elif mode == "em":
        kappas = jnp.zeros_like(ts)
        omegas = jnp.zeros_like(ts)
        sigmas = jnp.sqrt(beta_ts * h)
    else:  # pf carries unused placeholders
        kappas = omegas = sigmas = jnp.zeros_like(ts)
    xs = {
        "t": ts, "beta_t": beta_ts, "gamma0": gamma0_ts,
        "kappa": kappas, "omega": omegas, "sigma": sigmas,
    }

    def step(carry, cf):
        xt, rng = carry
        t_vec = cf["t"] * jnp.ones((b,), dtype=z.dtype)
        beta_t = cf["beta_t"]
        xt_ref = (
            ref * cf["gamma0"] + mean_ref * (1.0 - cf["gamma0"])
        ) * ref_mask[:, :, None]
        score = score_fn(xt, xt_ref, t_vec)
        if mode == "pf":
            dxt = 0.5 * (mean - xt - score) * (beta_t * h)
            rng_next = rng
        else:
            rng, sub = jax.random.split(rng)
            dxt = (mean - xt) * (0.5 * beta_t * h + cf["omega"])
            dxt = dxt - score * (1.0 + cf["kappa"]) * (beta_t * h)
            dxt = dxt + (
                jax.random.normal(sub, z.shape, dtype=z.dtype) * cf["sigma"]
            )
            rng_next = rng
        xt = (xt - dxt) * m
        return (xt, rng_next), (xt if return_history else None)

    (xt, _), hist = jax.lax.scan(step, (xt0, rng), xs)
    if return_history:
        return xt, hist
    return xt


def diffusion_loss(
    score_fn,
    x0,
    mask,
    mean,
    ref,
    mean_ref,
    rng,
    n_feats: int,
    beta_min: float,
    beta_max: float,
    offset: float = 1e-5,
):
    """Score matching at uniform t; ref diffused with the same mask
    (diffusion.py:207-222)."""
    rng_t, rng_z = jax.random.split(rng)
    t = jax.random.uniform(rng_t, (x0.shape[0],), dtype=x0.dtype)
    t = jnp.clip(t, offset, 1.0 - offset)
    xt, z = forward_diffusion(x0, mask, mean, t, rng_z, beta_min, beta_max)
    tb = t[:, None, None]
    xt_ref = (
        ref * get_gamma(0.0, tb, beta_min, beta_max)
        + mean_ref * (1.0 - get_gamma(0.0, tb, beta_min, beta_max))
    ) * mask[:, :, None]
    z_est = score_fn(xt, xt_ref, t)
    z_est = z_est * jnp.sqrt(1.0 - get_gamma(0.0, tb, beta_min, beta_max, p=2.0))
    return jnp.sum((z_est + z) ** 2) / (jnp.sum(mask) * n_feats)
