"""DPM-Solver exponential integrator vs the Euler probability-flow baseline.

The solver integrates the SAME reverse ODE as ``reverse_diffusion(stoc=False)``
(reference loop Grad-TTS/model/diffusion.py:254-275), so its few-step output
must converge to the many-step Euler limit. Three tiers:

1. analytic Gaussian score (exact ODE field) — error vs a 4000-step Euler
   ground truth: dpm@10 must beat euler@10 by >5x;
2. neural score field (valid score with a random mean-predictor MLP) —
   convergence to euler@2000;
3. end-to-end: GradTTS.synthesize(solver='dpm') and DiffVC mode='dpm' agree
   with the Euler/pf samplers run at many steps on the same z.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_speech.models.diffusion import (
    dpm_solver_schedule,
    get_noise,
    reverse_diffusion,
    reverse_diffusion_dpm,
)

BETA_MIN, BETA_MAX = 0.05, 20.0


def _analytic_score_fn(mu, m0, s0):
    """Score of the OU-diffused N(m0, s0^2) initial law (elementwise)."""

    def score(x, t):
        g = get_noise(t[:, None, None], BETA_MIN, BETA_MAX, cumulative=True)
        alpha = jnp.exp(-0.5 * g)
        var = alpha**2 * s0**2 + (1.0 - alpha**2)
        mean = mu + alpha * (m0 - mu)
        return -(x - mean) / var

    return score


def test_schedule_endpoints_and_monotonicity():
    ts, lams = dpm_solver_schedule(8, BETA_MIN, BETA_MAX, 1.0, 1e-3)
    assert ts.shape == (9,) and lams.shape == (9,)
    np.testing.assert_allclose(ts[0], 1.0, atol=1e-9)
    np.testing.assert_allclose(ts[-1], 1e-3, rtol=1e-6)
    assert np.all(np.diff(ts) < 0), "t must decrease toward 0"
    assert np.all(np.diff(lams) > 0), "lambda must increase toward t=0"


def test_analytic_score_accuracy():
    rng = jax.random.PRNGKey(0)
    B, T, F = 2, 16, 8
    mu = jax.random.normal(rng, (B, T, F)) * 0.5
    m0 = mu + 1.3
    s0 = 0.37
    mask = jnp.ones((B, T))
    z = mu + jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    score = _analytic_score_fn(mu, m0, s0)

    gt = reverse_diffusion(score, z, mask, mu, 4000, BETA_MIN, BETA_MAX)
    euler10 = reverse_diffusion(score, z, mask, mu, 10, BETA_MIN, BETA_MAX)
    dpm10 = reverse_diffusion_dpm(score, z, mask, mu, 10, BETA_MIN, BETA_MAX)

    err_euler = float(jnp.max(jnp.abs(euler10 - gt)))
    err_dpm = float(jnp.max(jnp.abs(dpm10 - gt)))
    # same NFE (10 network calls): 2M must be far more accurate
    assert err_dpm < err_euler / 5, (err_dpm, err_euler)
    assert err_dpm < 0.06, err_dpm


def test_order1_matches_ddim_direction_and_converges():
    rng = jax.random.PRNGKey(2)
    B, T, F = 1, 8, 4
    mu = jnp.zeros((B, T, F))
    mask = jnp.ones((B, T))
    z = jax.random.normal(rng, (B, T, F))
    score = _analytic_score_fn(mu, mu + 0.7, 0.5)
    gt = reverse_diffusion(score, z, mask, mu, 4000, BETA_MIN, BETA_MAX)
    errs = [
        float(jnp.max(jnp.abs(
            reverse_diffusion_dpm(score, z, mask, mu, n, BETA_MIN, BETA_MAX, order=1) - gt
        )))
        for n in (8, 32, 128)
    ]
    assert errs[0] > errs[1] > errs[2], errs
    assert errs[2] < 0.03, errs


def _mlp_score_fn(key, feat, mu, s0=0.4):
    """A VALID score field with a neural mean-predictor: the diffused law of
    x0 ~ N(mu + tanh(net(x,t)), s0^2) — bounded x0-prediction, true score
    asymptotics (the regime a trained estimator approximates)."""
    w1 = jax.random.normal(key, (feat + 1, 32)) * 0.5
    w2 = jax.random.normal(jax.random.fold_in(key, 1), (32, feat)) * 0.5

    def score(x, t):
        tb = jnp.broadcast_to(t[:, None, None], x.shape[:-1] + (1,))
        net = jnp.tanh(jnp.tanh(jnp.concatenate([x, tb], axis=-1) @ w1) @ w2)
        g = get_noise(t[:, None, None], BETA_MIN, BETA_MAX, cumulative=True)
        alpha = jnp.exp(-0.5 * g)
        var = alpha**2 * s0**2 + (1.0 - alpha**2)
        mean = mu + alpha * net
        return -(x - mean) / var

    return score


def test_neural_field_convergence():
    key = jax.random.PRNGKey(3)
    B, T, F = 2, 12, 6
    mu = jax.random.normal(jax.random.fold_in(key, 7), (B, T, F)) * 0.3
    mask = jnp.ones((B, T))
    z = mu + jax.random.normal(jax.random.fold_in(key, 8), (B, T, F))
    score = _mlp_score_fn(key, F, mu)

    gt = reverse_diffusion(score, z, mask, mu, 2000, BETA_MIN, BETA_MAX)
    scale = float(jnp.max(jnp.abs(gt)))

    def err_dpm(n):
        d = reverse_diffusion_dpm(score, z, mask, mu, n, BETA_MIN, BETA_MAX)
        return float(jnp.max(jnp.abs(d - gt))) / scale

    e8, e16, e32 = err_dpm(8), err_dpm(16), err_dpm(32)
    assert e8 > e16 > e32, (e8, e16, e32)
    euler32 = reverse_diffusion(score, z, mask, mu, 32, BETA_MIN, BETA_MAX)
    err_euler32 = float(jnp.max(jnp.abs(euler32 - gt))) / scale
    # equal NFE: the multistep integrator at least halves the Euler error
    assert e32 < err_euler32 / 2, (e32, err_euler32)
    assert e32 < 0.05, e32


def test_masked_region_stays_zero():
    score = _analytic_score_fn(jnp.zeros((1, 8, 4)), jnp.ones((1, 8, 4)), 0.5)
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]], dtype=jnp.float32)
    mu = jnp.zeros((1, 8, 4))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 4))
    out = reverse_diffusion_dpm(score, z * mask[:, :, None], mask, mu, 3,
                                BETA_MIN, BETA_MAX)
    np.testing.assert_array_equal(np.asarray(out[0, 4:]), 0.0)


@pytest.fixture(scope="module")
def tiny_gradtts():
    from tpu_speech.models.grad_tts import GradTTS

    model = GradTTS(n_vocab=20, n_enc_channels=16, filter_channels=32,
                    filter_channels_dp=16, n_heads=2, n_enc_layers=1,
                    window_size=2, n_feats=8, dec_dim=8, pe_scale=1000.0)
    x = jnp.array([[1, 5, 3, 2, 0, 0]], dtype=jnp.int32)
    xl = jnp.array([4], dtype=jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 8))
    yl = jnp.array([24], dtype=jnp.int32)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, xl, y, yl,
        jax.random.PRNGKey(1), train=False)
    return model, params, x, xl


def test_gradtts_synthesize_dpm(tiny_gradtts):
    from tpu_speech.models.grad_tts import synthesize

    model, params, x, xl = tiny_gradtts
    rng = jax.random.PRNGKey(42)
    # many-step Euler limit vs 6-call dpm on the same z
    _, dec_gt, _, yl_gt = synthesize(model, params, x, xl, 400, 32, rng=rng)
    _, dec_dpm, _, yl_dpm = synthesize(model, params, x, xl, 6, 32, rng=rng,
                                       solver="dpm")
    _, dec_e10, _, _ = synthesize(model, params, x, xl, 10, 32, rng=rng)
    assert int(yl_gt[0]) == int(yl_dpm[0])
    scale = float(jnp.max(jnp.abs(dec_gt)))
    err_dpm = float(jnp.max(jnp.abs(dec_dpm - dec_gt))) / scale
    err_e10 = float(jnp.max(jnp.abs(dec_e10 - dec_gt))) / scale
    # a random-init U-Net is NOT a valid score, making the ODE maximally
    # stiff (euler@10 lands ~0.7 relative from its own limit); the claim is
    # 6 dpm calls land >2x closer than 10 euler calls, not tiny abs error
    assert err_dpm < 0.35, err_dpm
    assert err_dpm < err_e10 / 2, (err_dpm, err_e10)


def test_gradtts_dpm_rejects_stoc(tiny_gradtts):
    from tpu_speech.models.grad_tts import synthesize

    model, params, x, xl = tiny_gradtts
    with pytest.raises(ValueError):
        synthesize(model, params, x, xl, 6, 32, stoc=True, solver="dpm")


@pytest.mark.slow  # three full sampler compiles incl. a 400-step limit run
def test_diffvc_dpm_matches_pf_limit():
    from tpu_speech.models.diffvc.vc import DiffVC, voice_convert

    model = DiffVC(n_feats=8, channels=8, filters=16, heads=2, layers=1,
                   kernel=3, dropout=0.0, window_size=2, enc_dim=16,
                   spk_dim=16, use_ref_t=True, dec_dim=16, beta_min=0.05,
                   beta_max=20.0)
    B, T, F = 1, 32, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    xl = jnp.array([T], dtype=jnp.int32)
    xr = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, 16))
    params = model.init(jax.random.PRNGKey(3), x, xl, xr, c,
                        jax.random.PRNGKey(4), train=False)
    rng = jax.random.PRNGKey(7)
    out_pf = voice_convert(model, params, x, xl, xr, xl, c, 400, "pf", rng)[1]
    out_dpm = voice_convert(model, params, x, xl, xr, xl, c, 6, "dpm", rng)[1]
    out_pf30 = voice_convert(model, params, x, xl, xr, xl, c, 30, "pf", rng)[1]
    scale = float(jnp.max(jnp.abs(out_pf)))
    err_dpm = float(jnp.max(jnp.abs(out_dpm - out_pf))) / scale
    err_pf30 = float(jnp.max(jnp.abs(out_pf30 - out_pf))) / scale
    # 6 dpm calls vs 30 Euler pf steps on the same (stiff, random-weight)
    # conditional field: 5x fewer NFE AND >2x closer to the pf limit
    assert err_dpm < 0.2, err_dpm
    assert err_dpm < err_pf30 / 2, (err_dpm, err_pf30)


@pytest.mark.slow  # K+1 sampler runs (one compile each for ml/dpm)
def test_diffvc_dpm_within_ml_ensemble_scatter():
    """mel-MAE gate anchored at the reference serving op-point (30-step
    `ml`, DiffVC/inference.ipynb cell 7): the deterministic dpm@6 output
    must land inside the ml@30 noise-seed ensemble's own scatter — i.e. the
    fast sampler is no further from the ml ensemble mean than a typical ml
    sample is. This is the sampler-swap quality claim for serving
    (bench.py::diffvc_conversion_rtf_dpm6); the discretization-error gate
    vs the pf limit is test_diffvc_dpm_matches_pf_limit above."""
    from tpu_speech.models.diffvc.vc import DiffVC, voice_convert

    model = DiffVC(n_feats=8, channels=8, filters=16, heads=2, layers=1,
                   kernel=3, dropout=0.0, window_size=2, enc_dim=16,
                   spk_dim=16, use_ref_t=True, dec_dim=16, beta_min=0.05,
                   beta_max=20.0)
    B, T, F = 1, 32, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    xl = jnp.array([T], dtype=jnp.int32)
    xr = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, 16))
    params = model.init(jax.random.PRNGKey(3), x, xl, xr, c,
                        jax.random.PRNGKey(4), train=False)

    K = 6
    # all runs share the z-draw rng (fold_in structure inside voice_convert
    # keeps the initial z identical per seed index), so the ensemble spread
    # below is the ml sampler's own injected-noise scatter
    ml = jnp.stack([
        voice_convert(model, params, x, xl, xr, xl, c, 30, "ml",
                      jax.random.PRNGKey(100 + i))[1]
        for i in range(K)
    ])
    center = jnp.mean(ml, axis=0)
    scatter = float(jnp.mean(jnp.abs(ml - center[None])))
    out_dpm = voice_convert(model, params, x, xl, xr, xl, c, 6, "dpm",
                            jax.random.PRNGKey(100))[1]
    mae_dpm = float(jnp.mean(jnp.abs(out_dpm - center)))
    assert mae_dpm < 1.5 * scatter, (mae_dpm, scatter)
