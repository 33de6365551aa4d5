"""DiffVC parity vs the reference PyTorch implementation: average-voice
encoder, conditional U-Net (with RefBlock), SDE algebra, and samplers."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_speech.compat.torch_diffvc import (  # noqa: E402
    convert_diffvc,
    convert_estimator_vc,
    convert_fwd_diffusion,
)
from tpu_speech.models.diffvc import DiffVC, FwdDiffusion, GradLogPEstimatorVC  # noqa: E402
from tpu_speech.models.diffvc import diffusion as vdiff  # noqa: E402
import tpu_speech.models.diffvc.diffusion as diffusion_mod  # noqa: E402
from reference_oracle import load_diffvc_reference  # noqa: E402

CFG = dict(
    n_feats=16, channels=32, filters=64, heads=2, layers=2, kernel=3,
    dropout=0.1, window_size=4, enc_dim=16, spk_dim=32, use_ref_t=True,
    dec_dim=32, beta_min=0.05, beta_max=20.0,
)


@pytest.fixture(scope="module")
def ref():
    return load_diffvc_reference()


@pytest.fixture(scope="module")
def torch_model(ref):
    torch.manual_seed(0)
    m = ref.DiffVC(
        CFG["n_feats"], CFG["channels"], CFG["filters"], CFG["heads"],
        CFG["layers"], CFG["kernel"], CFG["dropout"], CFG["window_size"],
        CFG["enc_dim"], CFG["spk_dim"], CFG["use_ref_t"], CFG["dec_dim"],
        CFG["beta_min"], CFG["beta_max"],
    )
    m.eval()
    return m


def test_fwd_diffusion_encoder_parity(torch_model, rng):
    b, t, f = 2, 24, CFG["n_feats"]
    x = rng.standard_normal((b, f, t)).astype(np.float32)
    mask = np.ones((b, 1, t), dtype=np.float32)
    mask[1, :, 20:] = 0
    with torch.no_grad():
        out_t = torch_model.encoder(torch.from_numpy(x), torch.from_numpy(mask))

    params = {"params": convert_fwd_diffusion(
        torch_model.encoder.state_dict(), "", CFG["layers"])}
    enc = FwdDiffusion(
        CFG["n_feats"], CFG["channels"], CFG["filters"], CFG["heads"],
        CFG["layers"], CFG["kernel"], CFG["dropout"], CFG["window_size"],
        CFG["enc_dim"],
    )
    out_j = enc.apply(
        params, jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 1), atol=3e-5
    )


def test_estimator_vc_parity(torch_model, rng):
    b, t, f = 2, 16, CFG["n_feats"]
    xt = rng.standard_normal((b, f, t)).astype(np.float32)
    mean = rng.standard_normal((b, f, t)).astype(np.float32)
    ref_mel = rng.standard_normal((b, f, t)).astype(np.float32)
    mask = np.ones((b, 1, t), dtype=np.float32)
    ref_mask = np.ones((b, 1, t), dtype=np.float32)
    ref_mask[1, :, 10:] = 0
    c = rng.standard_normal((b, 256)).astype(np.float32)
    tt = np.array([0.4, 0.9], dtype=np.float32)

    est_t = torch_model.decoder.estimator
    with torch.no_grad():
        out_t = est_t(
            torch.from_numpy(xt), torch.from_numpy(mask),
            torch.from_numpy(mean),
            torch.from_numpy(ref_mel).unsqueeze(1),
            torch.from_numpy(ref_mask), torch.from_numpy(c),
            torch.from_numpy(tt),
        )

    params = {"params": convert_estimator_vc(
        torch_model.state_dict(), "decoder.estimator", CFG["use_ref_t"])}
    est_j = GradLogPEstimatorVC(CFG["dec_dim"], CFG["spk_dim"], CFG["use_ref_t"])
    out_j = est_j.apply(
        params,
        jnp.asarray(xt.transpose(0, 2, 1)), jnp.asarray(mask[:, 0]),
        jnp.asarray(mean.transpose(0, 2, 1)),
        jnp.asarray(ref_mel.transpose(0, 2, 1)), jnp.asarray(ref_mask[:, 0]),
        jnp.asarray(c), jnp.asarray(tt),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 1), atol=3e-5
    )


def test_sde_algebra_matches_reference(torch_model):
    d = torch_model.decoder
    bmin, bmax = CFG["beta_min"], CFG["beta_max"]
    for s, t in [(0.0, 0.5), (0.3, 0.7), (0.9, 1.0), (0.0, 1.0)]:
        assert np.isclose(
            float(vdiff.get_gamma(s, t, bmin, bmax)), d.get_gamma(s, t),
            rtol=1e-6,
        )
        if s > 0:
            assert np.isclose(
                float(vdiff.get_mu(s, t, bmin, bmax)), d.get_mu(s, t), rtol=1e-5
            )
            assert np.isclose(
                float(vdiff.get_nu(s, t, bmin, bmax)), d.get_nu(s, t), rtol=1e-5
            )
            assert np.isclose(
                float(vdiff.get_sigma(s, t, bmin, bmax)), d.get_sigma(s, t),
                rtol=1e-5,
            )


@pytest.mark.parametrize("mode", ["pf", "ml", "em"])
def test_reverse_diffusion_parity(torch_model, rng, mode, monkeypatch):
    """pf is deterministic; for ml/em we zero the injected noise on both
    sides so the drift terms (kappa/omega/sigma algebra) are compared."""
    b, t, f = 1, 8, CFG["n_feats"]
    z = rng.standard_normal((b, f, t)).astype(np.float32)
    mean = rng.standard_normal((b, f, t)).astype(np.float32)
    ref_mel = rng.standard_normal((b, f, t)).astype(np.float32)
    mean_ref = rng.standard_normal((b, f, t)).astype(np.float32)
    mask = np.ones((b, 1, t), dtype=np.float32)
    c = rng.standard_normal((b, 256)).astype(np.float32)
    n_steps = 4

    if mode in ("ml", "em"):
        monkeypatch.setattr(
            torch, "randn_like", lambda x, **kw: torch.zeros_like(x)
        )
        real_normal = jax.random.normal
        monkeypatch.setattr(
            diffusion_mod.jax.random, "normal",
            lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
        )

    with torch.no_grad():
        out_t = torch_model.decoder.reverse_diffusion(
            torch.from_numpy(z), torch.from_numpy(mask),
            torch.from_numpy(mean), torch.from_numpy(ref_mel),
            torch.from_numpy(mask), torch.from_numpy(mean_ref),
            torch.from_numpy(c), n_steps, mode,
        )

    params = convert_diffvc(torch_model.state_dict(), CFG["use_ref_t"], CFG["layers"])
    model = DiffVC(**CFG)

    def score_fn(xt, xt_ref, tv):
        return model.apply(
            params, xt, jnp.asarray(mask[:, 0]),
            jnp.asarray(mean.transpose(0, 2, 1)), xt_ref,
            jnp.asarray(mask[:, 0]), jnp.asarray(c), tv,
            method=DiffVC.score,
        )

    out_j = vdiff.reverse_diffusion(
        score_fn, jnp.asarray(z.transpose(0, 2, 1)), jnp.asarray(mask[:, 0]),
        jnp.asarray(mean.transpose(0, 2, 1)),
        jnp.asarray(ref_mel.transpose(0, 2, 1)), jnp.asarray(mask[:, 0]),
        jnp.asarray(mean_ref.transpose(0, 2, 1)),
        n_steps, CFG["beta_min"], CFG["beta_max"], mode=mode,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 1),
        rtol=1e-4, atol=1e-3,
    )


@pytest.mark.slow
def test_init_shapes_match_converted(torch_model):
    model = DiffVC(**CFG)
    b, t, f = 1, 12, CFG["n_feats"]
    x = jnp.zeros((b, t, f))
    xl = jnp.array([t])
    c = jnp.zeros((b, 256))
    init = model.init(
        {"params": jax.random.PRNGKey(0)}, x, xl, x, c, jax.random.PRNGKey(1),
        train=False,
    )
    conv = convert_diffvc(torch_model.state_dict(), CFG["use_ref_t"], CFG["layers"])
    init_shapes = jax.tree.map(lambda a: tuple(a.shape), init)
    conv_shapes = jax.tree.map(lambda a: tuple(a.shape), conv)
    assert init_shapes == conv_shapes
