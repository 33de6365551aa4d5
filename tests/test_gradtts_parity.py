"""Parity tests: our flax Grad-TTS vs the reference PyTorch implementation
with converted weights. Exercises the compat converter + every module in the
text encoder and U-Net, plus the full deterministic reverse-SDE loop."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_speech.compat.torch_gradtts import (  # noqa: E402
    convert_estimator,
    convert_gradtts,
    convert_text_encoder,
)
from tpu_speech.models.diffusion import reverse_diffusion  # noqa: E402
from tpu_speech.models.grad_tts import GradTTS  # noqa: E402
from tpu_speech.models.text_encoder import TextEncoder  # noqa: E402
from tpu_speech.nn.unet import GradLogPEstimator2d  # noqa: E402
from reference_oracle import load_gradtts_reference  # noqa: E402

# small config to keep CPU runtime sane while covering every code path
CFG = dict(
    n_vocab=50,
    n_spks=1,
    spk_emb_dim=16,
    n_enc_channels=48,
    filter_channels=96,
    filter_channels_dp=64,
    n_heads=2,
    n_enc_layers=2,
    enc_kernel=3,
    enc_dropout=0.1,
    window_size=4,
    n_feats=16,
    dec_dim=16,
    beta_min=0.05,
    beta_max=20.0,
    pe_scale=1000.0,
)


@pytest.fixture(scope="module")
def ref():
    return load_gradtts_reference()


@pytest.fixture(scope="module")
def torch_model(ref):
    torch.manual_seed(0)
    m = ref.GradTTS(
        CFG["n_vocab"], CFG["n_spks"], CFG["spk_emb_dim"], CFG["n_enc_channels"],
        CFG["filter_channels"], CFG["filter_channels_dp"], CFG["n_heads"],
        CFG["n_enc_layers"], CFG["enc_kernel"], CFG["enc_dropout"],
        CFG["window_size"], CFG["n_feats"], CFG["dec_dim"], CFG["beta_min"],
        CFG["beta_max"], CFG["pe_scale"],
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_model():
    return GradTTS(**CFG)


def _inputs(rng, b=2, t_x=11):
    x = rng.integers(1, CFG["n_vocab"], size=(b, t_x)).astype(np.int32)
    x_lengths = np.array([t_x, t_x - 4], dtype=np.int32)
    return x, x_lengths


def test_text_encoder_parity(ref, torch_model, jax_model, rng):
    x, x_lengths = _inputs(rng)
    with torch.no_grad():
        mu_t, logw_t, mask_t = torch_model.encoder(
            torch.from_numpy(x).long(), torch.from_numpy(x_lengths)
        )
    params = {"params": convert_text_encoder(
        torch_model.state_dict(), "encoder", CFG["n_enc_layers"])}
    enc = TextEncoder(
        CFG["n_vocab"], CFG["n_feats"], CFG["n_enc_channels"],
        CFG["filter_channels"], CFG["filter_channels_dp"], CFG["n_heads"],
        CFG["n_enc_layers"], CFG["enc_kernel"], CFG["enc_dropout"],
        CFG["window_size"], CFG["spk_emb_dim"], CFG["n_spks"],
    )
    mu_j, logw_j, mask_j = enc.apply(
        params, jnp.asarray(x), jnp.asarray(x_lengths)
    )
    # reference layouts: mu (B,F,T), logw (B,1,T), mask (B,1,T)
    np.testing.assert_allclose(
        np.asarray(mu_j), mu_t.numpy().transpose(0, 2, 1), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(logw_j), logw_t.numpy()[:, 0, :], atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(mask_j), mask_t.numpy()[:, 0, :])


def test_estimator_parity(torch_model, jax_model, rng):
    b, t_y, f = 2, 16, CFG["n_feats"]
    xt = rng.standard_normal((b, f, t_y)).astype(np.float32)
    mu = rng.standard_normal((b, f, t_y)).astype(np.float32)
    mask = np.ones((b, 1, t_y), dtype=np.float32)
    mask[1, :, 12:] = 0
    t = np.array([0.3, 0.8], dtype=np.float32)

    est_t = torch_model.decoder.estimator
    with torch.no_grad():
        out_t = est_t(
            torch.from_numpy(xt), torch.from_numpy(mask),
            torch.from_numpy(mu), torch.from_numpy(t),
        )

    params = {"params": convert_estimator(torch_model.state_dict())}
    est_j = GradLogPEstimator2d(
        dim=CFG["dec_dim"], n_spks=1, spk_emb_dim=CFG["spk_emb_dim"],
        n_feats=f, pe_scale=CFG["pe_scale"],
    )
    out_j = est_j.apply(
        params,
        jnp.asarray(xt.transpose(0, 2, 1)),
        jnp.asarray(mask[:, 0, :]),
        jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(t),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 1), atol=2e-5
    )


def test_reverse_sde_parity(torch_model, jax_model, rng):
    """Same z in -> same mel out through the full N-step reverse loop."""
    b, t_y, f = 1, 8, CFG["n_feats"]
    z = rng.standard_normal((b, f, t_y)).astype(np.float32)
    mu = rng.standard_normal((b, f, t_y)).astype(np.float32)
    mask = np.ones((b, 1, t_y), dtype=np.float32)
    n_steps = 5

    with torch.no_grad():
        out_t = torch_model.decoder.reverse_diffusion(
            torch.from_numpy(z), torch.from_numpy(mask), torch.from_numpy(mu),
            n_steps, stoc=False,
        )

    params = convert_gradtts(torch_model.state_dict(), n_enc_layers=CFG["n_enc_layers"])
    model = GradTTS(**CFG)

    def score_fn(xt, t):
        return model.apply(
            params, xt, jnp.asarray(mask[:, 0, :]),
            jnp.asarray(mu.transpose(0, 2, 1)), t, None,
            method=GradTTS.score,
        )

    out_j = reverse_diffusion(
        score_fn,
        jnp.asarray(z.transpose(0, 2, 1)),
        jnp.asarray(mask[:, 0, :]),
        jnp.asarray(mu.transpose(0, 2, 1)),
        n_steps, CFG["beta_min"], CFG["beta_max"], stoc=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 1), atol=5e-5
    )


def test_param_counts_match(torch_model, jax_model):
    params = convert_gradtts(torch_model.state_dict(), n_enc_layers=CFG["n_enc_layers"])
    n_jax = sum(x.size for x in jax.tree.leaves(params))
    n_torch = sum(p.numel() for p in torch_model.parameters())
    assert n_jax == n_torch


@pytest.mark.slow
def test_init_shapes_match_converted(torch_model, jax_model):
    """Our randomly initialized tree has identical structure/shapes to the
    converted reference tree -> checkpoints are interchangeable."""
    x = jnp.ones((1, 7), dtype=jnp.int32)
    xl = jnp.array([7])
    y = jnp.ones((1, 12, CFG["n_feats"]))
    yl = jnp.array([12])
    init = jax_model.init(
        {"params": jax.random.PRNGKey(0)}, x, xl, y, yl,
        jax.random.PRNGKey(1), train=False,
    )
    conv = convert_gradtts(torch_model.state_dict(), n_enc_layers=CFG["n_enc_layers"])
    init_shapes = jax.tree.map(lambda a: a.shape, init)
    conv_shapes = jax.tree.map(lambda a: tuple(a.shape), conv)
    assert init_shapes == conv_shapes


MS_CFG = dict(CFG, n_spks=4, n_feats=80)  # reference estimator hardcodes n_feats=80 for spk_mlp (diffusion.py:140-141 default)


@pytest.fixture(scope="module")
def torch_model_ms(ref):
    torch.manual_seed(1)
    m = ref.GradTTS(
        MS_CFG["n_vocab"], MS_CFG["n_spks"], MS_CFG["spk_emb_dim"],
        MS_CFG["n_enc_channels"], MS_CFG["filter_channels"],
        MS_CFG["filter_channels_dp"], MS_CFG["n_heads"],
        MS_CFG["n_enc_layers"], MS_CFG["enc_kernel"], MS_CFG["enc_dropout"],
        MS_CFG["window_size"], MS_CFG["n_feats"], MS_CFG["dec_dim"],
        MS_CFG["beta_min"], MS_CFG["beta_max"], MS_CFG["pe_scale"],
    )
    m.eval()
    return m


@pytest.mark.slow
def test_multispeaker_parity(torch_model_ms, rng):
    """Speaker-conditioned path: spk embedding -> encoder concat + estimator
    extra channel (tts.py:70-72, diffusion.py:139-146, 174-185)."""
    from tpu_speech.compat.torch_gradtts import (
        convert_gradtts, convert_text_encoder,
    )

    x, x_lengths = _inputs(rng)
    spk = np.array([1, 3], dtype=np.int64)
    with torch.no_grad():
        spk_e = torch_model_ms.spk_emb(torch.from_numpy(spk))
        mu_t, logw_t, _ = torch_model_ms.encoder(
            torch.from_numpy(x).long(), torch.from_numpy(x_lengths), spk_e
        )

    params = convert_gradtts(
        torch_model_ms.state_dict(), n_spks=MS_CFG["n_spks"],
        n_enc_layers=MS_CFG["n_enc_layers"],
    )
    model = GradTTS(**MS_CFG)
    mu_j, logw_j, _ = model.apply(
        params, jnp.asarray(x), jnp.asarray(x_lengths),
        jnp.asarray(spk.astype(np.int32)), method=GradTTS.encode,
    )
    np.testing.assert_allclose(
        np.asarray(mu_j), mu_t.numpy().transpose(0, 2, 1), atol=3e-5
    )

    # estimator with spk channel
    b, t_y, f = 2, 8, MS_CFG["n_feats"]  # 80
    xt = rng.standard_normal((b, f, t_y)).astype(np.float32)
    mu = rng.standard_normal((b, f, t_y)).astype(np.float32)
    mask = np.ones((b, 1, t_y), dtype=np.float32)
    t = np.array([0.2, 0.7], dtype=np.float32)
    with torch.no_grad():
        out_t = torch_model_ms.decoder.estimator(
            torch.from_numpy(xt), torch.from_numpy(mask),
            torch.from_numpy(mu), torch.from_numpy(t), spk_e,
        )
    out_j = model.apply(
        params, jnp.asarray(xt.transpose(0, 2, 1)), jnp.asarray(mask[:, 0]),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t),
        jnp.asarray(spk.astype(np.int32)), method=GradTTS.score,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 1), atol=3e-5
    )
