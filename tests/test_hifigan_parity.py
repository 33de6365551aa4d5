"""HiFi-GAN generator parity vs the vendored reference implementation."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_speech.compat.torch_hifigan import convert_generator  # noqa: E402
from tpu_speech.models.hifigan import (  # noqa: E402
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)

HIFIGAN_DIR = "/root/reference/Grad-TTS/hifi-gan"

# small config: full V1 topology shape but fewer channels for CPU speed
SMALL = dict(
    resblock="1",
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=64,
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
)


class AttrDict(dict):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


@pytest.fixture(scope="module")
def torch_gen():
    if HIFIGAN_DIR not in sys.path:
        sys.path.insert(0, HIFIGAN_DIR)
    import models as ref_models  # the reference hifi-gan/models.py

    torch.manual_seed(0)
    h = AttrDict(dict(SMALL))
    g = ref_models.Generator(h)
    g.remove_weight_norm()
    g.eval()
    return g


def test_generator_parity(torch_gen, rng):
    mel = rng.standard_normal((1, 80, 23)).astype(np.float32) * 0.5
    with torch.no_grad():
        wav_t = torch_gen(torch.from_numpy(mel)).numpy()  # (B, 1, N)

    params = convert_generator(torch_gen.state_dict())
    gen = Generator(**SMALL)
    wav_j = gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1)))
    assert wav_j.shape == (1, 23 * 256)
    np.testing.assert_allclose(np.asarray(wav_j), wav_t[:, 0, :], atol=2e-5)


def test_generator_weightnorm_fold(torch_gen, rng):
    """Converter must also fold raw (unfolded) weight-norm checkpoints."""
    if HIFIGAN_DIR not in sys.path:
        sys.path.insert(0, HIFIGAN_DIR)
    import models as ref_models

    torch.manual_seed(1)
    h = AttrDict(dict(SMALL))
    g = ref_models.Generator(h)  # weight norm still applied
    g.eval()
    sd_folded = {k: v for k, v in g.state_dict().items()}  # has weight_g/weight_v
    params = convert_generator(sd_folded)
    mel = rng.standard_normal((1, 80, 11)).astype(np.float32) * 0.3
    with torch.no_grad():
        wav_t = g(torch.from_numpy(mel)).numpy()
    gen = Generator(**SMALL)
    wav_j = gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(wav_j), wav_t[:, 0, :], atol=2e-5)


@pytest.mark.slow
def test_discriminators_and_losses_smoke(rng):
    y = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    mpd = MultiPeriodDiscriminator()
    vars_p = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, fr, fg = mpd.apply(vars_p, y, y_hat)
    assert len(rs) == 5 and len(fr[0]) == 6
    msd = MultiScaleDiscriminator()
    vars_s = msd.init(jax.random.PRNGKey(1), y, y_hat)
    rs2, gs2, fr2, fg2 = msd.apply(vars_s, y, y_hat)
    assert len(rs2) == 3

    d_loss, _, _ = discriminator_loss(rs, gs)
    g_loss, _ = generator_loss(gs)
    f_loss = feature_loss(fr, fg)
    for v in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(v))
