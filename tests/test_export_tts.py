"""TTS serving export: the one-program text->waveform graph round-trips
through a serialized StableHLO artifact (cli/export_tts.py).

TPU-native analog of the reference's Exportable surface
(SPIRAL/nemo/core/classes/exportable.py), extended to the TTS family the
reference never exported.
"""

import os
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "cli"))

from tpu_speech.models.grad_tts import GradTTS
from tpu_speech.models.hifigan import Generator
from tpu_speech.utils.export import export_fn, load_exported


def _tiny_models():
    model = GradTTS(
        n_vocab=20, n_enc_channels=16, filter_channels=32,
        filter_channels_dp=16, n_heads=2, n_enc_layers=1, enc_kernel=3,
        enc_dropout=0.0, window_size=2, n_feats=8, dec_dim=8,
    )
    x = np.ones((1, 8), dtype=np.int32)
    xl = np.array([8], dtype=np.int32)
    y = np.zeros((1, 16, 8), dtype=np.float32)
    yl = np.array([16], dtype=np.int32)
    params = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, x, xl, y, yl,
        jax.random.PRNGKey(1), train=False,
    )
    voc = Generator(
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    vparams = jax.jit(voc.init)(
        jax.random.PRNGKey(2), np.zeros((1, 16, 8), dtype=np.float32)
    )
    return model, params, voc, vparams


@pytest.mark.parametrize(
    "with_vocoder",
    # the vocoder variant serializes/recompiles the full e2e graph (~70 s on
    # this 1-core box) — slow tier; the mel-only roundtrip covers the export
    # machinery in the quick tier
    [pytest.param(True, marks=pytest.mark.slow), False],
)
def test_export_tts_roundtrip(tmp_path, with_vocoder):
    from export_tts import build_serving_fn

    model, params, voc, vparams = _tiny_models()
    hop = 4  # prod(upsample_rates)
    fn, ex = build_serving_fn(
        model, params,
        voc if with_vocoder else None, vparams if with_vocoder else None,
        n_timesteps=2, y_max_length=16, max_text_len=8, hop_length=hop,
    )
    path = str(tmp_path / "tts.stablehlo")
    export_fn(fn, ex, path, platforms=("cpu",))
    assert os.path.getsize(path) > 0

    art = load_exported(path)
    x = np.zeros((1, 8), dtype=np.int32)
    x[0, :5] = [3, 1, 4, 1, 5]
    xl = np.array([5], dtype=np.int32)
    seed = np.zeros((), dtype=np.int32)
    out, out_lengths = art.call(x, xl, seed)
    out, out_lengths = np.asarray(out), np.asarray(out_lengths)
    if with_vocoder:
        assert out.shape == (1, 16 * hop)
        assert 0 < int(out_lengths[0]) <= 16 * hop
        assert int(out_lengths[0]) % hop == 0
    else:
        assert out.shape == (1, 16, 8)
        assert 0 < int(out_lengths[0]) <= 16
    assert np.isfinite(out).all()

    # matches the direct (unexported) jit to fp32 tolerance
    direct = np.asarray(jax.jit(fn)(x, xl, seed)[0])
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-5)

    # a different seed draws different diffusion noise
    out2, _ = art.call(x, xl, np.ones((), dtype=np.int32))
    assert np.abs(np.asarray(out2) - out).max() > 0


def test_export_tts_bf16_and_batch(tmp_path):
    from export_tts import build_serving_fn

    model, params, voc, vparams = _tiny_models()
    fn, ex = build_serving_fn(
        model, params, voc, vparams, n_timesteps=2, y_max_length=16,
        max_text_len=8, hop_length=4, batch_size=2, bf16=True,
    )
    path = str(tmp_path / "tts_bf16.stablehlo")
    export_fn(fn, ex, path, platforms=("cpu",))
    art = load_exported(path)
    x = np.ones((2, 8), dtype=np.int32)
    xl = np.array([8, 5], dtype=np.int32)
    out, _ = art.call(x, xl, np.zeros((), dtype=np.int32))
    out = np.asarray(out)
    assert out.shape == (2, 64) and out.dtype == np.float32
    assert np.isfinite(out).all()
