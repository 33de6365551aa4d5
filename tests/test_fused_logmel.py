"""Fused STFT->log-mel Pallas kernel vs the jnp/rfft oracle.

The kernel replaces the featurizer hot path (reference pipelines:
Grad-TTS/hifi-gan/meldataset.py:51-74 and
SPIRAL/nemo/collections/asr/parts/features.py:228-455). On CPU the kernel
runs in Pallas interpret mode — semantics-exact, so fp32 comparisons are
tight; the bf16-operand mode is checked at its expected precision.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_speech.audio.mel import frame_signal, hann_window, mel_filterbank
from tpu_speech.models.spiral.features import (
    filterbank_features,
    hann_window_symmetric,
)
from tpu_speech.ops.fused_logmel import fused_logmel, logmel_reference


def _spiral_setup():
    n_fft, hop, win_len, n_mels, sr = 512, 160, 320, 128, 16000
    win = np.zeros(n_fft, np.float32)
    lp = (n_fft - win_len) // 2
    win[lp:lp + win_len] = hann_window_symmetric(win_len)
    fb = mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2)
    return n_fft, hop, win, fb


def test_kernel_matches_oracle_spiral_convention(rng):
    n_fft, hop, win, fb = _spiral_setup()
    x = jnp.asarray((rng.standard_normal((3, 20000)) * 0.1).astype(np.float32))
    t = 1 + (x.shape[1] - n_fft) // hop
    ref = logmel_reference(x, win, fb, n_fft=n_fft, hop_length=hop,
                           num_frames=t)
    out = fused_logmel(x, win, fb, n_fft=n_fft, hop_length=hop, num_frames=t,
                       fp32_matmul=True, block_frames=64)
    assert out.shape == (3, t, fb.shape[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_kernel_matches_oracle_hifigan_convention(rng):
    n_fft, hop, n_mels, sr = 1024, 256, 80, 22050
    win = hann_window(n_fft)
    fb = mel_filterbank(sr, n_fft, n_mels, 0.0, 8000.0)
    x = jnp.asarray((rng.standard_normal((2, 40000)) * 0.1).astype(np.float32))
    t = 1 + (x.shape[1] - n_fft) // hop
    ref = logmel_reference(x, win, fb, n_fft=n_fft, hop_length=hop,
                           num_frames=t, mag_mode="mag_eps", log_mode="clip",
                           log_guard=1e-5)
    out = fused_logmel(x, win, fb, n_fft=n_fft, hop_length=hop, num_frames=t,
                       mag_mode="mag_eps", log_mode="clip", log_guard=1e-5,
                       fp32_matmul=True, block_frames=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_kernel_bf16_mode_precision(rng):
    n_fft, hop, win, fb = _spiral_setup()
    x = jnp.asarray((rng.standard_normal((2, 12000)) * 0.1).astype(np.float32))
    t = 1 + (x.shape[1] - n_fft) // hop
    ref = logmel_reference(x, win, fb, n_fft=n_fft, hop_length=hop,
                           num_frames=t)
    out = fused_logmel(x, win, fb, n_fft=n_fft, hop_length=hop, num_frames=t,
                       fp32_matmul=False, block_frames=64)
    # bf16 MXU operands: same effective precision XLA uses for jnp.matmul on
    # TPU. log space amplifies near-zero mel bins, so bound the bulk (p99.9)
    # and the mean rather than the max.
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert float(np.quantile(err, 0.999)) < 8e-2, float(np.quantile(err, 0.999))
    assert float(err.mean()) < 5e-3, float(err.mean())


@pytest.mark.parametrize("frames_total", [1, 7, 64, 65])
def test_kernel_frame_count_edges(rng, frames_total):
    n_fft, hop, win, fb = _spiral_setup()
    n = (frames_total - 1) * hop + n_fft
    x = jnp.asarray((rng.standard_normal((1, n)) * 0.1).astype(np.float32))
    ref = logmel_reference(x, win, fb, n_fft=n_fft, hop_length=hop,
                           num_frames=frames_total)
    out = fused_logmel(x, win, fb, n_fft=n_fft, hop_length=hop,
                       num_frames=frames_total, fp32_matmul=True,
                       block_frames=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_filterbank_features_fused_matches_rfft_path(rng):
    wavs = jnp.asarray(
        (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    )
    lens = jnp.asarray([16000, 12000], dtype=jnp.int32)
    base, base_lens = filterbank_features(wavs, lens, use_fused_kernel=False)
    fused, fused_lens = filterbank_features(
        wavs, lens, use_fused_kernel=True
    )
    np.testing.assert_array_equal(np.asarray(base_lens),
                                  np.asarray(fused_lens))
    # fp32 (3-pass) kernel matmuls: end-to-end agreement incl. per-feature
    # normalization is ~1e-4
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=1e-3)


@pytest.mark.parametrize(
    "frame_len,hop", [(8, 4), (512, 160), (1024, 256), (7, 3), (4, 6), (5, 5)]
)
def test_frame_signal_polyphase_matches_gather(rng, frame_len, hop):
    n = 61 * hop + frame_len + 3
    y = rng.standard_normal((2, n)).astype(np.float32)
    got = np.asarray(frame_signal(jnp.asarray(y), frame_len, hop))
    t = 1 + (n - frame_len) // hop
    idx = np.arange(t)[:, None] * hop + np.arange(frame_len)[None, :]
    np.testing.assert_array_equal(got, y[:, idx])
