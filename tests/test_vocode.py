"""iSTFT / FastGL vocoding tests: roundtrip vs torch, sine reconstruction."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_speech.audio.mel import hann_window, mel_spectrogram_np
from tpu_speech.audio.vocode import fast_griffin_lim, istft, stft_complex


def test_istft_roundtrip():
    rng = np.random.default_rng(0)
    n_fft, hop = 1024, 256
    y = rng.standard_normal((1, 256 * 16)).astype(np.float32) * 0.3
    window = jnp.asarray(hann_window(n_fft))
    spec = stft_complex(jnp.asarray(y), n_fft, hop, window)
    y_rec = istft(spec, n_fft, hop, window, length=y.shape[1])
    np.testing.assert_allclose(np.asarray(y_rec), y, atol=1e-4)


def test_istft_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    n_fft, hop = 400, 160
    y = rng.standard_normal((2, 160 * 20)).astype(np.float32)
    window = hann_window(n_fft)
    spec = stft_complex(jnp.asarray(y), n_fft, hop, jnp.asarray(window))
    got = np.asarray(istft(spec, n_fft, hop, jnp.asarray(window)))
    st = torch.stft(
        torch.from_numpy(y), n_fft, hop_length=hop, win_length=n_fft,
        window=torch.from_numpy(window), center=True, return_complex=True,
    )
    want = torch.istft(
        st, n_fft, hop_length=hop, win_length=n_fft,
        window=torch.from_numpy(window), center=True,
    ).numpy()
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(got[:, :n], want[:, :n], atol=1e-4)


def test_fast_griffin_lim_reconstructs_tone():
    sr, n_fft, hop = 22050, 1024, 256
    t = np.arange(sr, dtype=np.float32) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mel = mel_spectrogram_np(wav)
    rec = np.asarray(fast_griffin_lim(jnp.asarray(mel), n_iters=32))
    # reconstructed signal must carry the 440 Hz tone as its dominant frequency
    spec = np.abs(np.fft.rfft(rec[0]))
    freqs = np.fft.rfftfreq(rec.shape[1], 1 / sr)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440) < 15, peak
    assert np.abs(rec).max() < 2.0
