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


def test_logmmse_denoise_improves_snr():
    """logMMSE (audio/logmmse.py, reference speaker_encoder/utils/logmmse.py):
    denoising a tone buried in stationary noise must raise the SNR and keep
    length/dtype."""
    import numpy as np

    from tpu_speech.audio.logmmse import denoise, profile_noise

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(2 * sr) / sr
    clean = 0.5 * np.sin(2 * np.pi * 440 * t)
    noise = 0.2 * rng.standard_normal(2 * sr)
    noisy = (clean + noise).astype(np.float32)

    prof = profile_noise(noise[: sr // 2], sr)
    out = denoise(noisy, prof)
    assert out.shape == noisy.shape and out.dtype == np.float32

    def snr(sig):
        err = sig[: len(clean)] - clean
        return 10 * np.log10(np.sum(clean**2) / np.sum(err**2))

    # ignore edge frames (overlap-add warmup)
    assert snr(out) > snr(noisy) + 3.0
