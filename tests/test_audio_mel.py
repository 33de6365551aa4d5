import jax.numpy as jnp
import numpy as np
import pytest

from tpu_speech.audio.mel import (
    frame_signal,
    hann_window,
    hz_to_mel,
    mel_filterbank,
    mel_spectrogram,
    mel_to_hz,
    stft_magnitude,
)

torch = pytest.importorskip("torch")


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0, 11025.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_mel_scale_slaney_anchors():
    # linear below 1 kHz with 200/3 Hz per mel; 1000 Hz == 15 mel
    assert np.isclose(hz_to_mel(1000.0), 15.0)
    assert np.isclose(hz_to_mel(500.0), 7.5)
    # log region: 6400 Hz is 27 mel above 1000 Hz
    assert np.isclose(hz_to_mel(6400.0), 42.0)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()
    # no energy above fmax bin or at exactly-zero row duplication
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs > 8000.0 + 30].sum() == 0
    # slaney norm: each filter integrates to ~2/(band width) * triangle area = const-ish;
    # check the classic equal-area property approximately on interior filters
    areas = fb.sum(axis=1)
    assert areas[10:70].std() / areas[10:70].mean() < 0.2


def test_hann_window_matches_torch():
    w = hann_window(1024)
    tw = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(w, tw, atol=1e-6)


def test_frame_signal():
    y = jnp.arange(20, dtype=jnp.float32)[None]
    frames = frame_signal(y, 8, 4)
    assert frames.shape == (1, 4, 8)
    np.testing.assert_array_equal(np.asarray(frames[0, 1]), np.arange(4, 12))


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop = 1024, 256
    win = hann_window(n_fft)
    got = np.asarray(
        stft_magnitude(jnp.asarray(y), n_fft, hop, n_fft, jnp.asarray(win))
    )  # (B, T, F)
    ty = torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.from_numpy(win),
        center=False,
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    want = torch.sqrt(ty.real**2 + ty.imag**2 + 1e-9).numpy()  # (B, F, T)
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=2e-4)


def test_mel_spectrogram_reference_convention():
    # mirrors hifi-gan meldataset.mel_spectrogram: pad (n_fft-hop)/2 reflect,
    # center=False -> exactly ceil(N/hop) frames for N multiple of hop
    rng = np.random.default_rng(1)
    y = (rng.standard_normal((1, 256 * 64)) * 0.1).astype(np.float32)
    mel = mel_spectrogram(jnp.asarray(y))
    assert mel.shape == (1, 64 - 3, 80) or mel.shape[1] > 0
    m = np.asarray(mel)
    assert np.isfinite(m).all()
    assert m.min() >= np.log(1e-5) - 1e-6
