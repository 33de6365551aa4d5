"""Mel filterbanks and STFT — TPU-native frontend.

Matches the reference's HiFi-GAN convention exactly
(Grad-TTS/hifi-gan/meldataset.py:51-74; identical copy in DiffVC):
reflect-pad (n_fft - hop)/2, torch.stft(center=False), |.| = sqrt(re^2+im^2+1e-9),
slaney-scale/slaney-norm librosa mel basis, log(clamp(., 1e-5)).

The filterbank is computed in numpy at setup time (librosa-compatible slaney
mel, reimplemented natively since librosa is not a dependency); the hot path is
frame-gather -> window -> rfft -> mel matmul, all fused under jit. Layout is
channels-last: (B, T, F) mel frames.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# slaney mel scale (librosa-compatible: htk=False, norm='slaney')
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = math.log(6.4) / 27.0


def hz_to_mel(freq):
    freq = np.asanyarray(freq, dtype=np.float64)
    mel = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(mel):
    mel = np.asanyarray(mel, dtype=np.float64)
    freq = mel * _F_SP
    log_region = mel >= _MIN_LOG_MEL
    freq = np.where(
        log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mel - _MIN_LOG_MEL)), freq
    )
    return freq


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2 + 1)."""
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]  # (n_mels+2, n_freq)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# windows & framing
# ---------------------------------------------------------------------------


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def frame_signal(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(..., N) -> (..., T, frame_length); T = 1 + (N - frame)/hop.

    Polyphase formulation: with ``frame = q*hop + r`` the frame matrix is
    ``frames[t, q*hop:(q+1)*hop] = W[t+q, :]`` over the hop-reshaped signal
    ``W``, i.e. a handful of contiguous shifted slices — XLA lowers these to
    cheap copies. The naive 2-D index gather this replaces is pathologically
    slow on TPU (measured 5x the whole-pipeline cost at SPIRAL shapes).
    """
    n = y.shape[-1]
    num_frames = 1 + (n - frame_length) // hop_length
    q_full, rem = divmod(frame_length, hop_length)
    rows = num_frames + q_full + (1 if rem else 0)
    need = rows * hop_length
    if need > n:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, need - n)])
    w = y[..., :need].reshape(*y.shape[:-1], rows, hop_length)
    parts = [
        jax.lax.slice_in_dim(w, q, q + num_frames, axis=-2)
        for q in range(q_full)
    ]
    if rem:
        parts.append(
            jax.lax.slice_in_dim(w, q_full, q_full + num_frames, axis=-2)[
                ..., :rem
            ]
        )
    return jnp.concatenate(parts, axis=-1)


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: jnp.ndarray,
    center: bool = False,
    mag_eps: float = 1e-9,
) -> jnp.ndarray:
    """Magnitude STFT, layout (..., T, n_fft//2+1).

    center=True reflect-pads by n_fft//2 (torch.stft convention); the reference
    HiFi-GAN path pre-pads (n_fft - hop)/2 itself and calls center=False.
    """
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(y, n_fft, hop_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + mag_eps)


# ---------------------------------------------------------------------------
# HiFi-GAN convention mel (Grad-TTS / DiffVC training + vocoder frontend)
# ---------------------------------------------------------------------------


def mel_spectrogram_np(
    y: np.ndarray,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """Host-side (numpy) log-mel, same convention as ``mel_spectrogram``.

    Used by input-pipeline workers so feature extraction runs on CPU threads
    and never blocks the TPU (the reference hides this in DataLoader workers,
    Grad-TTS/data.py:49-54). (N,) or (B, N) wav -> (..., T, num_mels).
    """
    y = np.asarray(y, dtype=np.float32)
    mel_w = mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    window = hann_window(win_size)
    pad = (n_fft - hop_size) // 2
    y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    n = y.shape[-1]
    num_frames = 1 + (n - n_fft) // hop_size
    idx = np.arange(num_frames)[:, None] * hop_size + np.arange(n_fft)[None, :]
    frames = y[..., idx] * window
    spec = np.fft.rfft(frames, axis=-1)
    mag = np.sqrt(spec.real**2 + spec.imag**2 + 1e-9).astype(np.float32)
    mel = mag @ mel_w.T
    return np.log(np.clip(mel, 1e-5, None))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft",
        "num_mels",
        "sampling_rate",
        "hop_size",
        "win_size",
        "fmin",
        "fmax",
    ),
)
def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jnp.ndarray:
    """Log-mel spectrogram, HiFi-GAN convention. (B, N) wav -> (B, T, num_mels).

    Mirrors Grad-TTS/hifi-gan/meldataset.py:51-74 (which the reference's
    TextMelDataset uses for training targets) with channels-last output.
    """
    mel_w = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    window = jnp.asarray(hann_window(win_size))
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    spec = stft_magnitude(y, n_fft, hop_size, win_size, window, center=False)
    mel = spec @ mel_w.T  # (..., T, num_mels)
    return jnp.log(jnp.clip(mel, 1e-5, None))
