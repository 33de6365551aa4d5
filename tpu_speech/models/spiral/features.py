"""SPIRAL mel featurizer (NeMo FilterbankFeatures convention), jnp-native.

Mirrors SPIRAL/nemo/collections/asr/parts/features.py:228-455: optional
time-domain peak normalization, train-only dither, preemphasis 0.97,
center=True STFT with a *symmetric* hann window, power-2 magnitude, slaney mel
matmul, log(x + 2^-24), per-feature normalization over valid frames
(Bessel-corrected std), pad-to-multiple-of-16. Layout: (B, T, F).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_speech.audio.mel import mel_filterbank

CONSTANT = 1e-5


def hann_window_symmetric(win_length: int) -> np.ndarray:
    """torch.hann_window(periodic=False)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / (win_length - 1)))).astype(
        np.float32
    )


def normalize_time_domain(x: jnp.ndarray) -> jnp.ndarray:
    peak = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    return x / (peak + 1e-5)


def filterbank_features(
    x: jnp.ndarray,
    seq_len: jnp.ndarray,
    sample_rate: int = 16000,
    window_size: float = 0.02,
    window_stride: float = 0.01,
    n_fft: Optional[int] = None,
    nfilt: int = 128,
    preemph: float = 0.97,
    lowfreq: float = 0.0,
    highfreq: Optional[float] = None,
    log_zero_guard_value: float = 2.0**-24,
    dither: float = CONSTANT,
    pad_to: int = 16,
    pad_value: float = 0.0,
    mag_power: float = 2.0,
    normalize: str = "per_feature",
    do_normalize_time_domain: bool = True,
    training: bool = False,
    rng: Optional[jax.Array] = None,
):
    """wav (B, N), lengths (B,) -> (feats (B, T, nfilt), feat_lens (B,))."""
    win_length = int(window_size * sample_rate)
    hop_length = int(window_stride * sample_rate)
    if n_fft is None:
        n_fft = 2 ** math.ceil(math.log2(win_length))
    highfreq = highfreq or sample_rate / 2

    if do_normalize_time_domain:
        x = normalize_time_domain(x)

    feat_lens = jnp.ceil(seq_len.astype(jnp.float32) / hop_length).astype(jnp.int32)

    if training and dither > 0:
        assert rng is not None
        x = x + dither * jax.random.normal(rng, x.shape, dtype=x.dtype)

    if preemph is not None:
        x = jnp.concatenate([x[:, :1], x[:, 1:] - preemph * x[:, :-1]], axis=1)

    # center=True STFT, symmetric hann of win_length zero-padded to n_fft
    window = hann_window_symmetric(win_length)
    lpad = (n_fft - win_length) // 2
    window = np.pad(window, (lpad, n_fft - win_length - lpad))
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n = xp.shape[-1]
    num_frames = 1 + (n - n_fft) // hop_length
    idx = np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = xp[:, idx] * jnp.asarray(window)
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)
    if mag_power != 1.0:
        mag = mag**mag_power

    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, nfilt, lowfreq, highfreq))
    feats = mag @ fb.T  # (B, T, nfilt)
    feats = jnp.log(feats + log_zero_guard_value)

    t = feats.shape[1]
    valid = (jnp.arange(t)[None, :] < feat_lens[:, None]).astype(feats.dtype)

    if normalize == "per_feature":
        cnt = jnp.sum(valid, axis=1)[:, None]  # (B, 1)
        mean = jnp.sum(feats * valid[:, :, None], axis=1) / cnt
        var = jnp.sum(
            jnp.square(feats - mean[:, None, :]) * valid[:, :, None], axis=1
        ) / jnp.maximum(cnt - 1.0, 1.0)  # Bessel (torch.std default)
        std = jnp.sqrt(var) + CONSTANT
        feats = (feats - mean[:, None, :]) / std[:, None, :]
    elif normalize == "all_features":
        cnt = jnp.sum(valid, axis=1)[:, None, None] * feats.shape[-1]
        mean = jnp.sum(feats * valid[:, :, None], axis=(1, 2))[:, None, None] / cnt
        var = jnp.sum(
            jnp.square(feats - mean) * valid[:, :, None], axis=(1, 2)
        )[:, None, None] / jnp.maximum(cnt - 1.0, 1.0)
        feats = (feats - mean) / (jnp.sqrt(var) + CONSTANT)

    feats = feats * valid[:, :, None] + pad_value * (1 - valid[:, :, None])
    if pad_to > 0 and t % pad_to != 0:
        feats = jnp.pad(
            feats,
            ((0, 0), (0, pad_to - t % pad_to), (0, 0)),
            constant_values=pad_value,
        )
    return feats, feat_lens
