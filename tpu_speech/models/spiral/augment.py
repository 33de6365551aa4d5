"""Spectrogram augmentations: SpecAugment, SpecCutout, crop-or-pad, and the
negative cosine similarity loss.

Covers SPIRAL/nemo/collections/asr/parts/spectr_augment.py:32-152,
modules/audio_preprocessing.py (SpectrogramAugmentation,
CropOrPadSpectrogramAugmentation) and losses/similarityloss.py:21-31.
Spec layout (B, T, F); randomness via explicit jax PRNG keys so the ops stay
jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def spec_augment(
    rng: jax.Array,
    specs: jnp.ndarray,
    freq_masks: int = 2,
    time_masks: int = 2,
    freq_width: int = 27,
    time_width: int = 100,
    mask_value: float = 0.0,
):
    """SpecAugment: random frequency and time band zeroing (fixed max widths,
    fully vectorized)."""
    b, t, f = specs.shape
    out = specs

    def band_mask(key, size, n_masks, width):
        k1, k2 = jax.random.split(key)
        starts = jax.random.randint(k1, (b, n_masks), 0, max(size - width, 1))
        widths = jax.random.randint(k2, (b, n_masks), 0, width + 1)
        pos = jnp.arange(size)[None, None, :]
        m = (pos >= starts[:, :, None]) & (pos < (starts + widths)[:, :, None])
        return jnp.any(m, axis=1)  # (B, size)

    rng_f, rng_t = jax.random.split(rng)
    if freq_masks > 0:
        fm = band_mask(rng_f, f, freq_masks, freq_width)
        out = jnp.where(fm[:, None, :], mask_value, out)
    if time_masks > 0:
        tm = band_mask(rng_t, t, time_masks, time_width)
        out = jnp.where(tm[:, :, None], mask_value, out)
    return out


def spec_cutout(
    rng: jax.Array,
    specs: jnp.ndarray,
    rect_masks: int = 5,
    rect_time: int = 25,
    rect_freq: int = 15,
    mask_value: float = 0.0,
):
    """SpecCutout: random time-frequency rectangles zeroed."""
    b, t, f = specs.shape
    keys = jax.random.split(rng, 4)
    ts = jax.random.randint(keys[0], (b, rect_masks), 0, max(t - rect_time, 1))
    fs = jax.random.randint(keys[1], (b, rect_masks), 0, max(f - rect_freq, 1))
    tw = jax.random.randint(keys[2], (b, rect_masks), 0, rect_time + 1)
    fw = jax.random.randint(keys[3], (b, rect_masks), 0, rect_freq + 1)
    tpos = jnp.arange(t)[None, None, :]
    fpos = jnp.arange(f)[None, None, :]
    tm = (tpos >= ts[:, :, None]) & (tpos < (ts + tw)[:, :, None])  # (B,R,T)
    fm = (fpos >= fs[:, :, None]) & (fpos < (fs + fw)[:, :, None])  # (B,R,F)
    rect = jnp.any(tm[:, :, :, None] & fm[:, :, None, :], axis=1)  # (B,T,F)
    return jnp.where(rect, mask_value, specs)


def crop_or_pad_spectrogram(specs: jnp.ndarray, lengths, audio_length: int,
                            rng=None):
    """Crop (random offset if rng given, else center) or zero-pad the time
    axis to exactly ``audio_length`` frames."""
    b, t, f = specs.shape
    if t > audio_length:
        if rng is not None:
            offsets = jax.random.randint(
                rng, (b,), 0, t - audio_length + 1
            )
        else:
            offsets = jnp.full((b,), (t - audio_length) // 2)
        out = jax.vmap(
            lambda s, o: jax.lax.dynamic_slice(s, (o, 0), (audio_length, f))
        )(specs, offsets)
        lengths = jnp.minimum(lengths, audio_length)
    else:
        out = jnp.pad(specs, ((0, 0), (0, audio_length - t), (0, 0)))
    return out, lengths


def negative_cosine_similarity_loss(preds, targets, valid_mask=None):
    """-cos(pred, target) averaged over (valid) frames
    (losses/similarityloss.py:21-31)."""
    num = jnp.sum(preds * targets, axis=-1)
    den = jnp.linalg.norm(preds, axis=-1) * jnp.linalg.norm(targets, axis=-1)
    cos = num / jnp.maximum(den, 1e-8)
    if valid_mask is not None:
        return -jnp.sum(cos * valid_mask) / jnp.maximum(jnp.sum(valid_mask), 1.0)
    return -jnp.mean(cos)


def mfcc_features(
    x: jnp.ndarray,
    seq_len: jnp.ndarray,
    n_mfcc: int = 64,
    **filterbank_kwargs,
):
    """MFCC preprocessor (AudioToMFCCPreprocessor analog): DCT-II over
    log-mel features."""
    from tpu_speech.models.spiral.features import filterbank_features

    feats, lens = filterbank_features(
        x, seq_len, normalize=None, **filterbank_kwargs
    )
    nfilt = feats.shape[-1]
    n = np.arange(nfilt)
    k = np.arange(n_mfcc)[:, None]
    dct = np.cos(np.pi * k * (2 * n + 1) / (2 * nfilt)) * np.sqrt(2.0 / nfilt)
    dct[0] *= 1.0 / np.sqrt(2.0)
    mfcc = feats @ jnp.asarray(dct.T.astype(np.float32))
    return mfcc, lens
