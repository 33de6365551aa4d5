"""Mel inversion utilities: pseudo-inverse + fast Griffin-Lim.

TPU-native equivalents of DiffVC/model/utils.py:42-110 (PseudoInversion,
InitialReconstruction, FastGL): the 32-iteration momentum Griffin-Lim loop
compiles as a single ``lax.fori_loop`` of rfft/irfft + overlap-add (all XLA
ops), instead of torch.stft/istft round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_speech.audio.mel import hann_window, mel_filterbank


@functools.lru_cache(maxsize=None)
def mel_pseudo_inverse(sample_rate: int, n_fft: int, n_mels: int,
                       fmin: float = 0.0, fmax: float = 8000.0) -> np.ndarray:
    """Moore-Penrose pseudo-inverse of the mel basis, (n_fft//2+1, n_mels)."""
    basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    return np.linalg.pinv(basis).astype(np.float32)


def stft_complex(y: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray):
    """Complex STFT with center=True reflect padding. (B, N) -> (B, T, F)."""
    pad = n_fft // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    n = y.shape[-1]
    num_frames = 1 + (n - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[..., idx] * window
    return jnp.fft.rfft(frames, axis=-1)


def istft(spec: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray,
          length: int | None = None):
    """Inverse STFT (center=True), overlap-add with window-square
    normalization (torch.functional.istft semantics). spec: (B, T, F).

    When n_fft is a hop multiple the overlap-add is expressed as R shifted
    block sums (pure reshapes — fast on TPU); otherwise a gather-free
    scatter-add fallback is used.
    """
    b, t, _ = spec.shape
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # (B, T, n_fft)
    total = n_fft + hop * (t - 1)

    w2 = jnp.square(window)
    if n_fft % hop == 0:
        r = n_fft // hop  # overlapping frames per sample
        # chunk frames into r hop-sized pieces; piece p of frame i lands at
        # output block (i + p)
        chunks = frames.reshape(b, t, r, hop)
        n_blocks = t + r - 1
        y = jnp.zeros((b, n_blocks, hop), dtype=frames.dtype)
        wsq_b = jnp.zeros((n_blocks, hop), dtype=frames.dtype)
        w2c = w2.reshape(r, hop)
        for p in range(r):
            y = y.at[:, p : p + t].add(chunks[:, :, p])
            wsq_b = wsq_b.at[p : p + t].add(
                jnp.broadcast_to(w2c[p], (t, hop))
            )
        y = y.reshape(b, n_blocks * hop)[:, :total]
        wsq = wsq_b.reshape(n_blocks * hop)[:total]
    else:
        idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
        flat_idx = idx.reshape(-1)
        y = jnp.zeros((b, total), dtype=frames.dtype)
        y = y.at[:, flat_idx].add(frames.reshape(b, -1))
        wsq = jnp.zeros((total,), dtype=frames.dtype)
        wsq = wsq.at[flat_idx].add(jnp.tile(w2, (t,)))
    y = y / jnp.maximum(wsq, 1e-11)
    pad = n_fft // 2
    y = y[:, pad : total - pad]
    if length is not None:
        y = y[:, :length]
    return y


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_mels", "sample_rate", "n_fft", "hop", "n_iters", "momentum",
    ),
)
def fast_griffin_lim(
    log_mel: jnp.ndarray,
    n_mels: int = 80,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop: int = 256,
    n_iters: int = 32,
    momentum: float = 0.99,
):
    """Log-mel (B, T, n_mels) -> waveform (B, N) via momentum Griffin-Lim.

    Mirrors FastGL (DiffVC/model/utils.py:78-110): pseudo-invert mels to a
    magnitude STFT, init with zero phase, iterate stft/istft with momentum on
    the phase angles. Jitted as one XLA program: complex64 intermediates are
    unsupported as *eager* TPU allocations (axon raises Unimplemented on a
    device `full`), and the fused loop avoids 2·n_iters host round-trips.
    """
    inv = jnp.asarray(mel_pseudo_inverse(sample_rate, n_fft, n_mels))
    window = jnp.asarray(hann_window(n_fft))

    stftm = jnp.exp(log_mel) @ inv.T  # (B, T, F) magnitude
    c = stftm.astype(jnp.complex64)
    x = istft(c, n_fft, hop, window)  # zero-phase init

    def body(_, carry):
        x, prev_angles = carry
        s = stft_complex(x, n_fft, hop, window)
        mag = jnp.sqrt(jnp.clip(jnp.real(s) ** 2 + jnp.imag(s) ** 2, 1e-8))
        angles = s / mag
        s_new = c * (angles + momentum * (angles - prev_angles))
        x = istft(s_new, n_fft, hop, window)
        return (x, angles)

    t = stftm.shape[1]
    zeros = jnp.zeros((stftm.shape[0], t, stftm.shape[2]), dtype=jnp.complex64)
    x, _ = jax.lax.fori_loop(0, n_iters, body, (x, zeros))
    return x
