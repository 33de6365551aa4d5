"""GE2E speaker encoder (Real-Time-Voice-Cloning style), TPU-native.

Re-design of DiffVC/speaker_encoder/encoder/{model,audio,inference}.py:
3-layer LSTM over 40-mel power spectrograms -> linear -> relu -> L2-norm
256-d embedding; partial-slice averaging at inference; GE2E softmax loss.
The LSTM uses torch gate order (i, f, g, o) so reference checkpoints convert
weight-for-weight; the whole partial-batch embedding is one jit.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_speech.audio.mel import hann_window, mel_filterbank

# data hyperparameters (encoder/params_data.py)
SAMPLING_RATE = 16000
MEL_WINDOW_LENGTH_MS = 25
MEL_WINDOW_STEP_MS = 10
MEL_N_CHANNELS = 40
PARTIALS_N_FRAMES = 160
AUDIO_NORM_TARGET_DBFS = -30

# model hyperparameters (encoder/params_model.py)
MODEL_HIDDEN_SIZE = 256
MODEL_EMBEDDING_SIZE = 256
MODEL_NUM_LAYERS = 3


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM with torch parameter layout/gate order."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C). Returns final hidden state of the last layer (B, H).
        b = x.shape[0]
        h_out = None
        for layer in range(self.num_layers):
            in_dim = x.shape[-1]
            w_ih = self.param(
                f"w_ih_l{layer}",
                nn.initializers.uniform(scale=1.0 / np.sqrt(self.hidden_size)),
                (4 * self.hidden_size, in_dim),
            )
            w_hh = self.param(
                f"w_hh_l{layer}",
                nn.initializers.uniform(scale=1.0 / np.sqrt(self.hidden_size)),
                (4 * self.hidden_size, self.hidden_size),
            )
            b_ih = self.param(
                f"b_ih_l{layer}", nn.initializers.zeros, (4 * self.hidden_size,)
            )
            b_hh = self.param(
                f"b_hh_l{layer}", nn.initializers.zeros, (4 * self.hidden_size,)
            )

            xw = x @ w_ih.T + b_ih + b_hh  # (B, T, 4H) — precompute input part

            def step(carry, xw_t):
                h, c = carry
                gates = xw_t + h @ w_hh.T
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
                g = jnp.tanh(g)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                return (h, c), h

            init = (
                jnp.zeros((b, self.hidden_size), dtype=x.dtype),
                jnp.zeros((b, self.hidden_size), dtype=x.dtype),
            )
            (h_final, _), hs = jax.lax.scan(
                step, init, jnp.moveaxis(xw, 0, 1)
            )  # hs: (T, B, H)
            x = jnp.moveaxis(hs, 0, 1)
            h_out = h_final
        return x, h_out


class SpeakerEncoder(nn.Module):
    """Utterance mel frames -> L2-normalized embedding (model.py:14-62)."""

    hidden_size: int = MODEL_HIDDEN_SIZE
    embedding_size: int = MODEL_EMBEDDING_SIZE
    num_layers: int = MODEL_NUM_LAYERS

    @nn.compact
    def __call__(self, utterances):
        # utterances: (B, T, MEL_N_CHANNELS) power-mel frames
        _, h_last = LSTM(self.hidden_size, self.num_layers, name="lstm")(utterances)
        embeds_raw = nn.relu(nn.Dense(self.embedding_size, name="linear")(h_last))
        norm = jnp.linalg.norm(embeds_raw, axis=1, keepdims=True)
        return embeds_raw / jnp.maximum(norm, 1e-12)


def similarity_matrix(embeds, weight, bias):
    """GE2E similarity (model.py:64-110). embeds: (S, U, E) -> (S, U, S)."""
    s, u, _ = embeds.shape
    centroids_incl = jnp.mean(embeds, axis=1, keepdims=True)  # (S,1,E)
    centroids_incl = centroids_incl / jnp.linalg.norm(
        centroids_incl, axis=2, keepdims=True
    )
    centroids_excl = (jnp.sum(embeds, axis=1, keepdims=True) - embeds) / (u - 1)
    centroids_excl = centroids_excl / jnp.linalg.norm(
        centroids_excl, axis=2, keepdims=True
    )
    sim_incl = jnp.einsum("sue,te->sut", embeds, centroids_incl[:, 0, :])
    sim_excl = jnp.sum(embeds * centroids_excl, axis=2)  # (S, U)
    eye = jnp.eye(s)[:, None, :]  # (S,1,S)
    sim = sim_incl * (1 - eye) + sim_excl[:, :, None] * eye
    return sim * weight + bias


def ge2e_loss(embeds, weight, bias):
    """GE2E softmax loss + EER (model.py:112-140)."""
    s, u, _ = embeds.shape
    sim = similarity_matrix(embeds, weight, bias).reshape(s * u, s)
    target = jnp.repeat(jnp.arange(s), u)
    logp = jax.nn.log_softmax(sim, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=1))
    return loss, sim


def equal_error_rate(sim: np.ndarray, n_speakers: int) -> float:
    """EER from the flattened similarity matrix (host-side, numpy)."""
    sim = np.asarray(sim).reshape(-1, n_speakers)
    n = sim.shape[0]
    u = n // n_speakers
    labels = np.zeros_like(sim, dtype=bool)
    for i in range(n):
        labels[i, i // u] = True
    scores = sim.flatten()
    truth = labels.flatten()
    order = np.argsort(-scores)
    truth = truth[order]
    tpr = np.cumsum(truth) / max(truth.sum(), 1)
    fpr = np.cumsum(~truth) / max((~truth).sum(), 1)
    # EER: point where FPR crosses 1 - TPR
    diffs = fpr - (1 - tpr)
    idx = int(np.argmin(np.abs(diffs)))
    return float((fpr[idx] + (1 - tpr[idx])) / 2)


# ---------------------------------------------------------------------------
# audio frontend (encoder/audio.py)
# ---------------------------------------------------------------------------


def wav_to_mel_spectrogram(wav: np.ndarray) -> np.ndarray:
    """Power (not log) mel frames at 16 kHz, (T, 40). librosa-compatible
    melspectrogram: center=True, hann, power=2."""
    n_fft = int(SAMPLING_RATE * MEL_WINDOW_LENGTH_MS / 1000)
    hop = int(SAMPLING_RATE * MEL_WINDOW_STEP_MS / 1000)
    window = hann_window(n_fft)
    basis = mel_filterbank(SAMPLING_RATE, n_fft, MEL_N_CHANNELS, 0.0, SAMPLING_RATE / 2)
    pad = n_fft // 2
    y = np.pad(np.asarray(wav, dtype=np.float32), (pad, pad), mode="reflect")
    num_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * window
    spec = np.fft.rfft(frames, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(np.float32)
    return power @ basis.T  # (T, 40)


def normalize_volume(wav, target_dbfs=AUDIO_NORM_TARGET_DBFS, increase_only=True,
                     decrease_only=False):
    dbfs_change = target_dbfs - 10 * np.log10(np.mean(wav**2) + 1e-12)
    if (dbfs_change < 0 and increase_only) or (dbfs_change > 0 and decrease_only):
        return wav
    return wav * (10 ** (dbfs_change / 20))


def trim_long_silences(wav: np.ndarray, frame_ms: int = 30,
                       max_silence_frames: int = 6) -> np.ndarray:
    """Energy-based VAD approximation of the reference's webrtcvad pipeline
    (encoder/audio.py:120-160; webrtcvad is not available here)."""
    frame = int(SAMPLING_RATE * frame_ms / 1000)
    n = len(wav) // frame * frame
    if n == 0:
        return wav
    frames = wav[:n].reshape(-1, frame)
    rms = np.sqrt(np.mean(frames**2, axis=1))
    thresh = max(np.median(rms) * 0.1, 1e-4)
    voiced = rms > thresh
    # dilate: keep silence gaps up to max_silence_frames
    keep = voiced.copy()
    run = 0
    for i in range(len(voiced)):
        if voiced[i]:
            run = 0
        else:
            run += 1
            if run <= max_silence_frames:
                keep[i] = True
    mask = np.repeat(keep, frame)
    return wav[: len(mask)][mask]


def preprocess_wav(wav: np.ndarray, source_sr: Optional[int] = None) -> np.ndarray:
    """Resample -> volume-normalize -> trim silences (encoder/audio.py:20-47)."""
    if source_sr is not None and source_sr != SAMPLING_RATE:
        import scipy.signal

        n_out = int(round(len(wav) * SAMPLING_RATE / source_sr))
        wav = scipy.signal.resample_poly(
            wav, SAMPLING_RATE // np.gcd(SAMPLING_RATE, source_sr),
            source_sr // np.gcd(SAMPLING_RATE, source_sr),
        ).astype(np.float32)[:n_out + 1]
    wav = normalize_volume(wav, increase_only=True)
    return trim_long_silences(wav)


def compute_partial_slices(
    n_samples: int,
    partial_utterance_n_frames: int = PARTIALS_N_FRAMES,
    min_pad_coverage: float = 0.75,
    overlap: float = 0.5,
) -> Tuple[List[slice], List[slice]]:
    """Split points for overlapping partial utterances (inference.py:58-105)."""
    samples_per_frame = int(SAMPLING_RATE * MEL_WINDOW_STEP_MS / 1000)
    n_frames = int(np.ceil((n_samples + 1) / samples_per_frame))
    frame_step = max(int(np.round(partial_utterance_n_frames * (1 - overlap))), 1)

    wav_slices, mel_slices = [], []
    steps = max(1, n_frames - partial_utterance_n_frames + frame_step + 1)
    for i in range(0, steps, frame_step):
        mel_range = np.array([i, i + partial_utterance_n_frames])
        wav_range = mel_range * samples_per_frame
        mel_slices.append(slice(*mel_range))
        wav_slices.append(slice(*wav_range))

    last = wav_slices[-1]
    coverage = (n_samples - last.start) / (last.stop - last.start)
    if coverage < min_pad_coverage and len(mel_slices) > 1:
        mel_slices = mel_slices[:-1]
        wav_slices = wav_slices[:-1]
    return wav_slices, mel_slices


def embed_utterance(model: SpeakerEncoder, params, wav: np.ndarray,
                    using_partials: bool = True) -> np.ndarray:
    """Single-utterance embedding with partial-slice averaging
    (inference.py:108-144)."""
    if not using_partials:
        frames = wav_to_mel_spectrogram(wav)
        emb = model.apply(params, jnp.asarray(frames[None]))
        return np.asarray(emb[0])

    wave_slices, mel_slices = compute_partial_slices(len(wav))
    max_wave_length = wave_slices[-1].stop
    if max_wave_length >= len(wav):
        wav = np.pad(wav, (0, max_wave_length - len(wav)), "constant")
    frames = wav_to_mel_spectrogram(wav)
    frames_batch = np.stack([frames[s] for s in mel_slices])
    partial_embeds = np.asarray(model.apply(params, jnp.asarray(frames_batch)))
    raw = partial_embeds.mean(axis=0)
    return raw / np.linalg.norm(raw)
