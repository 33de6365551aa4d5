"""Fused STFT -> log-mel Pallas TPU kernel.

The reference computes wav -> log-mel with torch.stft + librosa mel
(Grad-TTS/hifi-gan/meldataset.py:51-74) or the NeMo FilterbankFeatures
pipeline (SPIRAL/nemo/collections/asr/parts/features.py:228-455). A naive
XLA translation (frame-gather -> window -> rfft -> |.| -> mel matmul)
round-trips every intermediate through HBM and pays a slow general gather
for the overlapped framing: measured 10.7 ms per branch at the SPIRAL
pretrain operating point (B=24, 250k samples, n_fft=512, hop=160) on one
v5e chip.

Design (all sizes static):

1. **DMA, aligned.** The wav is viewed as rows of ``L = lcm(hop, 128)``
   samples, so every DMA is a contiguous, fully tile-aligned 2D block —
   the TPU DMA engine moves it at line rate and Mosaic never sees an
   unaligned HBM slice. One row holds ``P = L // hop`` frame starts.
2. **Framing is vector slicing, not gathering.** In VMEM, ``K`` shifted
   row-concats make each row hold a full ``n_fft`` span; the ``P`` phase
   slices then ARE the frames (phase-blocked order). No gather, no
   per-frame loop — a handful of wide vector copies.
3. **The DFT is a matmul.** ``re|im = frames @ [cos*win | -sin*win]`` is
   one MXU contraction; power, mel projection and log fuse behind it in
   VMEM. The only HBM traffic is the wav in and the log-mel out.

Grid: ``(B, num_frame_blocks)``. Numerics: the DFT/mel contractions run
with bfloat16 operands and float32 accumulation by default — the same
effective precision XLA uses for ``jnp.matmul`` on TPU; ``fp32_matmul=True``
keeps float32 operands (multi-pass MXU) for accuracy-critical use.

``logmel_reference`` is the plain-jnp oracle for parity tests and the
fallback on non-TPU backends.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_logmel", "logmel_reference", "make_dft_mats"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_dft_mats(n_fft: int, window: np.ndarray, mel_fb: np.ndarray):
    """(dft [n_fft, 2*Fp], mel [Fp, Mp]) with the window folded into the DFT.

    window: (n_fft,) float32 (zero-padded to n_fft by the caller).
    mel_fb: (n_mels, n_freq) mel filterbank.
    """
    n_freq = n_fft // 2 + 1
    n_mels = mel_fb.shape[0]
    fp = _round_up(n_freq, 128)
    mp = _round_up(n_mels, 128)
    k = np.arange(n_fft)
    f = np.arange(n_freq)
    ang = 2.0 * np.pi * np.outer(k, f) / n_fft
    cos_w = np.cos(ang) * window[:, None]
    sin_w = -np.sin(ang) * window[:, None]
    dft = np.zeros((n_fft, 2 * fp), dtype=np.float32)
    dft[:, :n_freq] = cos_w
    dft[:, fp:fp + n_freq] = sin_w
    mel = np.zeros((fp, mp), dtype=np.float32)
    mel[:n_freq, :n_mels] = mel_fb.T
    return dft, mel


def _kernel(x_ref, dft_ref, mel_ref, out_ref, v_scratch, sem, *,
            hop: int, n_fft: int, row_w: int, phases: int, k_rows: int,
            rows_blk: int, dma_rows: int, fp: int, n_mels_blk: int,
            mag_mode: str, log_mode: str, log_guard: float, mag_eps: float,
            compute_dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(t * rows_blk, dma_rows), :], v_scratch, sem
    )
    dma.start()
    dma.wait()

    v = v_scratch[:]
    # K shifted row-concats: row u then spans samples
    # [u*row_w, u*row_w + k_rows*row_w) — enough for every phase's frame.
    # pltpu.roll relayouts the shifted views so concat sees offset-0 operands.
    shifted = [v[0:rows_blk]]
    for u in range(1, k_rows):
        shifted.append(pltpu.roll(v, dma_rows - u, 0)[0:rows_blk])
    wide = jnp.concatenate(shifted, axis=1)  # (rows_blk, k_rows*row_w)
    # phase slices ARE the frames (phase-blocked row order)
    if phases > 1:
        parts = [wide[:, 0:n_fft]]
        for p in range(1, phases):
            parts.append(
                pltpu.roll(wide, k_rows * row_w - p * hop, 1)[:, 0:n_fft]
            )
        frames = jnp.concatenate(parts, axis=0)
    else:
        frames = wide[:, 0:n_fft]
    # (phases*rows_blk = block_frames, n_fft)

    # float32 operands still get bf16 MXU multiplies unless HIGHEST is
    # requested explicitly — without it the fp32 path is bf16 in disguise.
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)
    fr = frames.astype(compute_dtype)
    spec = jnp.dot(fr, dft_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    re = spec[:, :fp]
    im = spec[:, fp:]
    mag2 = re * re + im * im
    if mag_mode == "mag_eps":
        mel_in = jnp.sqrt(mag2 + mag_eps)
    else:  # power
        mel_in = mag2
    mel = jnp.dot(mel_in.astype(compute_dtype), mel_ref[:],
                  preferred_element_type=jnp.float32, precision=prec)
    if log_mode == "clip":
        out = jnp.log(jnp.maximum(mel, log_guard))
    else:  # guard
        out = jnp.log(mel + log_guard)
    # rows stay phase-blocked ([p*rows_blk + u] <-> frame u*phases + p);
    # the caller de-interleaves with one cheap XLA transpose.
    out_ref[0] = out


def fused_logmel(
    x: jnp.ndarray,
    window: np.ndarray,
    mel_fb: np.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    num_frames: int,
    mag_mode: str = "power",
    log_mode: str = "guard",
    log_guard: float = 2.0 ** -24,
    mag_eps: float = 1e-9,
    fp32_matmul: bool = False,
    block_frames: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused wav -> log-mel. ``x``: (B, N) float32, already padded per the
    caller's STFT convention (reflect center pad etc.); frame ``t`` reads
    ``x[:, t*hop : t*hop + n_fft]``.

    mag_mode: 'power' -> re^2+im^2 (NeMo mag_power=2.0);
              'mag_eps' -> sqrt(re^2+im^2+mag_eps) (HiFi-GAN convention).
    log_mode: 'guard' -> log(mel + log_guard); 'clip' -> log(max(mel, guard)).
    Returns (B, num_frames, n_mels) float32.
    """
    assert x.ndim == 2, x.shape
    b = x.shape[0]
    n_mels = mel_fb.shape[0]
    n_freq = n_fft // 2 + 1
    fp = _round_up(n_freq, 128)
    mp = _round_up(n_mels, 128)

    row_w = hop_length * 128 // math.gcd(hop_length, 128)  # lcm
    phases = row_w // hop_length
    k_rows = -(-((phases - 1) * hop_length + n_fft) // row_w)  # cdiv

    if block_frames % (phases * 8):
        block_frames = _round_up(block_frames, phases * 8)
    rows_blk = block_frames // phases
    dma_rows = _round_up(rows_blk + k_rows - 1, 8)

    nf_pad = _round_up(num_frames, block_frames)
    n_blocks = nf_pad // block_frames
    rows_total = (n_blocks - 1) * rows_blk + dma_rows
    need = rows_total * row_w
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    else:
        x = x[:, :need]
    x2 = x.reshape(b, rows_total, row_w)

    dft_np, mel_np = make_dft_mats(
        n_fft, np.asarray(window, dtype=np.float32), np.asarray(mel_fb)
    )
    compute_dtype = jnp.float32 if fp32_matmul else jnp.bfloat16
    dft = jnp.asarray(dft_np, dtype=compute_dtype)
    mel = jnp.asarray(mel_np, dtype=compute_dtype)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _kernel, hop=hop_length, n_fft=n_fft, row_w=row_w, phases=phases,
        k_rows=k_rows, rows_blk=rows_blk, dma_rows=dma_rows, fp=fp,
        n_mels_blk=mp, mag_mode=mag_mode, log_mode=log_mode,
        log_guard=log_guard, mag_eps=mag_eps, compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_fft, 2 * fp), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, mp), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_frames, mp),
                               lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nf_pad, mp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dma_rows, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2, dft, mel)
    if phases > 1:
        rows_blk = block_frames // phases
        out = (
            out.reshape(b, n_blocks, phases, rows_blk, mp)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, nf_pad, mp)
        )
    return out[:, :num_frames, :n_mels]


def logmel_reference(
    x: jnp.ndarray,
    window: np.ndarray,
    mel_fb: np.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    num_frames: int,
    mag_mode: str = "power",
    log_mode: str = "guard",
    log_guard: float = 2.0 ** -24,
    mag_eps: float = 1e-9,
) -> jnp.ndarray:
    """Plain-jnp oracle with identical semantics (full fp32, rfft path)."""
    idx = (np.arange(num_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    need = int(idx.max()) + 1
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    frames = x[:, idx] * jnp.asarray(window, dtype=jnp.float32)
    spec = jnp.fft.rfft(frames, axis=-1)
    mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if mag_mode == "mag_eps":
        mel_in = jnp.sqrt(mag2 + mag_eps)
    else:
        mel_in = mag2
    mel = mel_in @ jnp.asarray(mel_fb).T
    if log_mode == "clip":
        return jnp.log(jnp.maximum(mel, log_guard))
    return jnp.log(mel + log_guard)
