"""Mask and alignment-path utilities.

Functional equivalents of the reference helpers in ``Grad-TTS/model/utils.py``
(sequence_mask :6-10, fix_len_compatibility :13-17, generate_path :26-39,
duration_loss :42-44), reformulated for channels-last layouts and static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_speech.utils.typing_contracts import typecheck


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Boolean mask (B, T): True where position < length.

    ``max_length`` must be static (python int) under jit.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 2) -> int:
    """Round ``length`` up to a multiple of 2**num_downsamplings (U-Net friendly)."""
    factor = 2 ** num_downsamplings_in_unet
    return ((length + factor - 1) // factor) * factor


@typecheck(duration="B Tx", mask="B Tx Ty")
def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Expand durations into a binary monotone alignment path.

    Args:
      duration: (B, Tx) non-negative token durations.
      mask: (B, Tx, Ty) attention mask.
    Returns:
      (B, Tx, Ty) binary path: row x covers mel frames [cum[x-1], cum[x]).

    Same cumsum trick as the reference (Grad-TTS/model/utils.py:26-39): the row-x
    path is sequence_mask(cum[x]) - sequence_mask(cum[x-1]).
    """
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(duration, axis=1)  # (B, Tx)
    pos = jnp.arange(t_y, dtype=cum.dtype)
    path = (pos[None, None, :] < cum[:, :, None]).astype(mask.dtype)
    path_prev = jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return (path - path_prev) * mask


def duration_loss(logw: jnp.ndarray, logw_gt: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """MSE between predicted and target log-durations, normalized by token count."""
    return jnp.sum((logw - logw_gt) ** 2) / jnp.sum(lengths)
