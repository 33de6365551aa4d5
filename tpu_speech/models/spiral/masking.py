"""Span/channel masking for SPIRAL student inputs.

``compute_mask_indices`` runs host-side in numpy (as in the reference,
SPIRAL/nemo/collections/asr/modules/wav2vec_modules.py:207-326) — the training
step takes the resulting boolean masks as inputs, so the jitted graph stays
static-shaped. ``apply_mask`` runs on device.

The fixed 'gaussian' mask embedding is the reference's GAUSSIAN_MASK constant
(parts/spectr_augment.py:29), stored as a data file.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

_GAUSSIAN_MASK_PATH = os.path.join(
    os.path.dirname(__file__), "_gaussian_mask.npy"
)


def gaussian_mask_emb(num_features: int) -> np.ndarray:
    return np.load(_GAUSSIAN_MASK_PATH)[:num_features]


def compute_mask_indices(
    shape: Tuple[int, int],
    padding_lens: Optional[np.ndarray],
    mask_prob: float,
    mask_length: int,
    mask_type: str = "static",
    mask_other: float = 0.0,
    min_masks: int = 0,
    no_overlap: bool = False,
    min_space: int = 0,
    shrink_to_batch_min: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random span masks, (B, T) bool + per-sample mask counts.

    ``padding_lens`` gives valid lengths (the reference takes a padding mask;
    passing lengths is equivalent and cheaper).
    """
    if rng is None:
        rng = np.random.default_rng()
    bsz, all_sz = shape
    mask = np.full((bsz, all_sz), False)

    all_num_mask = int(mask_prob * all_sz / float(mask_length) + rng.random())
    all_num_mask = max(min_masks, all_num_mask)

    mask_idcs = []
    for i in range(bsz):
        if padding_lens is not None:
            sz = int(padding_lens[i])
            num_mask = int(mask_prob * sz / float(mask_length) + rng.random())
            num_mask = max(min_masks, num_mask)
        else:
            sz = all_sz
            num_mask = all_num_mask

        if mask_type == "static":
            lengths = np.full(num_mask, mask_length)
        elif mask_type == "uniform":
            lengths = rng.integers(mask_other, mask_length * 2 + 1, size=num_mask)
        elif mask_type == "normal":
            lengths = [
                max(1, int(round(x)))
                for x in rng.normal(mask_length, mask_other, size=num_mask)
            ]
        elif mask_type == "poisson":
            lengths = [int(round(x)) for x in rng.poisson(mask_length, size=num_mask)]
        else:
            raise ValueError(f"unknown mask type {mask_type}")

        if len(lengths) == 0:
            mask_idcs.append(np.asarray([], dtype=np.int64))
            continue
        if sum(lengths) == 0:
            lengths[0] = min(mask_length, sz - 1)

        if no_overlap:
            mask_idc = []

            def arrange(s, e, length, keep_length):
                span_start = rng.integers(s, e - length)
                mask_idc.extend(span_start + k for k in range(length))
                new_parts = []
                if span_start - s - min_space >= keep_length:
                    new_parts.append((s, span_start - min_space + 1))
                if e - span_start - keep_length - min_space > keep_length:
                    new_parts.append((span_start + length + min_space, e))
                return new_parts

            parts = [(0, sz)]
            min_length = min(lengths)
            for length in sorted(lengths, reverse=True):
                lens_arr = np.fromiter(
                    (e - s if e - s >= length + min_space else 0 for s, e in parts),
                    np.int64,
                )
                l_sum = np.sum(lens_arr)
                if l_sum == 0:
                    break
                probs = lens_arr / l_sum
                c = rng.choice(len(parts), p=probs)
                s, e = parts.pop(c)
                parts.extend(arrange(s, e, length, min_length))
            mask_idc = np.asarray(mask_idc)
        else:
            min_len = min(lengths)
            if sz - min_len <= num_mask:
                min_len = sz - num_mask - 1
            mask_idc = rng.choice(sz - min_len, num_mask, replace=False)
            mask_idc = np.asarray(
                [
                    mask_idc[j] + offset
                    for j in range(len(mask_idc))
                    for offset in range(lengths[j])
                ]
            )
        mask_idcs.append(np.unique(mask_idc[mask_idc < sz]))

    mask_num = np.asarray([len(m) for m in mask_idcs])
    min_len = mask_num.min() if len(mask_idcs) else 0
    for i, mask_idc in enumerate(mask_idcs):
        if shrink_to_batch_min and len(mask_idc) > min_len:
            mask_idc = rng.choice(mask_idc, min_len, replace=False)
        mask[i, mask_idc] = True
    return mask, mask_num


def make_student_masks(
    batch_size: int,
    spec_len: int,
    num_features: int,
    spec_lens: np.ndarray,
    mask_prob: float = 0.5,
    mask_length: int = 20,
    mask_channel_prob: float = 0.4,
    mask_channel_length: int = 20,
    rng: Optional[np.random.Generator] = None,
):
    """Host-side helper producing both span and channel masks for one batch
    (mirrors apply_mask, st2vec_model.py:524-565, with base-config settings)."""
    if rng is None:
        rng = np.random.default_rng()
    time_mask, _ = compute_mask_indices(
        (batch_size, spec_len), spec_lens, mask_prob, mask_length,
        min_masks=2, shrink_to_batch_min=False, rng=rng,
    )
    chan_mask, _ = compute_mask_indices(
        (batch_size, num_features), None, mask_channel_prob,
        mask_channel_length, shrink_to_batch_min=False, rng=rng,
    )
    return time_mask, chan_mask


def apply_mask(
    specs: jnp.ndarray,
    time_mask: jnp.ndarray,
    chan_mask: Optional[jnp.ndarray],
    mask_emb: jnp.ndarray,
) -> jnp.ndarray:
    """Device-side: fill masked (B,T) spans with the mask embedding and zero
    masked (B,C) channels. specs: (B, T, C)."""
    specs = jnp.where(time_mask[:, :, None], mask_emb[None, None, :], specs)
    if chan_mask is not None:
        specs = jnp.where(chan_mask[:, None, :], 0.0, specs)
    return specs
