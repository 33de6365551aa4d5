"""HiFi-GAN PyTorch checkpoint -> flax params converter (generator).

Folds weight norm (weight = g * v / ||v||) at conversion so inference runs on
plain convs — equivalent to the reference's remove_weight_norm() step
(Grad-TTS/hifi-gan/models.py:120-127). Accepts both trained checkpoints
(weight_g/weight_v) and already-folded state dicts (weight).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _fold_weight(sd: Dict, prefix: str) -> np.ndarray:
    """Return the folded conv weight in torch layout."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    g = _np(sd[f"{prefix}.weight_g"])  # (out, 1, 1)
    v = _np(sd[f"{prefix}.weight_v"])  # (out, in, k)
    norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def _conv1d(sd: Dict, prefix: str) -> Dict:
    w = _fold_weight(sd, prefix)  # (out, in/groups, k)
    return {"kernel": w.transpose(2, 1, 0), "bias": _np(sd[f"{prefix}.bias"])}


def _convt1d(sd: Dict, prefix: str) -> Dict:
    w = _fold_weight(sd, prefix)  # (in, out, k)
    return {"kernel": w.transpose(2, 0, 1), "bias": _np(sd[f"{prefix}.bias"])}


def convert_generator(
    state_dict: Dict,
    upsample_rates: Sequence[int] = (8, 8, 2, 2),
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11),
    resblock: str = "1",
) -> Dict:
    """Reference Generator state_dict -> {'params': ...} for our Generator."""
    sd = dict(state_dict)
    p = {"conv_pre": _conv1d(sd, "conv_pre"), "conv_post": _conv1d(sd, "conv_post")}
    num_kernels = len(resblock_kernel_sizes)
    for i in range(len(upsample_rates)):
        p[f"ups_{i}"] = _convt1d(sd, f"ups.{i}")
        for j in range(num_kernels):
            flat = i * num_kernels + j
            blk = {}
            if resblock == "1":
                for c in range(3):
                    blk[f"convs1_{c}"] = _conv1d(sd, f"resblocks.{flat}.convs1.{c}")
                    blk[f"convs2_{c}"] = _conv1d(sd, f"resblocks.{flat}.convs2.{c}")
            else:
                for c in range(2):
                    blk[f"convs_{c}"] = _conv1d(sd, f"resblocks.{flat}.convs.{c}")
            p[f"resblocks_{i}_{j}"] = blk
    return {"params": p}
