"""Jasper/QuartzNet-style conv ASR encoder blocks.

Capability-parity module for the reference's JasperBlock/ConvASREncoder
(SPIRAL/nemo/collections/asr/parts/jasper.py:259-, modules/conv_asr.py:58-211
— shipped but unused by the SPIRAL configs): R-times-repeated
(separable) 1d conv -> BN -> ReLU -> dropout sub-blocks with a 1x1-projected
residual connection, channels-last and mask-aware.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from tpu_speech.models.spiral.conv_layers import create_pad_mask


@dataclasses.dataclass(frozen=True)
class JasperBlockCfg:
    filters: int
    kernel_size: int = 11
    repeat: int = 3
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.1
    residual: bool = True
    separable: bool = False
    activation: str = "relu"  # jasper_activations registry (jasper.py:24)


# reference jasper_activations registry (parts/jasper.py:24 + activations.py)
ACTIVATIONS = {
    "relu": nn.relu,
    "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "selu": nn.selu,
    "swish": nn.silu,  # Swish(x) = x*sigmoid(x) == SiLU
}


class _MaskedConv1d(nn.Module):
    filters: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, lens, pad_mask):
        if pad_mask is not None and self.kernel_size > 1:
            x = jnp.where(pad_mask[:, :, None], 0.0, x)
        pad = (self.dilation * (self.kernel_size - 1)) // 2
        w = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (self.kernel_size, x.shape[-1] // self.groups, self.filters),
        )
        y = lax.conv_general_dilated(
            x, w, window_strides=(self.stride,), padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.stride > 1:
            lens = (lens + 2 * pad - self.dilation * (self.kernel_size - 1) - 1) // self.stride + 1
            pad_mask = create_pad_mask(lens, y.shape[1])
        return y, lens, pad_mask


class JasperBlock(nn.Module):
    cfg: JasperBlockCfg

    @nn.compact
    def __call__(self, x, lens, train: bool = False):
        c = self.cfg
        act = ACTIVATIONS[c.activation]
        pad_mask = create_pad_mask(lens, x.shape[1])
        res_in, res_lens = x, lens
        h = x
        for r in range(c.repeat):
            stride = c.stride if r == 0 else 1
            if c.separable:
                h, lens, pad_mask = _MaskedConv1d(
                    h.shape[-1], c.kernel_size, stride, c.dilation,
                    groups=h.shape[-1], name=f"dw_{r}",
                )(h, lens, pad_mask)
                h, lens, pad_mask = _MaskedConv1d(
                    c.filters, 1, 1, 1, name=f"pw_{r}"
                )(h, lens, pad_mask)
            else:
                h, lens, pad_mask = _MaskedConv1d(
                    c.filters, c.kernel_size, stride, c.dilation,
                    name=f"conv_{r}",
                )(h, lens, pad_mask)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name=f"bn_{r}",
            )(h)
            last = r == c.repeat - 1
            if not (last and c.residual):
                h = act(h)
                h = nn.Dropout(c.dropout, deterministic=not train)(h)
        if c.residual and c.stride == 1:
            res = nn.Dense(c.filters, name="res_proj")(res_in)
            res = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name="res_bn",
            )(res)
            h = h + res
            h = act(h)
            h = nn.Dropout(c.dropout, deterministic=not train)(h)
        return h, lens


class ConvASREncoder(nn.Module):
    """Stack of JasperBlocks: specs (B, T, F) -> features (B, T', D)."""

    blocks: Tuple[JasperBlockCfg, ...]

    @nn.compact
    def __call__(self, x, lens, train: bool = False):
        for i, cfg in enumerate(self.blocks):
            x, lens = JasperBlock(cfg, name=f"block_{i}")(x, lens, train=train)
        return x, lens
