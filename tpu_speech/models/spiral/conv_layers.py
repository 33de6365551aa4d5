"""Masked convolutions with TF-style padding and length tracking.

Re-design of SPIRAL/nemo/collections/asr/parts/convolution_layers.py:26-262 in
channels-last layout. Reproduces the reference's TF-pad parity quirk for 1d
convs: the even/odd pad choice keys off the *channel* dim of the torch [B,C,T]
tensor (convolution_layers.py:225-228), i.e. it is static per layer.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax


def create_pad_mask(lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at PADDED positions (reference convention), (B, T)."""
    return jnp.arange(max_len)[None, :] >= lens[:, None]


def tf_pad_1d(kernel: int, stride: int, in_channels: int) -> Tuple[int, int]:
    """TF 'same' pad amounts for the time dim of a 1d conv.

    Reference quirk: for stride 2 the asymmetric (k//2-1, k//2) pad is chosen
    when x.size(-2) — the CHANNEL count — is even (convolution_layers.py:225).
    """
    assert kernel % 2 == 1
    p = kernel // 2
    if stride == 2 and in_channels % 2 == 0:
        return (p - 1, p)
    return (p, p)


def tf_pad_2d(kernel: Tuple[int, int], stride: Tuple[int, int],
              t_dim: int, f_dim: int):
    """TF 'same' pads for (T, F) dims of a 2d conv; T/F parities are static
    under jit (taken from the padded array shape)."""
    pads = []
    for k, s, size in zip(kernel, stride, (t_dim, f_dim)):
        p = k // 2
        if s == 2 and size % 2 == 0:
            pads.append((p - 1, p))
        else:
            pads.append((p, p))
    return pads


class Conv1dTF(nn.Module):
    """1d conv, channels-last (B, T, C), TF 'same' padding, mask-aware.

    ``causal=True`` switches to left-only padding (k-1, 0): output frame t
    depends on inputs [t*s - (k-1), t*s] only — the streaming-trainable
    variant (the reference ships fairseq incremental-state plumbing unused,
    multihead_attention.py:15-465; here causality is a first-class mode so
    streaming inference can match training exactly).
    ``incremental=True`` (inference): the caller prepends the (k-1)-frame
    input cache itself; the conv runs VALID (no padding) and emits exactly
    the new frames' outputs.
    """

    filters: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    causal: bool = False

    @nn.compact
    def __call__(self, x, lens, pad_mask=None, incremental: bool = False):
        in_ch = x.shape[-1]
        if pad_mask is not None and self.kernel_size > 1:
            x = jnp.where(pad_mask[:, :, None], 0.0, x)
        if incremental:
            pads = (0, 0)
        elif self.causal:
            pads = (self.kernel_size - 1, 0)
        else:
            pads = tf_pad_1d(self.kernel_size, self.stride, in_ch)
        w = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),
            (self.kernel_size, in_ch, self.filters),
        )
        y = lax.conv_general_dilated(
            x, w, window_strides=(self.stride,), padding=[pads],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.filters,))
        if self.stride > 1:
            lens = (lens + self.stride - 1) // self.stride
            pad_mask = create_pad_mask(lens, y.shape[1])
        return y, lens, pad_mask


class Conv2dTF(nn.Module):
    """2d conv on (B, T, F, C), TF 'same' padding, mask-aware on T."""

    filters: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, lens, pad_mask=None):
        in_ch = x.shape[-1]
        if pad_mask is not None and self.kernel_size[0] > 1:
            x = jnp.where(pad_mask[:, :, None, None], 0.0, x)
        pads = tf_pad_2d(self.kernel_size, self.stride, x.shape[1], x.shape[2])
        w = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),
            (*self.kernel_size, in_ch, self.filters),
        )
        y = lax.conv_general_dilated(
            x, w, window_strides=self.stride, padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.filters,))
        if self.stride[0] > 1:
            lens = (lens + self.stride[0] - 1) // self.stride[0]
            pad_mask = create_pad_mask(lens, y.shape[1])
        return y, lens, pad_mask


class ConvNormAct(nn.Module):
    """conv -> {ln|bn|gn} -> act -> dropout with length/mask tracking
    (convolution_layers.py:62-102)."""

    filters: int
    kernel_size: Sequence[int]
    stride: Sequence[int] = (1,)
    norm_type: Optional[str] = None
    act_func: Optional[str] = None
    dropout: float = 0.0
    conv_type: str = "1d"
    ln_eps: float = 1e-5
    gn_groups: Optional[int] = None
    bias: Optional[bool] = None
    causal: bool = False

    @nn.compact
    def __call__(self, x, lens, pad_mask=None, train: bool = False,
                 incremental: bool = False):
        use_bias = self.bias if self.bias is not None else self.norm_type is None
        if self.conv_type == "1d":
            y, lens, pad_mask = Conv1dTF(
                self.filters, self.kernel_size[0], self.stride[0],
                use_bias=use_bias, causal=self.causal, name="conv",
            )(x, lens, pad_mask, incremental=incremental)
        else:
            y, lens, pad_mask = Conv2dTF(
                self.filters, tuple(self.kernel_size), tuple(self.stride),
                use_bias=use_bias, name="conv",
            )(x, lens, pad_mask)

        if self.norm_type == "ln":
            y = nn.LayerNorm(epsilon=self.ln_eps, name="norm")(y)
        elif self.norm_type == "bn":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name="norm",
            )(y)
        elif self.norm_type == "gn":
            y = nn.GroupNorm(num_groups=self.gn_groups, name="norm")(y)

        if self.act_func == "relu":
            y = nn.relu(y)
        elif self.act_func == "hardtanh":
            y = jnp.clip(y, -1.0, 1.0)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y, lens, pad_mask


class ProjUpsampling(nn.Module):
    """Conv projection + time-axis upsampling via reshape
    (convolution_layers.py:26-59); used by upsampling decoders."""

    filters: int
    kernel_size: Sequence[int]
    rate: int
    norm_type: Optional[str] = None
    act_func: Optional[str] = None
    dropout: float = 0.0
    ln_eps: float = 1e-5
    use_bias: bool = True
    causal: bool = False

    @nn.compact
    def __call__(self, x, lens, train: bool = False,
                 incremental: bool = False):
        pad_mask = (
            None if incremental else create_pad_mask(lens, x.shape[1])
        )
        y, lens, _ = Conv1dTF(
            self.filters * self.rate, self.kernel_size[0], 1,
            use_bias=self.use_bias, causal=self.causal, name="proj",
        )(x, lens, pad_mask, incremental=incremental)
        b, t, _ = y.shape
        y = y.reshape(b, t * self.rate, self.filters)
        lens = lens * self.rate
        if self.norm_type == "ln":
            y = nn.LayerNorm(epsilon=self.ln_eps, name="norm")(y)
        if self.act_func == "relu":
            y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y, lens
