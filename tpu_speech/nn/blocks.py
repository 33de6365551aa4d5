"""Sequence-model building blocks (glow-tts family).

TPU-native re-design of the reference encoder stack
(Grad-TTS/model/text_encoder.py:11-279, reused by DiffVC's MelEncoder):
channels-last (B, T, C) layout so the feature dim rides the TPU lanes, dense
1x1 "convs" as plain matmuls on the MXU, and static-shape relative-position
attention.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) dim, eps=1e-4 (reference text_encoder.py:11-29)."""

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) * lax.rsqrt(var + self.eps)
        return x * gamma + beta


class Conv1d(nn.Module):
    """Torch-geometry 1D conv on (B, T, C); kernel param layout (k, in, out)."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        init = nn.initializers.zeros if self.zero_init else _torch_conv_init(k, x.shape[-1])
        w = self.param("kernel", init, (k, x.shape[-1], self.features))
        binit = (
            nn.initializers.zeros
            if self.zero_init
            else _torch_bias_init(k, x.shape[-1])
        )
        b = self.param("bias", binit, (self.features,)) if self.use_bias else None
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + b if b is not None else y


def _torch_conv_init(kernel_size: int, fan_in_channels: int):
    """Kaiming-uniform(a=sqrt(5)) — torch's Conv default — for behavioural parity
    of fresh training runs."""
    bound = math.sqrt(1.0 / (fan_in_channels * kernel_size))

    def init(key, shape, dtype=jnp.float32):
        import jax.random as jr

        return jr.uniform(key, shape, dtype, -bound, bound)

    return init


def _torch_bias_init(kernel_size: int, fan_in_channels: int):
    return _torch_conv_init(kernel_size, fan_in_channels)


class ConvReluNorm(nn.Module):
    """Conv prenet with residual zero-init projection (text_encoder.py:32-64)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        # x: (B, T, C); x_mask: (B, T, 1)
        x_org = x
        for i in range(self.n_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(
                x * x_mask
            )
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = x_org + Conv1d(self.out_channels, 1, zero_init=True, name="proj")(x)
        return x * x_mask


class DurationPredictor(nn.Module):
    """Two conv layers + projection to scalar log-duration (text_encoder.py:67-93)."""

    filter_channels: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name="norm_1")(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_2")(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name="norm_2")(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = Conv1d(1, 1, name="proj")(x * x_mask)
        return x * x_mask  # (B, T, 1)


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute (pad-reshape trick)."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, length * 2 * length)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, length - 1)))
    return x_flat.reshape(b, h, length + 1, 2 * length - 1)[:, :, :length, length - 1 :]


def _abs_to_rel(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, L) absolute weights -> (B, H, L, 2L-1) relative."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, length - 1)))
    x_flat = x.reshape(b, h, length * length + length * (length - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (length, 0)))
    return x_flat.reshape(b, h, length, 2 * length)[:, :, :, 1:]


def _windowed_rel_emb(emb: jnp.ndarray, window_size: int, length: int) -> jnp.ndarray:
    """Slice/pad the (heads_rel, 2w+1, d) embedding table to (heads_rel, 2L-1, d)."""
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class RelPosMultiHeadAttention(nn.Module):
    """Multi-head self-attention with windowed relative position bias.

    Matches Grad-TTS/model/text_encoder.py:96-215 (heads_share=True): shared
    (1, 2w+1, d_head) key/value relative embeddings, mask fill -1e4.
    """

    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, c, attn_mask=None, train: bool = False):
        # x (queries), c (keys/values): (B, T, C)
        d_head = self.channels // self.n_heads
        q = nn.Dense(self.channels, name="conv_q")(x)
        k = nn.Dense(self.channels, name="conv_k")(c)
        v = nn.Dense(self.channels, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        qh = q.reshape(b, t_t, self.n_heads, d_head).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t_s, self.n_heads, d_head).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t_s, self.n_heads, d_head).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / math.sqrt(d_head)
        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            rel_stddev = d_head**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, d_head),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, d_head),
            )
            key_rel = _windowed_rel_emb(emb_rel_k, self.window_size, t_s)
            rel_logits = jnp.einsum("bhtd,grd->bhtr", qh, key_rel)
            scores = scores + _rel_to_abs(rel_logits) / math.sqrt(d_head)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=not train)(p_attn)
        out = jnp.einsum("bhts,bhsd->bhtd", p_attn, vh)
        if self.window_size is not None:
            rel_weights = _abs_to_rel(p_attn)
            value_rel = _windowed_rel_emb(emb_rel_v, self.window_size, t_s)
            out = out + jnp.einsum("bhtr,grd->bhtd", rel_weights, value_rel)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return nn.Dense(self.out_channels, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward (kernel 3 in Grad-TTS) with masking (text_encoder.py:218-239)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(x * x_mask)
        return x * x_mask


class RelPosTransformer(nn.Module):
    """Post-norm transformer encoder with windowed rel-pos attention
    (text_encoder.py:242-278)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: Optional[int] = None

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        # x: (B, T, C), x_mask: (B, T, 1)
        attn_mask = x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]
        for i in range(self.n_layers):
            x = x * x_mask
            y = RelPosMultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                window_size=self.window_size,
                p_dropout=self.p_dropout,
                name=f"attn_{i}",
            )(x, x, attn_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + y)
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                self.p_dropout,
                name=f"ffn_{i}",
            )(x, x_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + y)
        return x * x_mask
