"""DiffVC "average voice" encoder: MelEncoder + PostNet (+ FwdDiffusion facade).

Re-design of DiffVC/model/encoder.py:257-284, postnet.py:15-53, vc.py:19-48
in channels-last layout, reusing the shared glow-tts transformer blocks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu_speech.nn.blocks import ConvReluNorm, RelPosTransformer
from tpu_speech.nn.unet import Conv2dTorch, mish


class MelEncoder(nn.Module):
    """mel (B,T,F) -> 'average-voice' features (B,T,F)."""

    n_feats: int
    channels: int
    filters: int
    heads: int
    layers: int
    kernel: int
    dropout: float
    window_size: int = None

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        # x: (B, T, F); x_mask: (B, T, 1)
        h = nn.Dense(self.channels, name="init_proj")(x * x_mask)
        h = ConvReluNorm(
            self.channels, self.channels, kernel_size=5, n_layers=3,
            p_dropout=0.5, name="prenet",
        )(h, x_mask, train=train)
        h = RelPosTransformer(
            self.channels, self.filters, self.heads, self.layers, self.kernel,
            self.dropout, window_size=self.window_size, name="encoder",
        )(h, x_mask, train=train)
        return nn.Dense(self.n_feats, name="term_proj")(h * x_mask)


class PostNetBlock(nn.Module):
    """conv7x7 -> GroupNorm(8) -> Mish (postnet.py:15-23)."""

    dim: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask):
        h = Conv2dTorch(self.dim, 7, padding=3, name="conv")(x * mask)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(h)
        return mish(h) * mask


class PostNet(nn.Module):
    """2D conv residual refinement of the encoder output (postnet.py:26-53)."""

    dim: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, x_mask):
        # x: (B, T, F); treat as NHWC image (B, F, T, 1)
        h = x.transpose(0, 2, 1)[..., None]
        m = x_mask[:, None, :, :]  # (B,1,T,1)
        h = nn.Dense(self.dim, name="init_conv")(h * m)
        res_in = h
        r = PostNetBlock(self.dim, self.groups, name="block1")(res_in, m)
        r = PostNetBlock(self.dim, self.groups, name="block2")(r, m)
        h = nn.Dense(self.dim, name="res")(res_in * m) + r
        out = nn.Dense(1, name="final_conv")(h * m)
        return out[..., 0].transpose(0, 2, 1)  # (B, T, F)


class FwdDiffusion(nn.Module):
    """MelEncoder + PostNet trained against phoneme-averaged mels (vc.py:19-48)."""

    n_feats: int
    channels: int
    filters: int
    heads: int
    layers: int
    kernel: int
    dropout: float
    window_size: int
    dim: int

    def setup(self):
        self.encoder = MelEncoder(
            self.n_feats, self.channels, self.filters, self.heads, self.layers,
            self.kernel, self.dropout, self.window_size,
        )
        self.postnet = PostNet(self.dim)

    def __call__(self, x, x_mask, train: bool = False):
        z = self.encoder(x, x_mask, train=train)
        return self.postnet(z, x_mask)

    def compute_loss(self, x, y, x_mask, train: bool = False):
        z_out = self(x, x_mask, train=train)
        m = x_mask
        return jnp.sum(((z_out - y) ** 2) * m) / (jnp.sum(m) * self.n_feats)
