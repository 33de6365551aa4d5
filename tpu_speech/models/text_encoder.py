"""Grad-TTS text encoder (phonemes -> mel-frame prior + log-durations).

Re-design of Grad-TTS/model/text_encoder.py:281-326 in channels-last layout:
embedding (x sqrt(d)) -> ConvReluNorm prenet -> rel-pos window transformer ->
mu projection, plus a gradient-detached duration predictor.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_speech.nn.blocks import (
    Conv1d,
    ConvReluNorm,
    DurationPredictor,
    RelPosTransformer,
)
from tpu_speech.ops.masks import sequence_mask


class TextEncoder(nn.Module):
    n_vocab: int
    n_feats: int
    n_channels: int
    filter_channels: int
    filter_channels_dp: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    window_size: Optional[int] = None
    spk_emb_dim: int = 64
    n_spks: int = 1

    @nn.compact
    def __call__(self, x, x_lengths, spk=None, train: bool = False):
        """x: (B, Tx) int ids; x_lengths: (B,). Returns (mu, logw, x_mask):
        mu (B, Tx, n_feats), logw (B, Tx), x_mask (B, Tx) float."""
        emb = nn.Embed(
            self.n_vocab,
            self.n_channels,
            embedding_init=nn.initializers.normal(self.n_channels**-0.5),
            name="emb",
        )
        h = emb(x) * math.sqrt(self.n_channels)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(h.dtype)
        m = x_mask[:, :, None]

        h = ConvReluNorm(
            self.n_channels,
            self.n_channels,
            kernel_size=5,
            n_layers=3,
            p_dropout=0.5,
            name="prenet",
        )(h, m, train=train)

        if self.n_spks > 1:
            s = jnp.broadcast_to(
                spk[:, None, :], (h.shape[0], h.shape[1], self.spk_emb_dim)
            )
            h = jnp.concatenate([h, s], axis=-1)

        h = RelPosTransformer(
            self.n_channels + (self.spk_emb_dim if self.n_spks > 1 else 0),
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            window_size=self.window_size,
            name="encoder",
        )(h, m, train=train)

        mu = Conv1d(self.n_feats, 1, name="proj_m")(h) * m

        h_dp = jax.lax.stop_gradient(h)
        logw = DurationPredictor(
            self.filter_channels_dp,
            self.kernel_size,
            self.p_dropout,
            name="proj_w",
        )(h_dp, m, train=train)

        return mu, logw[..., 0], x_mask
