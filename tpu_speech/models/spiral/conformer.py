"""Conformer-CTC ASR encoder (beyond-reference model family).

The reference fork ships the Transformer-XL-style relative-position MHA as an
unused alternative (SPIRAL/nemo/collections/asr/parts/multi_head_attention.py
— capability-parity module: nn/conformer_attention.py) but no Conformer
encoder to use it. This completes the family in the upstream-NeMo shape
(Gulati et al. 2020): conv 2D subsampling, then blocks of
[half FF -> rel-pos MHA -> conv module -> half FF -> LN], with a
ConvASRDecoder CTC head. Everything is static-shape and channels-last; pads
are zeroed before every conv/norm so padded frames cannot contaminate valid
positions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_speech.nn.conformer_attention import (
    RelPositionMultiHeadAttention,
    rel_positional_encoding,
)


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    num_classes: int
    d_model: int = 176          # 'small' preset dims
    n_heads: int = 4
    n_layers: int = 16
    ff_expansion: int = 4
    conv_kernel: int = 31
    dropout: float = 0.1
    subsampling_filters: int = 176
    sample_rate: int = 16000
    n_mels: int = 80
    window_size: float = 0.025
    window_stride: float = 0.01
    blank_pos: str = "after_vocab_last"
    dither: float = 1e-5


def _len_mask(lens, t, dtype):
    return (jnp.arange(t)[None, :] < lens[:, None]).astype(dtype)


class _FeedForward(nn.Module):
    d_model: int
    expansion: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_model * self.expansion)(h)
        h = nn.swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class _ConvModule(nn.Module):
    """Pointwise -> GLU -> depthwise -> BN -> swish -> pointwise."""

    d_model: int
    kernel: int
    dropout: float

    @nn.compact
    def __call__(self, x, pad_mask, train: bool):
        h = nn.LayerNorm()(x)
        h = nn.Dense(2 * self.d_model)(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        h = h * pad_mask[:, :, None]  # no pad leakage into the depthwise rf
        h = nn.Conv(
            self.d_model, (self.kernel,), padding="SAME",
            feature_group_count=self.d_model, name="depthwise",
        )(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.swish(h)
        h = nn.Dense(self.d_model)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class ConformerBlock(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, attn_mask, pos_emb, train: bool):
        c = self.cfg
        x = x + 0.5 * _FeedForward(
            c.d_model, c.ff_expansion, c.dropout, name="ff1"
        )(x, train)
        h = nn.LayerNorm()(x)
        h = RelPositionMultiHeadAttention(
            c.n_heads, c.d_model, c.dropout, name="self_attn"
        )(h, h, h, mask=attn_mask, pos_emb=pos_emb, train=train)
        x = x + nn.Dropout(c.dropout, deterministic=not train)(h)
        x = x + _ConvModule(
            c.d_model, c.conv_kernel, c.dropout, name="conv"
        )(x, pad_mask, train)
        x = x + 0.5 * _FeedForward(
            c.d_model, c.ff_expansion, c.dropout, name="ff2"
        )(x, train)
        return nn.LayerNorm()(x) * pad_mask[:, :, None]


class ConformerEncoder(nn.Module):
    """(B, T, n_mels) specs -> (B, T//4, d_model); conv 2D subsampling (two
    stride-2 stages, the NeMo 'striding' default) then the block stack."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, specs, spec_lens, train: bool = False):
        c = self.cfg
        # zero the padded tail BEFORE subsampling: flax SAME padding makes
        # the stride-2 windows right-leaning, so the last valid output frame
        # reads a few padded input frames — they must be zeros, not garbage
        in_mask = _len_mask(spec_lens, specs.shape[1], specs.dtype)
        x = (specs * in_mask[:, :, None])[..., None]  # (B, T, F, 1)
        for i in range(2):
            x = nn.Conv(
                c.subsampling_filters, (3, 3), strides=(2, 2),
                name=f"subsample_{i}",
            )(x)
            x = nn.relu(x)
        b, t, f, ch = x.shape
        x = nn.Dense(c.d_model, name="proj")(x.reshape(b, t, f * ch))
        out_lens = spec_lens
        for _ in range(2):
            out_lens = (out_lens + 1) // 2  # ceil-div per stride-2 stage
        pad_mask = _len_mask(out_lens, t, x.dtype)
        attn_mask = ~(pad_mask[:, None, :].astype(bool))  # True = masked key
        attn_mask = jnp.broadcast_to(attn_mask, (b, t, t))
        pos_emb = jnp.asarray(rel_positional_encoding(t, c.d_model))
        x = x * pad_mask[:, :, None]
        for i in range(c.n_layers):
            x = ConformerBlock(c, name=f"layers_{i}")(
                x, pad_mask, attn_mask, pos_emb, train
            )
        return x, out_lens


class ConformerCTCModel(nn.Module):
    """wav-features -> Conformer encoder -> 1x1 CTC head. Drop-in for the
    EncDecCTC train/eval plumbing (same apply signature and blank_idx)."""

    cfg: ConformerConfig

    def setup(self):
        from tpu_speech.models.spiral.ctc import ConvASRDecoder

        self.encoder = ConformerEncoder(self.cfg, name="encoder")
        self.decoder = ConvASRDecoder(
            num_classes=self.cfg.num_classes,
            conv_layers=(),
            blank_pos=self.cfg.blank_pos,
            name="decoder",
        )

    @property
    def blank_idx(self) -> int:
        if self.cfg.blank_pos == "vocab_first":
            return 0
        return self.cfg.num_classes

    def featurize(self, wavs, wav_lens, train: bool = False, rng=None):
        from tpu_speech.models.spiral.features import filterbank_features

        return filterbank_features(
            wavs, wav_lens, sample_rate=self.cfg.sample_rate,
            window_size=self.cfg.window_size,
            window_stride=self.cfg.window_stride, nfilt=self.cfg.n_mels,
            dither=self.cfg.dither, training=train, rng=rng,
        )

    def __call__(self, specs, spec_lens, train: bool = False):
        feats, feat_lens = self.encoder(specs, spec_lens, train=train)
        return self.decoder(feats, feat_lens, train=train)
