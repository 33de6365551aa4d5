"""SPIRAL FeatureEncoder (conv-subsample + transformer blocks) and Projector.

Re-design of SPIRAL/nemo/collections/asr/parts/spec2vec.py:27-185 with
dataclass configs mirroring the reference experiment files
(examples/asr/conf/spiral/spiral_base_pretrain_ls960.py:48-153).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_speech.models.spiral.conv_layers import ConvNormAct, create_pad_mask
from tpu_speech.models.spiral.wav2vec import TransformerEncoder


@dataclasses.dataclass(frozen=True)
class ConvLayerCfg:
    filters: int
    kernel_size: Tuple[int, ...] = (5,)
    stride: Tuple[int, ...] = (1,)
    norm_type: Optional[str] = "ln"
    act_func: Optional[str] = "relu"
    dropout: float = 0.0
    bias: Optional[bool] = True


@dataclasses.dataclass(frozen=True)
class TransformerCfg:
    encoder_layers: int
    embedding_dim: int
    ffn_embedding_dim: int
    num_attention_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1   # wav2vec_config.py:72
    activation_dropout: float = 0.0  # wav2vec_config.py:73
    encoder_layerdrop: float = 0.0
    conv_pos: int = 128
    conv_pos_groups: int = 16
    layer_norm_first: bool = True
    activation_fn: str = "gelu"


@dataclasses.dataclass(frozen=True)
class ConvTransformerBlockCfg:
    conv_layers: Tuple[ConvLayerCfg, ...]
    transformer: Optional[TransformerCfg] = None


@dataclasses.dataclass(frozen=True)
class StreamingCfg:
    """Streaming-trainable encoder mode: causal convs, causal positional
    conv, and block-chunked attention. `chunk_frames` is the chunk width in
    INPUT spec frames (must be divisible by the encoder's total subsample
    factor); each transformer block chunks at chunk_frames / its cumulative
    subsample. An offline forward in this mode equals the incremental
    chunk-by-chunk inference in models/spiral/streaming.py exactly —
    train/serve parity by construction (the reference's incremental-state
    attention, multihead_attention.py:15-465, ships unused and untrained).
    """

    chunk_frames: int
    left_chunks: int = 2


# SPIRAL-base feature encoder (spiral_base_pretrain_ls960.py:48-111)
def spiral_base_blocks() -> Tuple[ConvTransformerBlockCfg, ...]:
    return (
        ConvTransformerBlockCfg(
            conv_layers=(
                ConvLayerCfg(384, (5,), (2,), "ln", "relu", 0.1),
                ConvLayerCfg(512, (5,), (2,), "ln", "relu", 0.1),
                ConvLayerCfg(512, (1,), (1,), "ln", None, 0.0),
            ),
            transformer=TransformerCfg(2, 512, 2048, 8, 0.1, encoder_layerdrop=0.0),
        ),
        ConvTransformerBlockCfg(
            conv_layers=(
                ConvLayerCfg(1536, (5,), (2,), "ln", "relu", 0.1),
                ConvLayerCfg(768, (1,), (1,), "ln", None, 0.0),
            ),
            transformer=TransformerCfg(10, 768, 3072, 12, 0.1, encoder_layerdrop=0.05),
        ),
    )


# SPIRAL-large feature encoder (spiral_large_pretrain_librilight.py:49-113):
# block1 convs 384/512 stride 2,2 + 512 1x1 + 4-layer transformer(512);
# block2 convs 2048 stride 2 + 1024 1x1 + 20-layer transformer(1024, 16 heads)
def spiral_large_blocks() -> Tuple[ConvTransformerBlockCfg, ...]:
    return (
        ConvTransformerBlockCfg(
            conv_layers=(
                ConvLayerCfg(384, (5,), (2,), "ln", "relu", 0.1),
                ConvLayerCfg(512, (5,), (2,), "ln", "relu", 0.1),
                ConvLayerCfg(512, (1,), (1,), "ln", None, 0.0),
            ),
            transformer=TransformerCfg(4, 512, 2048, 8, 0.1, encoder_layerdrop=0.05),
        ),
        ConvTransformerBlockCfg(
            conv_layers=(
                ConvLayerCfg(2048, (5,), (2,), "ln", "relu", 0.1),
                ConvLayerCfg(1024, (1,), (1,), "ln", None, 0.0),
            ),
            transformer=TransformerCfg(20, 1024, 4096, 16, 0.1, encoder_layerdrop=0.05),
        ),
    )


class FeatureEncoder(nn.Module):
    """specs (B, T, F) -> features (B, T', D) with per-conv length tracking."""

    blocks: Tuple[ConvTransformerBlockCfg, ...]
    use_conv_mask: bool = True
    streaming: Optional[StreamingCfg] = None

    @property
    def output_dim(self) -> int:
        last = self.blocks[-1]
        if last.transformer is not None:
            return last.transformer.embedding_dim
        return last.conv_layers[-1].filters

    @property
    def subsample_factor(self) -> int:
        f = 1
        for blk in self.blocks:
            for c in blk.conv_layers:
                f *= c.stride[0]
        return f

    def subsampled_lens(self, lens):
        for blk in self.blocks:
            for c in blk.conv_layers:
                if c.stride[0] > 1:
                    lens = (lens + c.stride[0] - 1) // c.stride[0]
        return lens

    @nn.compact
    def __call__(self, x, lens, train: bool = False):
        stream = self.streaming
        if stream is not None:
            assert stream.chunk_frames % self.subsample_factor == 0, (
                "streaming chunk_frames must divide by the encoder's total "
                f"subsample factor ({self.subsample_factor})"
            )
        pad_mask = create_pad_mask(lens, x.shape[1]) if self.use_conv_mask else None
        cum_stride = 1
        for bi, blk in enumerate(self.blocks):
            for ci, c in enumerate(blk.conv_layers):
                x, lens, pad_mask = ConvNormAct(
                    c.filters, c.kernel_size, c.stride, c.norm_type,
                    c.act_func, c.dropout, "1d", bias=c.bias,
                    causal=stream is not None,
                    name=f"block{bi}_conv{ci}",
                )(x, lens, pad_mask, train=train)
                cum_stride *= c.stride[0]
            if blk.transformer is not None:
                t = blk.transformer
                x = TransformerEncoder(
                    t.embedding_dim, t.encoder_layers, t.ffn_embedding_dim,
                    t.num_attention_heads, t.dropout,
                    attention_dropout=t.attention_dropout,
                    activation_dropout=t.activation_dropout,
                    encoder_layerdrop=t.encoder_layerdrop,
                    conv_pos=t.conv_pos, conv_pos_groups=t.conv_pos_groups,
                    layer_norm_first=t.layer_norm_first,
                    activation_fn=t.activation_fn,
                    causal_pos=stream is not None,
                    attn_chunk=(
                        None if stream is None
                        else stream.chunk_frames // cum_stride
                    ),
                    attn_left_chunks=(
                        1 if stream is None else stream.left_chunks
                    ),
                    name=f"block{bi}_transformer",
                )(x, pad_mask, train=train)
        return x, lens


class Projector(nn.Module):
    """Optional conv stack + optional transformer + linear out-proj
    (spec2vec.py:128-185)."""

    conv_layers: Tuple[ConvLayerCfg, ...] = ()
    transformer: Optional[TransformerCfg] = None
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, lens, train: bool = False):
        pad_mask = create_pad_mask(lens, x.shape[1])
        for ci, c in enumerate(self.conv_layers):
            assert c.stride == (1,)
            x, lens, pad_mask = ConvNormAct(
                c.filters, c.kernel_size, c.stride, c.norm_type, c.act_func,
                c.dropout, "1d", bias=c.bias, name=f"conv{ci}",
            )(x, lens, pad_mask, train=train)
        if self.transformer is not None:
            t = self.transformer
            x = TransformerEncoder(
                t.embedding_dim, t.encoder_layers, t.ffn_embedding_dim,
                t.num_attention_heads, t.dropout,
                attention_dropout=t.attention_dropout,
                activation_dropout=t.activation_dropout,
                encoder_layerdrop=t.encoder_layerdrop,
                name="transformer",
            )(x, pad_mask, train=train)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, name="output_proj")(x)
        return x
