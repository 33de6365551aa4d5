"""fairseq-style transformer encoder with convolutional positional embedding.

Re-design of SPIRAL/nemo/collections/asr/parts/wav2vec.py:130-323 and
parts/multihead_attention.py:15-: pre-LN BERT-style layers, grouped conv
positional embedding with weight normalization (dim=2), layerdrop, GELU.
Layout (B, T, C) throughout (no T-major transposes needed on TPU).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv (k=128, g=16) with weight-norm(dim=2) + SamePad + GELU
    (wav2vec.py:139-152).

    ``causal=True`` pads left-only (k-1, 0): frame t sees [t-k+1, t] — the
    streaming-trainable mode. ``incremental=True`` (inference): the caller
    prepends the (k-1)-frame input cache and the conv runs VALID, emitting
    outputs for the new frames only.
    """

    embedding_dim: int
    conv_pos: int = 128
    conv_pos_groups: int = 16
    causal: bool = False

    @nn.compact
    def __call__(self, x, incremental: bool = False):
        k, g, c = self.conv_pos, self.conv_pos_groups, self.embedding_dim
        std = math.sqrt(4.0 / (k * c))
        # weight-norm parametrization: direction v + per-k magnitude g
        v = self.param("v", nn.initializers.normal(std), (k, c // g, c))
        gmag = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                nn.initializers.normal(std)(key, (k, c // g, c)),
                axis=(1, 2),
            ),
            (k,),
        )
        b = self.param("bias", nn.initializers.zeros, (c,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
        w = v / jnp.maximum(norm, 1e-12) * gmag[:, None, None]
        from tpu_speech.ops.fused_posconv import (
            fused_posconv_supported,
            grouped_conv1d,
        )

        if incremental:
            pads = (0, 0)
        elif self.causal:
            pads = (k - 1, 0)
        else:
            pads = (k // 2, k // 2)
        if not incremental and fused_posconv_supported(g, c, k):
            # OPT-IN Pallas im2col kernel (TPU_SPEECH_FUSED_POSCONV=1):
            # measured 3 ms/step slower than XLA's grouped conv at the
            # SPIRAL-base point — see ops/fused_posconv.py header for the
            # measured record. left_pad k//2 == SAME-even + trim.
            left = (k - 1) if self.causal else (k // 2)
            y = grouped_conv1d(x, w.astype(x.dtype), g, left) + b
        else:
            y = lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=[pads],
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=g,
            ) + b
            if k % 2 == 0 and not (self.causal or incremental):
                # SamePad: even kernel produces one extra frame
                y = y[:, :-1]
        return nn.gelu(y, approximate=False)


def chunked_attention_mask(t: int, chunk: int, left_chunks: int):
    """(T, T) bool, True where attention is ALLOWED under block-chunked
    streaming: frames in chunk j attend to all of chunks [j-left_chunks, j].

    This is the offline-trainable twin of the incremental KV-cache inference
    in models/spiral/streaming.py — an offline forward under this mask equals
    the chunk-by-chunk streaming forward exactly.
    """
    cj = jnp.arange(t) // chunk
    diff = cj[:, None] - cj[None, :]
    return (diff >= 0) & (diff <= left_chunks)


class _ProjParams(nn.Module):
    """nn.Dense-shaped parameters ({kernel, bias}, lecun_normal/zeros init)
    WITHOUT the matmul — MultiheadSelfAttention concatenates q/k/v kernels
    and runs one fused projection while keeping the exact nn.Dense param
    tree (checkpoints/converters unchanged)."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class MultiheadSelfAttention(nn.Module):
    """Standard softmax MHA with q/k/v/out projections (fairseq layout).

    On TPU (at supported sequence lengths) the score/softmax/dropout/value
    chain runs as the fused Pallas kernel ``ops/fused_attention.py`` — the
    (B, H, T, T) probs and their dropout bits never touch HBM, which is the
    single largest bandwidth term in the SPIRAL pretrain step. ``fused``
    overrides the auto choice (None = on for TPU when T <= MAX_T).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    fused: Optional[bool] = None
    # Pallas interpret mode for the fused path — CPU tests only (dropout_p
    # must be 0 there: the TPU PRNG has no interpret lowering)
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False,
                 attn_mask=None):
        from tpu_speech.ops.fused_attention import (
            fused_attention_supported,
            fused_qkv_self_attention,
            fused_qkv_supported,
            fused_self_attention,
        )

        d_head = self.embed_dim // self.num_heads
        # q/k/v projections issued as ONE (D, 3D) matmul: XLA does not merge
        # separate dots, and three (B*T, D)x(D, D) launches underfill the MXU
        # vs one (B*T, D)x(D, 3D). Param tree/names stay exactly nn.Dense's
        # ({q,k,v}_proj/{kernel,bias}) so converters and checkpoints are
        # untouched; the concat is fused into the dot by XLA. The q third's
        # d_head**-0.5 scale is folded into the weights (free at trace
        # time) so no separate q-scaling pass over (B,T,E) exists.
        ws, bs = zip(*[
            _ProjParams(self.embed_dim, name=n)(x.shape[-1])
            for n in ("q_proj", "k_proj", "v_proj")
        ])
        scale = d_head ** -0.5
        qkv_w = jnp.concatenate([ws[0] * scale, ws[1], ws[2]], axis=1)
        qkv_b = jnp.concatenate([bs[0] * scale, bs[1], bs[2]], axis=0)
        qkv = x @ qkv_w.astype(x.dtype) + qkv_b.astype(x.dtype)
        b, t, _ = x.shape

        # the merged-plane kernel needs the whole (T, 3E) plane in VMEM;
        # at shapes past its budget an explicit fused=True still runs the
        # per-head kernel (head-chunked VMEM sizing) rather than erroring
        qkv_kernel_ok = fused_attention_supported(t) and fused_qkv_supported(
            t, self.embed_dim, qkv.dtype.itemsize
        )
        use_fused = self.fused if self.fused is not None else qkv_kernel_ok
        if attn_mask is not None:
            # structured (e.g. chunked-streaming) masks run the unfused path
            use_fused = False
        drop_p = float(self.dropout) if train else 0.0
        if use_fused:
            seed = None
            if drop_p > 0.0:
                # a scalar int32 per (layer, step) from the dropout stream;
                # the kernel folds in (batch, head) ids
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1,
                    dtype=jnp.int32,
                )
            if qkv_kernel_ok or self.fused_interpret:
                # merged-plane kernel: heads are static column slices in
                # VMEM, the gradient returns as one (B,T,3E) plane — no
                # split/reshape/transpose copies on either side of the
                # custom call (round-4 trace: ~7.6 ms/step of zero-FLOP
                # formatting here)
                out = fused_qkv_self_attention(
                    qkv, self.num_heads, key_padding_mask, dropout_p=drop_p,
                    dropout_seed=seed, interpret=self.fused_interpret,
                )
            else:
                q, k, v = jnp.split(qkv, 3, axis=-1)
                out = fused_self_attention(
                    q.reshape(b, t, self.num_heads, d_head),
                    k.reshape(b, t, self.num_heads, d_head),
                    v.reshape(b, t, self.num_heads, d_head),
                    key_padding_mask, dropout_p=drop_p, dropout_seed=seed,
                ).reshape(b, t, self.embed_dim)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            qh = q.reshape(b, t, self.num_heads, d_head)
            kh = k.reshape(b, t, self.num_heads, d_head)
            vh = v.reshape(b, t, self.num_heads, d_head)
            scores = jnp.einsum("bthd,bshd->bhts", qh, kh)
            if attn_mask is not None:  # True = allowed, (T, T)
                scores = jnp.where(
                    attn_mask[None, None, :, :], scores, -1e9
                )
            if key_padding_mask is not None:
                # True = padded (reference convention); finite fill so fully
                # padded query rows yield zeros rather than NaNs after masking
                scores = jnp.where(
                    key_padding_mask[:, None, None, :], -1e9, scores
                )
            p = nn.softmax(scores, axis=-1)
            p = nn.Dropout(self.dropout, deterministic=not train)(p)
            out = jnp.einsum(
                "bhts,bshd->bthd", p, vh
            ).reshape(b, t, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class TransformerSentenceEncoderLayer(nn.Module):
    """Pre/post-LN transformer layer (wav2vec.py:219-322)."""

    embedding_dim: int
    ffn_embedding_dim: int
    num_attention_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation_fn: str = "gelu"
    layer_norm_first: bool = True

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False,
                 attn_mask=None):
        act = (
            (lambda v: nn.gelu(v, approximate=False))
            if self.activation_fn == "gelu"
            else nn.relu
        )
        if self.layer_norm_first:
            residual = x
            h = nn.LayerNorm(name="self_attn_layer_norm")(x)
            h = MultiheadSelfAttention(
                self.embedding_dim, self.num_attention_heads,
                self.attention_dropout, name="self_attn",
            )(h, key_padding_mask, train=train, attn_mask=attn_mask)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = residual + h

            residual = x
            h = nn.LayerNorm(name="final_layer_norm")(x)
            h = act(nn.Dense(self.ffn_embedding_dim, name="fc1")(h))
            h = nn.Dropout(self.activation_dropout, deterministic=not train)(h)
            h = nn.Dense(self.embedding_dim, name="fc2")(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = residual + h
        else:
            residual = x
            h = MultiheadSelfAttention(
                self.embedding_dim, self.num_attention_heads,
                self.attention_dropout, name="self_attn",
            )(x, key_padding_mask, train=train, attn_mask=attn_mask)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = nn.LayerNorm(name="self_attn_layer_norm")(residual + h)
            residual = x
            h = act(nn.Dense(self.ffn_embedding_dim, name="fc1")(x))
            h = nn.Dropout(self.activation_dropout, deterministic=not train)(h)
            h = nn.Dense(self.embedding_dim, name="fc2")(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = nn.LayerNorm(name="final_layer_norm")(residual + h)
        return x


class TransformerEncoder(nn.Module):
    """Conv-pos embedding + layer stack with layerdrop (wav2vec.py:130-216)."""

    embedding_dim: int
    encoder_layers: int
    ffn_embedding_dim: int
    num_attention_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation_fn: str = "gelu"
    layer_norm_first: bool = True
    encoder_layerdrop: float = 0.0
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # streaming-trainable mode: causal positional conv + block-chunked
    # attention (frames in chunk j attend to chunks [j-left, j]); an offline
    # forward in this mode equals the incremental chunked inference in
    # models/spiral/streaming.py exactly
    causal_pos: bool = False
    attn_chunk: Optional[int] = None
    attn_left_chunks: int = 1

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        if padding_mask is not None:
            x = jnp.where(padding_mask[:, :, None], 0.0, x)
        x = x + ConvPositionalEmbedding(
            self.embedding_dim, self.conv_pos, self.conv_pos_groups,
            causal=self.causal_pos, name="pos_conv",
        )(x)
        attn_mask = None
        if self.attn_chunk is not None:
            attn_mask = chunked_attention_mask(
                x.shape[1], self.attn_chunk, self.attn_left_chunks
            )
        if not self.layer_norm_first:
            x = nn.LayerNorm(name="layer_norm")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        for i in range(self.encoder_layers):
            layer_out = TransformerSentenceEncoderLayer(
                self.embedding_dim, self.ffn_embedding_dim,
                self.num_attention_heads, self.dropout,
                self.attention_dropout, self.activation_dropout,
                self.activation_fn, self.layer_norm_first,
                name=f"layer_{i}",
            )(x, padding_mask, train=train, attn_mask=attn_mask)
            if train and self.encoder_layerdrop > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.encoder_layerdrop
                )
                x = jnp.where(keep, layer_out, x)
            else:
                x = layer_out

        if self.layer_norm_first:
            x = nn.LayerNorm(name="layer_norm")(x)
        return x
