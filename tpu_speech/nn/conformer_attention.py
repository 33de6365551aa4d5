"""Transformer-XL style relative-position attention (Conformer family).

Capability-parity module for the reference's RelPositionMultiHeadAttention /
RelPositionalEncoding (SPIRAL/nemo/collections/asr/parts/
multi_head_attention.py — shipped as an alternative encoder, unused by the
SPIRAL configs): content/position score decomposition with learned u/v biases
(https://arxiv.org/abs/1901.02860 §3.3).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def rel_positional_encoding(length: int, d_model: int) -> np.ndarray:
    """Sinusoidal embeddings for relative offsets length-1 .. -(length-1),
    shape (2*length - 1, d_model)."""
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((2 * length - 1, d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) position scores -> (B, H, T, T) absolute alignment
    (reference rel_shift, multi_head_attention.py:164-172: flat pad by T,
    reshape to pos_len+1, truncate, flip)."""
    b, h, t, pos_len = x.shape
    x = x.reshape(b, h, -1)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t)))
    x = x.reshape(b, h, t, pos_len + 1)
    return jnp.flip(x[:, :, :, :t], axis=-1)


class RelPositionMultiHeadAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 train: bool = False):
        """query/key/value: (B, T, F); mask: (B, T, T) True at masked pairs;
        pos_emb: (2T-1, F) relative sinusoids (defaults generated)."""
        d_k = self.n_feat // self.n_head
        b, t, _ = query.shape
        if pos_emb is None:
            pos_emb = jnp.asarray(rel_positional_encoding(t, self.n_feat))

        q = nn.Dense(self.n_feat, name="linear_q")(query)
        k = nn.Dense(self.n_feat, name="linear_k")(key)
        v = nn.Dense(self.n_feat, name="linear_v")(value)
        p = nn.Dense(self.n_feat, use_bias=False, name="linear_pos")(pos_emb)

        qh = q.reshape(b, t, self.n_head, d_k)
        kh = k.reshape(b, -1, self.n_head, d_k)
        vh = v.reshape(b, -1, self.n_head, d_k)
        ph = p.reshape(-1, self.n_head, d_k)

        u = self.param("pos_bias_u", nn.initializers.zeros, (self.n_head, d_k))
        vb = self.param("pos_bias_v", nn.initializers.zeros, (self.n_head, d_k))

        # content score: (q + u) . k  /  position score: (q + v) . p, shifted
        ac = jnp.einsum("bthd,bshd->bhts", qh + u[None, None], kh)
        bd = jnp.einsum("bthd,rhd->bhtr", qh + vb[None, None], ph)
        scores = (ac + _rel_shift(bd)) / math.sqrt(d_k)

        if mask is not None:
            scores = jnp.where(mask[:, None], -1e9, scores)
        attn = nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(mask[:, None], 0.0, attn)
        attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        out = jnp.einsum("bhts,bshd->bthd", attn, vh).reshape(b, t, self.n_feat)
        return nn.Dense(self.n_feat, name="linear_out")(out)
