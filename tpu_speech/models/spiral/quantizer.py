"""Gumbel-softmax vector quantizer (present-but-unused in SPIRAL-base, kept
for capability parity with SPIRAL/nemo/collections/asr/modules/
wav2vec_modules.py:41-205)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GumbelVectorQuantizer(nn.Module):
    dim: int
    num_vars: int
    groups: int
    vq_dim: int
    combine_groups: bool = False
    temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)  # (start, stop, decay)

    @nn.compact
    def __call__(self, x, num_updates, train: bool = False, rng=None,
                 weight=None):
        """x: (B, T, dim) -> (quantized (B, T, vq_dim), prob_ppl_loss,
        cur_temp, prob_ppl).

        weight: optional (B, T) 0/1 frame weights — the perplexity statistics
        are computed over weighted frames only (the reference quantizes a
        gathered subset of frames, wav2vec_model.py:322-324; here all frames
        are quantized at fixed shape and the statistics are masked instead).
        """
        assert self.vq_dim % self.groups == 0
        var_dim = self.vq_dim // self.groups
        num_groups = 1 if self.combine_groups else self.groups

        codebook = self.param(
            "vars", nn.initializers.uniform(1.0),
            (1, num_groups * self.num_vars, var_dim),
        )
        logits = nn.Dense(
            self.groups * self.num_vars,
            kernel_init=nn.initializers.normal(1.0),
            name="weight_proj",
        )(x)

        b, t, _ = x.shape
        logits = logits.reshape(b * t, self.groups, self.num_vars)

        max_t, min_t, decay = self.temp
        cur_temp = jnp.maximum(max_t * decay ** num_updates, min_t)

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if weight is None:
            avg_probs = jnp.mean(probs, axis=0)
        else:
            w = weight.reshape(b * t, 1, 1).astype(jnp.float32)
            avg_probs = jnp.sum(probs * w, axis=0) / jnp.maximum(
                jnp.sum(w), 1.0
            )
        prob_ppl = jnp.sum(
            jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1))
        )
        num_vars_total = self.num_vars * self.groups
        prob_ppl_loss = (num_vars_total - prob_ppl) / num_vars_total

        if train:
            if rng is None:
                rng = self.make_rng("gumbel")
            g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
            y_soft = jax.nn.softmax((logits + g) / cur_temp, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.num_vars, dtype=y_soft.dtype)
            # straight-through
            onehot = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            idx = jnp.argmax(logits, axis=-1)
            onehot = jax.nn.one_hot(idx, self.num_vars, dtype=x.dtype)

        cb = codebook
        if self.combine_groups:
            cb = jnp.tile(cb, (1, self.groups, 1))
        cb = cb.reshape(self.groups, self.num_vars, var_dim)
        quantized = jnp.einsum("ngv,gvd->ngd", onehot, cb)
        quantized = quantized.reshape(b, t, self.vq_dim)
        return quantized, prob_ppl_loss, cur_temp, prob_ppl
