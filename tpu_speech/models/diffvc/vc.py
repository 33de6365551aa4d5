"""DiffVC facade: average-voice encoder + speaker-conditional diffusion decoder.

Re-design of DiffVC/model/vc.py:53-144: the conversion path (encode source +
reference, diffuse to t=1, reverse with the chosen sampler) compiles as one
jit graph with a static length bucket.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_speech.models.diffvc.diffusion import (
    compute_diffused_mean,
    diffusion_loss,
    reverse_diffusion,
)
from tpu_speech.models.diffvc.encoder import FwdDiffusion
from tpu_speech.models.diffvc.unet import GradLogPEstimatorVC
from tpu_speech.ops.masks import sequence_mask
from tpu_speech.utils.typing_contracts import typecheck


class DiffVC(nn.Module):
    n_feats: int = 80
    channels: int = 192
    filters: int = 768
    heads: int = 2
    layers: int = 6
    kernel: int = 3
    dropout: float = 0.1
    window_size: int = 4
    enc_dim: int = 128
    spk_dim: int = 128
    use_ref_t: bool = True
    dec_dim: int = 256
    beta_min: float = 0.05
    beta_max: float = 20.0

    def setup(self):
        self.encoder = FwdDiffusion(
            self.n_feats, self.channels, self.filters, self.heads, self.layers,
            self.kernel, self.dropout, self.window_size, self.enc_dim,
        )
        self.estimator = GradLogPEstimatorVC(
            self.dec_dim, self.spk_dim, self.use_ref_t
        )

    def encode(self, x, x_mask):
        """Average-voice mean (no grad through at decoder training)."""
        return self.encoder(x, x_mask[:, :, None], train=False)

    def score(self, xt, x_mask, mean, xt_ref, ref_mask, c, t):
        return self.estimator(xt, x_mask, mean, xt_ref, ref_mask, c, t)

    @typecheck(x="B T F @mel", x_lengths="B @lengths", x_ref="B T F @mel",
               c="B C @embedding")
    def __call__(self, x, x_lengths, x_ref, c, rng, train: bool = True):
        """Decoder (score-matching) loss; encoder frozen (vc.py:129-144).
        x, x_ref: (B, T, F) source/reference crops of the same utterance."""
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(x.dtype)
        mean = jax.lax.stop_gradient(self.encode(x, x_mask))
        mean_ref = jax.lax.stop_gradient(self.encode(x_ref, x_mask))

        def score_fn(xt, xt_ref, t):
            return self.estimator(xt, x_mask, mean, xt_ref, x_mask, c, t)

        return diffusion_loss(
            score_fn, x, x_mask, mean, x_ref, mean_ref, rng,
            self.n_feats, self.beta_min, self.beta_max,
        )


def voice_convert(
    model: DiffVC,
    params,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    x_ref: jnp.ndarray,
    x_ref_lengths: jnp.ndarray,
    c: jnp.ndarray,
    n_timesteps: int,
    mode: str = "ml",
    rng: Optional[jax.Array] = None,
):
    """Any-to-any conversion (vc.py:81-127). x padded to a 4-multiple bucket.

    Returns (mean_x, converted_mel) both (B, T, F); frames beyond x_lengths
    are zero-masked.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x_mask = sequence_mask(x_lengths, x.shape[1]).astype(x.dtype)
    ref_mask = sequence_mask(x_ref_lengths, x_ref.shape[1]).astype(x.dtype)

    mean = model.apply(params, x, x_mask, method=DiffVC.encode)
    mean_x = compute_diffused_mean(
        x, x_mask, mean, 1.0, model.beta_min, model.beta_max
    )
    mean_ref = model.apply(params, x_ref, ref_mask, method=DiffVC.encode)

    z = mean_x + jax.random.normal(rng, mean_x.shape, dtype=x.dtype)

    def score_fn(xt, xt_ref, t):
        return model.apply(
            params, xt, x_mask, mean, xt_ref, ref_mask, c, t,
            method=DiffVC.score,
        )

    y = reverse_diffusion(
        score_fn, z, x_mask, mean, x_ref, ref_mask, mean_ref,
        n_timesteps, model.beta_min, model.beta_max, mode=mode,
        rng=jax.random.fold_in(rng, 1),
    )
    return mean_x, y
