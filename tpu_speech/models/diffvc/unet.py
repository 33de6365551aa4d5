"""DiffVC conditional U-Net score estimator + reference-mel RefBlock.

Re-design of DiffVC/model/diffusion.py:17-106 and model/modules.py:128-166.
Conditioning = [time emb ⊕ RefBlock(diffused reference mel) ⊕ speaker emb]
-> MLP -> broadcast over the (F, T) grid as extra input channels.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpu_speech.nn.unet import (
    Block,
    Conv2dTorch,
    ResidualRezeroAttn,
    ResnetBlock,
    SinusoidalPosEmb,
    Downsample,
    Upsample,
    mish,
)


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (affine)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias


def glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * nn.sigmoid(b)


class RefBlockConv(nn.Module):
    """conv3x3 -> InstanceNorm -> GLU over channels."""

    out_channels: int  # pre-GLU channel count (halved by GLU)

    @nn.compact
    def __call__(self, x):
        h = Conv2dTorch(self.out_channels, 3, padding=1, name="conv")(x)
        h = InstanceNorm2d(self.out_channels, name="norm")(h)
        return glu(h)


class RefBlock(nn.Module):
    """Reference-mel summarizer: conv/GLU pyramid + time-emb injections,
    masked mean pool -> (B, out_dim) (modules.py:128-166)."""

    out_dim: int

    @nn.compact
    def __call__(self, ref, ref_mask, time_emb):
        # ref: (B, F, T, 1) NHWC; ref_mask: (B, 1, T, 1)
        base = self.out_dim // 4
        m = ref_mask
        y = RefBlockConv(2 * base, name="block11")(ref * m)
        y = RefBlockConv(2 * base, name="block12")(y * m)
        y = y + nn.Dense(base, name="mlp1")(mish(time_emb))[:, None, None, :]
        y = RefBlockConv(4 * base, name="block21")(y * m)
        y = RefBlockConv(4 * base, name="block22")(y * m)
        y = y + nn.Dense(2 * base, name="mlp2")(mish(time_emb))[:, None, None, :]
        y = RefBlockConv(8 * base, name="block31")(y * m)
        y = RefBlockConv(8 * base, name="block32")(y * m)
        y = nn.Dense(self.out_dim, name="final_conv")(y * m)
        y = y * m
        n_feats = ref.shape[1]
        denom = jnp.sum(m, axis=(1, 2, 3), keepdims=False)[:, None] * n_feats
        return jnp.sum(y, axis=(1, 2)) / denom


class GradLogPEstimatorVC(nn.Module):
    """Speaker/reference-conditional U-Net (diffusion.py:17-106).

    Inputs channels-last: x, mean (B, T, F); ref (B, Tr, F); masks (B, T)/(B, Tr);
    c (B, 256) speaker embedding; t (B,).
    """

    dim_base: int
    dim_cond: int
    use_ref_t: bool = True
    dim_mults: Sequence[int] = (1, 2, 4)
    groups: int = 8

    @nn.compact
    def __call__(self, x, x_mask, mean, ref, ref_mask, c, t):
        condition = SinusoidalPosEmb(self.dim_base, name="time_pos_emb")(t)
        t_emb = nn.Dense(self.dim_base * 4, name="mlp_0")(condition)
        t_emb = mish(t_emb)
        t_emb = nn.Dense(self.dim_base, name="mlp_1")(t_emb)

        h = jnp.stack([mean.transpose(0, 2, 1), x.transpose(0, 2, 1)], axis=-1)
        m = x_mask[:, None, :, None]  # (B,1,T,1)
        ref_img = ref.transpose(0, 2, 1)[..., None]  # (B, F, Tr, 1)
        rm = ref_mask[:, None, :, None]

        if self.use_ref_t:
            ref_feat = RefBlock(self.dim_cond, name="ref_block")(ref_img, rm, t_emb)
            condition = jnp.concatenate([condition, ref_feat], axis=1)
        condition = jnp.concatenate([condition, c], axis=1)
        cond = nn.Dense(4 * self.dim_cond, name="cond_block_0")(condition)
        cond = mish(cond)
        cond = nn.Dense(self.dim_cond, name="cond_block_1")(cond)
        cond_grid = jnp.broadcast_to(
            cond[:, None, None, :], (h.shape[0], h.shape[1], h.shape[2], self.dim_cond)
        )
        h = jnp.concatenate([h, cond_grid], axis=-1)

        num_res = len(self.dim_mults)
        dims = [self.dim_base * mm for mm in self.dim_mults]

        hiddens = []
        masks = [m]
        for i, d in enumerate(dims):
            mask_down = masks[-1]
            h = ResnetBlock(d, self.groups, name=f"down_{i}_res1")(h, mask_down, t_emb)
            h = ResnetBlock(d, self.groups, name=f"down_{i}_res2")(h, mask_down, t_emb)
            h = ResidualRezeroAttn(name=f"down_{i}_attn")(h)
            hiddens.append(h)
            if i < num_res - 1:
                h = Downsample(d, name=f"down_{i}_ds")(h * mask_down)
                masks.append(mask_down[:, :, ::2, :])

        mask_mid = masks[-1]
        h = ResnetBlock(dims[-1], self.groups, name="mid_block1")(h, mask_mid, t_emb)
        h = ResidualRezeroAttn(name="mid_attn")(h)
        h = ResnetBlock(dims[-1], self.groups, name="mid_block2")(h, mask_mid, t_emb)

        for j, i in enumerate(reversed(range(1, num_res))):
            mask_up = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock(dims[i - 1], self.groups, name=f"up_{j}_res1")(h, mask_up, t_emb)
            h = ResnetBlock(dims[i - 1], self.groups, name=f"up_{j}_res2")(h, mask_up, t_emb)
            h = ResidualRezeroAttn(name=f"up_{j}_attn")(h)
            h = Upsample(dims[i - 1], name=f"up_{j}_us")(h * mask_up)

        h = Block(self.dim_base, self.groups, name="final_block")(h, m)
        out = Conv2dTorch(1, 1, name="final_conv")(h * m)
        out = (out * m)[..., 0]
        return out.transpose(0, 2, 1)  # (B, T, F)
