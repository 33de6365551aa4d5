"""HiFi-GAN vocoder (V1), TPU-native.

Re-design of the vendored reference (Grad-TTS/hifi-gan/models.py:13-284):
channels-last (B, T, C), torch-geometry convs for checkpoint parity, weight
norm folded at conversion time (inference) — so mel->wav is one jit graph of
large MXU-friendly convolutions. Includes the MPD/MSD discriminators and GAN
losses so vocoder training is supported as a capability (the reference vendors
them untrained, models.py:130-284).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_speech.nn.convops import conv1d, conv_transpose1d

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _uniform(bound):
    def init(key, shape, dtype=jnp.float32):
        import jax.random as jr

        return jr.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1dT(nn.Module):
    """Torch-geometry 1D conv (explicit padding/dilation), kernel (k, in, out)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        fan_in = (x.shape[-1] // self.groups) * self.kernel_size
        bound = math.sqrt(1.0 / fan_in)
        w = self.param(
            "kernel",
            _uniform(bound),
            (self.kernel_size, x.shape[-1] // self.groups, self.features),
        )
        b = self.param("bias", _uniform(bound), (self.features,))
        return conv1d(
            x, w, b,
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
        )


class ConvTranspose1dT(nn.Module):
    """Torch-geometry transposed 1D conv, kernel (k, in, out)."""

    features: int
    kernel_size: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size
        bound = math.sqrt(1.0 / fan_in)
        w = self.param(
            "kernel", _uniform(bound), (self.kernel_size, x.shape[-1], self.features)
        )
        b = self.param("bias", _uniform(bound), (self.features,))
        return conv_transpose1d(x, w, b, stride=self.stride, padding=self.padding)


class ResBlock1(nn.Module):
    """MRF residual block: 3x (lrelu -> dilated conv -> lrelu -> conv)
    (models.py:13-50)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1dT(
                self.channels, self.kernel_size,
                padding=get_padding(self.kernel_size, d), dilation=d,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1dT(
                self.channels, self.kernel_size,
                padding=get_padding(self.kernel_size, 1), dilation=1,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Lighter variant: 2x (lrelu -> dilated conv) (models.py:53-70)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1dT(
                self.channels, self.kernel_size,
                padding=get_padding(self.kernel_size, d), dilation=d,
                name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """Mel (B, T, 80) -> waveform (B, T * prod(upsample_rates)).

    V1 config: rates (8,8,2,2), kernels (16,16,4,4), 512 initial channels,
    MRF kernels (3,7,11) x dilations (1,3,5).
    """

    resblock: str = "1"
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @nn.compact
    def __call__(self, x):
        num_kernels = len(self.resblock_kernel_sizes)
        block_cls = ResBlock1 if self.resblock == "1" else ResBlock2

        x = Conv1dT(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1dT(
                ch, k, stride=u, padding=(k - u) // 2, name=f"ups_{i}"
            )(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                blk = block_cls(ch, rk, tuple(rd), name=f"resblocks_{i}_{j}")(x)
                xs = blk if xs is None else xs + blk
            x = xs / num_kernels
        x = nn.leaky_relu(x)
        x = Conv1dT(1, 7, padding=3, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]  # (B, N)


class DiscriminatorP(nn.Module):
    """Period discriminator: fold wav into (T/p, p) and run 2D convs
    (models.py:130-172). `channels` defaults to the reference widths —
    override only for reduced test/tiny variants."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Sequence[int] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, x):
        # x: (B, N)
        from tpu_speech.nn.convops import conv2d

        b, n = x.shape
        pad = (self.period - n % self.period) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        n = x.shape[1]
        h = x.reshape(b, n // self.period, self.period, 1)  # NHWC

        fmap = []
        channels = list(self.channels)
        for i, ch in enumerate(channels):
            k = self.kernel_size
            fan_in = h.shape[-1] * k
            bound = math.sqrt(1.0 / fan_in)
            w = self.param(f"conv_{i}_kernel", _uniform(bound), (k, 1, h.shape[-1], ch))
            bb = self.param(f"conv_{i}_bias", _uniform(bound), (ch,))
            from jax import lax

            h = lax.conv_general_dilated(
                h, w, window_strides=(self.stride, 1),
                padding=[(get_padding(5, 1), get_padding(5, 1)), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bb
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        # 5th conv: stride 1, padding 2
        ch_last = channels[-1]
        fan_in = h.shape[-1] * self.kernel_size
        bound = math.sqrt(1.0 / fan_in)
        w = self.param(
            "conv_4_kernel", _uniform(bound),
            (self.kernel_size, 1, h.shape[-1], ch_last),
        )
        bb = self.param("conv_4_bias", _uniform(bound), (ch_last,))
        from jax import lax

        h = lax.conv_general_dilated(
            h, w, window_strides=(1, 1), padding=[(2, 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bb
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        # post conv (3,1) pad (1,0) -> 1 channel
        bound = math.sqrt(1.0 / (h.shape[-1] * 3))
        w = self.param("conv_post_kernel", _uniform(bound), (3, 1, h.shape[-1], 1))
        bb = self.param("conv_post_bias", _uniform(bound), (1,))
        h = lax.conv_general_dilated(
            h, w, window_strides=(1, 1), padding=[(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bb
        fmap.append(h)
        return h.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (models.py:188-218). `specs` rows are
    (channels, kernel, stride, padding, groups) and default to the reference
    widths — override only for reduced test/tiny variants."""

    specs: Sequence[Tuple[int, int, int, int, int]] = (
        (128, 15, 1, 7, 1),
        (128, 41, 2, 20, 4),
        (256, 41, 2, 20, 16),
        (512, 41, 4, 20, 16),
        (1024, 41, 4, 20, 16),
        (1024, 41, 1, 20, 16),
        (1024, 5, 1, 2, 1),
    )

    @nn.compact
    def __call__(self, x):
        # x: (B, N) -> (B, N, 1)
        h = x[:, :, None]
        specs = list(self.specs)
        fmap = []
        for i, (ch, k, s, p, g) in enumerate(specs):
            h = Conv1dT(ch, k, stride=s, padding=p, groups=g, name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = Conv1dT(1, 3, padding=1, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Sequence[int] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, y, y_hat):
        rs, gs, fr, fg = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"disc_{p}", channels=self.channels)
            r, fmap_r = d(y)
            g, fmap_g = d(y_hat)
            rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
        return rs, gs, fr, fg


class MultiScaleDiscriminator(nn.Module):
    num_scales: int = 3
    disc_specs: Optional[Sequence[Tuple[int, int, int, int, int]]] = None

    @nn.compact
    def __call__(self, y, y_hat):
        rs, gs, fr, fg = [], [], [], []
        for i in range(self.num_scales):
            if i > 0:
                y = nn.avg_pool(
                    y[:, :, None], (4,), strides=(2,), padding=[(2, 2)]
                )[:, :, 0]
                y_hat = nn.avg_pool(
                    y_hat[:, :, None], (4,), strides=(2,), padding=[(2, 2)]
                )[:, :, 0]
            kw = {} if self.disc_specs is None else {"specs": self.disc_specs}
            d = DiscriminatorS(name=f"disc_{i}", **kw)
            r, fmap_r = d(y)
            g, fmap_g = d(y_hat)
            rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
        return rs, gs, fr, fg


# ---- GAN losses (models.py:287-313) ----


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
