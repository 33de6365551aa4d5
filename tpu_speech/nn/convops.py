"""Functional convolution primitives with torch-compatible geometry.

All operate channels-last ((B, T, C) / (B, H, W, C)) with explicit symmetric
padding so outputs align sample-for-sample with the reference's
torch.nn.Conv{1,2}d / ConvTranspose{1,2}d — XLA's 'SAME' padding places the
extra pad element differently for strided convs, so parity requires explicit
pads. Weights use JAX layout: (spatial..., in, out) for conv and transposed
conv alike (converters transpose from torch layouts).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """(B, T, Cin) * (k, Cin/groups, Cout) -> (B, T', Cout), torch geometry."""
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
) -> jnp.ndarray:
    """(B, H, W, Cin) * (kh, kw, Cin, Cout) -> (B, H', W', Cout), torch geometry."""
    ph, pw = _pair(padding)
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=_pair(stride),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=_pair(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Torch ConvTranspose1d: (B, T, Cin) * (k, Cin, Cout) -> (B, (T-1)*s - 2p + k, Cout).

    When the kernel is a multiple of the stride (every HiFi-GAN upsampler:
    16/8, 4/2) the transposed conv is computed as a SUBPIXEL conv — a dense
    kernel-(k/s) conv at the LOW rate producing s*Cout channels, then a
    depth-to-space interleave. Exact same arithmetic per output sample
    (out[q*s + r] = sum_i x[q-i] . W[r + i*s]), but the MXU sees a dense
    matmul instead of an input-dilated window that is (s-1)/s zeros.

    Otherwise falls back to the transposed-convolution identity: dilate the
    input by the stride, pad by (k-1-p), correlate with the flipped kernel.
    """
    k = w.shape[0]
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    if stride > 1 and k % stride == 0:
        return _conv_transpose1d_subpixel(x, w, b, stride, padding)
    w_flip = jnp.flip(w, axis=0)
    y = lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        y = y + b
    return y


def _conv_transpose1d_subpixel(x, w, b, stride: int, padding: int):
    """Subpixel formulation of ConvTranspose1d for k % s == 0.

    With m = o + padding, q = m // s, r = m % s, the transposed conv is
    out[m] = sum_{i<k/s} x[q - i] . W[r + i*s]; i.e. per low-rate position q
    a dense conv with c = k/s taps emitting all s phases at once.
    """
    k, cin, cout = w.shape
    s, c = stride, w.shape[0] // stride
    B, T, _ = x.shape
    # K[j, :, r*Cout+co] = W[r + (c-1-j)*s, :, co]  (tap flip for lax.conv)
    kbig = jnp.flip(w.reshape(c, s, cin, cout), axis=0)
    kbig = kbig.transpose(0, 2, 1, 3).reshape(c, cin, s * cout)
    y = lax.conv_general_dilated(
        x,
        kbig,
        window_strides=(1,),
        padding=[(c - 1, c - 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, T + c - 1, s*Cout); row q holds phases m = q*s + r
    y = y.reshape(B, (T + c - 1) * s, cout)
    out_len = (T - 1) * s - 2 * padding + k
    y = lax.slice_in_dim(y, padding, padding + out_len, axis=1)
    if b is not None:
        y = y + b
    return y


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
) -> jnp.ndarray:
    """Torch ConvTranspose2d geometry, channels-last, kernel (kh, kw, Cin, Cout).

    Like conv_transpose1d, strides that divide their kernel dim run as a
    SUBPIXEL conv (dense low-rate conv emitting sh*sw*Cout channels + a
    depth-to-space interleave) instead of an input-dilated window that is
    mostly zeros — e.g. the U-Net Upsample (k=4, s=2) does 4 dense taps
    instead of 16 taps over a 3/4-zero input.
    """
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = _pair(padding)
    sh, sw = _pair(stride)
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    if (sh > 1 or sw > 1) and kh % sh == 0 and kw % sw == 0:
        return _conv_transpose2d_subpixel(x, w, b, (sh, sw), (ph, pw))
    w_flip = jnp.flip(w, axis=(0, 1))
    y = lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b
    return y


def _conv_transpose2d_subpixel(x, w, b, stride, padding):
    """Subpixel ConvTranspose2d for kh % sh == 0 and kw % sw == 0.

    Per low-rate position (qh, qw) a dense (ch, cw)-tap conv emits all
    sh*sw phases at once:
    out[mh, mw] = sum_{i<ch, j<cw} x[qh-i, qw-j] . W[rh + i*sh, rw + j*sw]
    with m = q*s + r; then depth-to-space and crop by the torch padding.
    """
    kh, kw, cin, cout = w.shape
    sh, sw = stride
    ph, pw = padding
    ch, cw = kh // sh, kw // sw
    B, H, W, _ = x.shape
    # K[i', j', :, (rh, rw, co)] = W[rh + (ch-1-i')*sh, rw + (cw-1-j')*sw]
    kbig = w.reshape(ch, sh, cw, sw, cin, cout)
    kbig = jnp.flip(kbig, axis=(0, 2))
    # -> (ch, cw, cin, sh, sw, cout) -> (ch, cw, cin, sh*sw*cout)
    kbig = kbig.transpose(0, 2, 4, 1, 3, 5).reshape(
        ch, cw, cin, sh * sw * cout
    )
    y = lax.conv_general_dilated(
        x,
        kbig,
        window_strides=(1, 1),
        padding=[(ch - 1, ch - 1), (cw - 1, cw - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+ch-1, W+cw-1, sh*sw*cout)
    Hq, Wq = H + ch - 1, W + cw - 1
    y = y.reshape(B, Hq, Wq, sh, sw, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hq * sh, Wq * sw, cout)
    out_h = (H - 1) * sh - 2 * ph + kh
    out_w = (W - 1) * sw - 2 * pw + kw
    y = lax.slice(
        y, (0, ph, pw, 0), (B, ph + out_h, pw + out_w, cout)
    )
    if b is not None:
        y = y + b
    return y
