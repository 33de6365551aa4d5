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

    Expressed as the transposed convolution identity: dilate the input by the
    stride, pad by (k-1-p), correlate with the spatially flipped kernel.
    """
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0)
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
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


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
) -> jnp.ndarray:
    """Torch ConvTranspose2d geometry, channels-last, kernel (kh, kw, Cin, Cout)."""
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = _pair(padding)
    sh, sw = _pair(stride)
    w_flip = jnp.flip(w, axis=(0, 1))
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
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
