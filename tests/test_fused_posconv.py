"""Fused grouped pos-conv Pallas kernel == lax.conv_general_dilated.

Forward and gradient parity on CPU interpret mode, over the production
shape family (Cg 32/48, SAME-even and causal padding, f32/bf16) — the
numerics contract the kernel must hold to replace the XLA grouped conv in
models/spiral/wav2vec.py::PositionalConv.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from tpu_speech.ops.fused_posconv import grouped_conv1d


def lax_ref(x, w, groups, left_pad, k):
    pr = k - 1 - left_pad
    return lax.conv_general_dilated(
        x, w, (1,), [(left_pad, pr)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


@pytest.mark.parametrize("b,t,c,g,k,causal", [
    (2, 24, 64, 4, 16, False),
    (2, 24, 64, 4, 16, True),
    (1, 40, 96, 2, 16, False),
    (3, 17, 64, 4, 8, False),   # T not a multiple of 8
])
def test_fused_posconv_fwd_parity(rng, b, t, c, g, k, causal):
    cg = c // g
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((k, cg, c)) * 0.1).astype(np.float32))
    left = (k - 1) if causal else (k // 2)
    got = grouped_conv1d(x, w, g, left, True)
    ref = lax_ref(x, w, g, left, k)
    assert got.shape == (b, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_posconv_matches_lax_same_even_trim(rng):
    """left_pad=K//2 reproduces the lax (K//2, K//2) SAME-even pad with the
    trailing frame trimmed — the PositionalConv convention (wav2vec.py)."""
    b, t, c, g, k = 2, 20, 64, 4, 16
    cg = c // g
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((k, cg, c)) * 0.1).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (1,), [(k // 2, k // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=g,
    )[:, :-1]
    got = grouped_conv1d(x, w, g, k // 2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_posconv_grad_parity(rng, causal):
    b, t, c, g, k = 2, 24, 64, 4, 16
    cg = c // g
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((k, cg, c)) * 0.1).astype(np.float32))
    left = (k - 1) if causal else (k // 2)
    cot = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))

    def loss_fused(x, w):
        return jnp.sum(grouped_conv1d(x, w, g, left, True) * cot)

    def loss_ref(x, w):
        return jnp.sum(lax_ref(x, w, g, left, k) * cot)

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               atol=2e-4, rtol=1e-4)


def test_fused_posconv_bf16(rng):
    b, t, c, g, k = 2, 24, 64, 4, 16
    cg = c // g
    x32 = rng.standard_normal((b, t, c)).astype(np.float32)
    w32 = (rng.standard_normal((k, cg, c)) * 0.1).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    w = jnp.asarray(w32, jnp.bfloat16)
    got = grouped_conv1d(x, w, g, k // 2, True)
    assert got.dtype == jnp.bfloat16
    ref = lax_ref(jnp.asarray(x32), jnp.asarray(w32), g, k // 2, k)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.15, rtol=0.1)
