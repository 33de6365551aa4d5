"""Fused self-attention Pallas kernel vs the XLA reference path.

CPU tier runs the kernel in Pallas interpret mode (dropout_p=0 only — the
TPU PRNG primitives have no interpret lowering in this JAX version); the
dropout path is exercised on the real chip by `scripts/verify_fused_attn.py`
and covered here by a TPU-gated test that auto-skips on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_speech.ops.fused_attention import (
    MAX_T,
    fused_attention_supported,
    fused_self_attention,
)


def _xla_attention(q, k, v, mask):
    s = jnp.einsum("bthd,bshd->bhts", q, k)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], -1e9, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def _inputs(rng, b=2, t=24, h=4, d=16):
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, t)) < 0.3)
    return q, k, v, mask


def test_forward_matches_xla(rng):
    q, k, v, mask = _inputs(rng)
    out = fused_self_attention(q, k, v, mask, interpret=True)
    ref = _xla_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_no_mask(rng):
    q, k, v, _ = _inputs(rng)
    out = fused_self_attention(q, k, v, None, interpret=True)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_xla(rng):
    q, k, v, mask = _inputs(rng)

    def loss_fused(q, k, v):
        return jnp.sum(fused_self_attention(q, k, v, mask, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, mask) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=max(1e-5, 1e-4 * scale)
        )


def test_fully_padded_rows_finite(rng):
    # a fully padded batch element must produce finite outputs/grads
    q, k, v, _ = _inputs(rng)
    mask = jnp.ones((q.shape[0], q.shape[1]), dtype=bool)
    out = fused_self_attention(q, k, v, mask, interpret=True)
    assert bool(jnp.isfinite(out).all())
    g = jax.grad(
        lambda q: jnp.sum(fused_self_attention(q, k, v, mask, interpret=True))
    )(q)
    assert bool(jnp.isfinite(g).all())


def test_supported_gate():
    assert not fused_attention_supported(64, backend="cpu")
    assert fused_attention_supported(64, backend="tpu")
    assert not fused_attention_supported(MAX_T + 1, backend="tpu")


def test_dropout_requires_seed(rng):
    q, k, v, _ = _inputs(rng)
    with pytest.raises(ValueError):
        fused_self_attention(q, k, v, None, dropout_p=0.1, interpret=True)


def test_module_fused_path_matches_xla_path(rng):
    # the flax module's fused flag must not change the param tree, and the
    # fused (interpret) eval-mode output must match the XLA path exactly
    from tpu_speech.models.spiral.wav2vec import MultiheadSelfAttention

    x = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 16)) < 0.3)
    m_x = MultiheadSelfAttention(embed_dim=32, num_heads=4, fused=False)
    p = m_x.init(jax.random.PRNGKey(0), x)
    out_x = m_x.apply(p, x, key_padding_mask=mask)
    m_f = MultiheadSelfAttention(
        embed_dim=32, num_heads=4, fused=True, fused_interpret=True
    )
    out_f = m_f.apply(p, x, key_padding_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), atol=1e-5
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU PRNG dropout needs a real chip"
)
def test_dropout_on_chip(rng):
    q, k, v, _ = _inputs(rng, t=120, d=64)
    seed = jnp.int32(1234)
    f = jax.jit(
        lambda q: fused_self_attention(
            q, k, v, None, dropout_p=0.1, dropout_seed=seed
        )
    )
    out = f(q)
    base = jax.jit(lambda q: fused_self_attention(q, k, v, None))(q)
    assert float(jnp.abs(out - base).max()) > 1e-3
    g = jax.jit(
        jax.grad(
            lambda q: jnp.sum(
                fused_self_attention(
                    q, k, v, None, dropout_p=0.1, dropout_seed=seed
                )
                ** 2
            )
        )
    )
    assert float(jnp.abs(g(q) - g(q)).max()) == 0.0


# ---- merged-qkv plane kernel (round 4) ----

def _qkv_inputs(rng, b=2, t=24, h=4, d=16):
    e = h * d
    qkv = jnp.asarray(rng.normal(size=(b, t, 3 * e)), jnp.float32)
    mask = jnp.asarray(rng.random((b, t)) < 0.3)
    return qkv, mask, h, d


def _xla_qkv_attention(qkv, n_heads, mask):
    b, t, e3 = qkv.shape
    e = e3 // 3
    d = e // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, t, n_heads, d)
    kh = k.reshape(b, t, n_heads, d)
    vh = v.reshape(b, t, n_heads, d)
    return _xla_attention(qh, kh, vh, mask).reshape(b, t, e)


def test_qkv_forward_matches_xla(rng):
    from tpu_speech.ops.fused_attention import fused_qkv_self_attention

    qkv, mask, h, d = _qkv_inputs(rng)
    out = fused_qkv_self_attention(qkv, h, mask, interpret=True)
    ref = _xla_qkv_attention(qkv, h, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_qkv_gradients_match_xla(rng):
    from tpu_speech.ops.fused_attention import fused_qkv_self_attention

    qkv, mask, h, d = _qkv_inputs(rng)

    def f_fused(qkv):
        return jnp.sum(
            fused_qkv_self_attention(qkv, h, mask, interpret=True) ** 2)

    def f_ref(qkv):
        return jnp.sum(_xla_qkv_attention(qkv, h, mask) ** 2)

    g1 = jax.grad(f_fused)(qkv)
    g2 = jax.grad(f_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-5, rtol=5e-5)


def test_qkv_matches_per_head_kernel(rng):
    """The merged-plane kernel must equal the (B,T,H,D) kernel exactly
    (same math, different data layout)."""
    from tpu_speech.ops.fused_attention import fused_qkv_self_attention

    qkv, mask, h, d = _qkv_inputs(rng)
    b, t, e3 = qkv.shape
    e = e3 // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out_old = fused_self_attention(
        q.reshape(b, t, h, d), k.reshape(b, t, h, d),
        v.reshape(b, t, h, d), mask, interpret=True,
    ).reshape(b, t, e)
    out_new = fused_qkv_self_attention(qkv, h, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old),
                               atol=1e-6, rtol=1e-6)
