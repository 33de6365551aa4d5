"""Jasper conv-ASR encoder + conformer rel-pos attention smoke/shape tests."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_speech.models.spiral.jasper import (
    ConvASREncoder,
    JasperBlock,
    JasperBlockCfg,
)
from tpu_speech.nn.conformer_attention import (
    RelPositionMultiHeadAttention,
    rel_positional_encoding,
)


def test_jasper_block_shapes(rng):
    cfg = JasperBlockCfg(filters=32, kernel_size=7, repeat=2, stride=2,
                         residual=False)
    blk = JasperBlock(cfg)
    x = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
    lens = jnp.array([40, 30])
    variables = blk.init({"params": jax.random.PRNGKey(0)}, x, lens, train=False)
    y, out_lens = blk.apply(variables, x, lens, train=False)
    assert y.shape == (2, 20, 32)
    assert list(np.asarray(out_lens)) == [20, 15]


def test_jasper_encoder_stack(rng):
    enc = ConvASREncoder((
        JasperBlockCfg(24, 7, 2, 1, separable=True),
        JasperBlockCfg(32, 7, 2, 1),
    ))
    x = jnp.asarray(rng.standard_normal((2, 30, 16)).astype(np.float32))
    lens = jnp.array([30, 25])
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, lens, train=False)
    y, out_lens = enc.apply(variables, x, lens, train=False)
    assert y.shape == (2, 30, 32)
    # train mode updates BN stats
    y2, new_state = enc.apply(
        variables, x, lens, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert "batch_stats" in new_state


def test_rel_positional_encoding():
    pe = rel_positional_encoding(5, 8)
    assert pe.shape == (9, 8)
    # center row (offset 0) is sin(0)=0 / cos(0)=1 pattern
    np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-6)


def test_rel_pos_attention(rng):
    attn = RelPositionMultiHeadAttention(n_head=4, n_feat=16)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    mask = np.zeros((2, 10, 10), dtype=bool)
    mask[1, :, 7:] = True  # mask keys beyond length 7 for sample 1
    variables = attn.init(
        {"params": jax.random.PRNGKey(0)}, x, x, x, jnp.asarray(mask),
        train=False,
    )
    y = attn.apply(variables, x, x, x, jnp.asarray(mask), train=False)
    assert y.shape == (2, 10, 16)
    assert np.isfinite(np.asarray(y)).all()
    # translation equivariance of the rel-pos machinery: without mask, a
    # shifted input produces a (roughly) shifted output in the interior
    y_free = attn.apply(variables, x, x, x, None, train=False)
    assert np.isfinite(np.asarray(y_free)).all()


def test_jasper_activation_registry():
    """jasper_activations registry parity (reference parts/jasper.py:24)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_speech.models.spiral.jasper import ACTIVATIONS

    assert set(ACTIVATIONS) == {"relu", "hardtanh", "selu", "swish"}
    x = jnp.linspace(-3.0, 3.0, 7)
    np.testing.assert_allclose(ACTIVATIONS["hardtanh"](x),
                               np.clip(np.asarray(x), -1, 1))
    np.testing.assert_allclose(ACTIVATIONS["swish"](x),
                               np.asarray(x) / (1 + np.exp(-np.asarray(x))),
                               rtol=1e-6)

    cfg = JasperBlockCfg(filters=8, kernel_size=3, repeat=1, stride=1,
                         residual=False, activation="swish", dropout=0.0)
    block = JasperBlock(cfg)
    xb = jnp.ones((2, 16, 4))
    lens = jnp.array([16, 12])
    params = block.init(jax.random.PRNGKey(0), xb, lens)
    out, _ = block.apply(params, xb, lens)
    assert out.shape == (2, 16, 8)
