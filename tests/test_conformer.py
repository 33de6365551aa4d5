"""Conformer-CTC encoder family (models/spiral/conformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpu_speech.models.spiral.conformer import ConformerCTCModel, ConformerConfig

CFG = ConformerConfig(
    num_classes=8, d_model=32, n_heads=2, n_layers=2, ff_expansion=2,
    conv_kernel=7, subsampling_filters=16, n_mels=16, dropout=0.0,
)


def _init(model, b=2, t=64):
    specs = jnp.zeros((b, t, CFG.n_mels))
    lens = jnp.full((b,), t, dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        specs, lens, train=False,
    )
    return variables


def test_shapes_and_lengths():
    model = ConformerCTCModel(CFG)
    variables = _init(model)
    specs = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, CFG.n_mels)),
        dtype=jnp.float32,
    )
    lens = jnp.array([64, 40], dtype=jnp.int32)
    log_probs, out_lens = model.apply(variables, specs, lens, train=False)
    assert log_probs.shape == (2, 16, CFG.num_classes + 1)  # 4x subsample
    assert int(out_lens[0]) == 16 and int(out_lens[1]) == 10
    # valid log-probs: logsumexp == 0
    lse = jax.scipy.special.logsumexp(log_probs, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)
    assert model.blank_idx == CFG.num_classes


def test_padding_invariance():
    """Garbage in the padded tail must not change valid-frame outputs."""
    model = ConformerCTCModel(CFG)
    variables = _init(model)
    rng = np.random.default_rng(1)
    base = rng.standard_normal((1, 64, CFG.n_mels)).astype(np.float32)
    a = base.copy()  # pads = whatever the featurizer left there
    b = base.copy()
    b[0, 40:] = 77.0  # pad garbage
    lens = jnp.array([40], dtype=jnp.int32)
    la, out_lens = model.apply(variables, jnp.asarray(a), lens, train=False)
    lb, _ = model.apply(variables, jnp.asarray(b), lens, train=False)
    v = int(out_lens[0])
    np.testing.assert_allclose(
        np.asarray(la[0, :v]), np.asarray(lb[0, :v]), atol=2e-4
    )


@pytest.mark.slow
def test_train_smoke_loss_decreases():
    from tpu_speech.models.spiral.ctc_models import (
        init_ctc_state,
        make_ctc_train_step,
    )

    model = ConformerCTCModel(CFG)
    tx = optax.adam(3e-3)
    state = init_ctc_state(model, jax.random.PRNGKey(0), (2, 64, CFG.n_mels), tx)
    rng = np.random.default_rng(0)
    batch = {
        "specs": jnp.asarray(
            rng.standard_normal((2, 64, CFG.n_mels)).astype(np.float32)
        ),
        "spec_lens": jnp.array([64, 64], dtype=jnp.int32),
        "labels": jnp.asarray(
            rng.integers(0, CFG.num_classes, (2, 6)).astype(np.int32)
        ),
        "label_lens": jnp.array([6, 4], dtype=jnp.int32),
    }
    step = make_ctc_train_step(model, tx, grad_clip=1.0)
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
