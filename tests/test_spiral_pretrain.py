"""SPIRAL pretraining stack tests: featurizer, feature encoder, masking,
teacher shift, negatives, contrastive loss, full jitted pretrain step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpu_speech.models.spiral.encoder import (
    ConvLayerCfg,
    ConvTransformerBlockCfg,
    FeatureEncoder,
    TransformerCfg,
)
from tpu_speech.models.spiral.features import filterbank_features
from tpu_speech.models.spiral.masking import (
    apply_mask,
    compute_mask_indices,
    gaussian_mask_emb,
    make_student_masks,
)
from tpu_speech.models.spiral.st2vec import (
    ST2VecConfig,
    ST2VecEncoder,
    check_collapse,
    contrastive_loss,
    sample_negatives,
    teacher_shift,
)
from tpu_speech.train.spiral import (
    host_augment_batch,
    init_spiral_state,
    make_pretrain_step,
)

TINY_BLOCKS = (
    ConvTransformerBlockCfg(
        conv_layers=(
            ConvLayerCfg(24, (5,), (2,), "ln", "relu", 0.0),
            ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),
        ),
        transformer=TransformerCfg(1, 32, 64, 4, 0.0, conv_pos=8, conv_pos_groups=4),
    ),
    ConvTransformerBlockCfg(
        conv_layers=(ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),),
        transformer=TransformerCfg(1, 32, 64, 4, 0.0, conv_pos=8, conv_pos_groups=4),
    ),
)

TINY_CFG = ST2VecConfig(
    blocks=TINY_BLOCKS,
    num_features=16,
    projector_dim=16,
    predictor_convs=(ConvLayerCfg(16, (3,), (1,), "bn", "relu", 0.0, bias=None),),
    n_negatives=4,
    max_shift=2,
    shift_unit=8,
    target_momentum_steps=100,
)


def test_filterbank_features_shapes(rng):
    wavs = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    lens = np.array([16000, 12000], dtype=np.int32)
    feats, feat_lens = filterbank_features(jnp.asarray(wavs), jnp.asarray(lens))
    assert feats.shape[2] == 128
    assert feats.shape[1] % 16 == 0
    assert int(feat_lens[0]) == 100 and int(feat_lens[1]) == 75
    # per-feature normalization: valid frames ~zero mean, unit std
    valid = np.asarray(feats[0, :100])
    assert abs(valid.mean()) < 0.05
    assert abs(valid.std() - 1.0) < 0.1


def test_feature_encoder_subsampling(rng):
    enc = FeatureEncoder(TINY_BLOCKS)
    assert enc.subsample_factor == 8
    x = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    lens = jnp.array([64, 48])
    params = enc.init({"params": jax.random.PRNGKey(0)}, x, lens, train=False)
    y, out_lens = enc.apply(params, x, lens, train=False)
    assert y.shape == (2, 8, 32)
    assert list(np.asarray(out_lens)) == [8, 6]


def test_compute_mask_indices_basic():
    rng = np.random.default_rng(0)
    mask, num = compute_mask_indices(
        (4, 100), np.array([100, 80, 60, 100]), 0.5, 10, min_masks=2, rng=rng,
        shrink_to_batch_min=False,
    )
    assert mask.shape == (4, 100)
    assert (mask.sum(1) > 0).all()
    # masks never exceed valid lengths
    assert not mask[1, 80:].any()
    assert not mask[2, 60:].any()


def test_apply_mask_device(rng):
    specs = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    tm, cm = make_student_masks(
        2, 32, 16, np.array([32, 24]), rng=np.random.default_rng(0)
    )
    emb = jnp.asarray(gaussian_mask_emb(16))
    out = apply_mask(specs, jnp.asarray(tm), jnp.asarray(cm), emb)
    t_idx = np.argwhere(tm)[0]
    got = np.asarray(out[t_idx[0], t_idx[1]])
    want = np.where(cm[t_idx[0]], 0.0, np.asarray(emb))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_teacher_shift_geometry(rng):
    specs = jnp.asarray(rng.standard_normal((2, 32, 4)).astype(np.float32))
    lens = jnp.array([32, 24])
    emb = jnp.zeros((4,)) + 7.0
    buf, new_lens = teacher_shift(specs, lens, jnp.int32(1), jnp.int32(2), 8, 2, emb)
    assert buf.shape == (2, 32 + 32, 4)
    assert list(np.asarray(new_lens)) == [32 + 24, 24 + 24]
    np.testing.assert_allclose(np.asarray(buf[0, :8]), 7.0)  # left fill
    np.testing.assert_allclose(np.asarray(buf[0, 8:40]), np.asarray(specs[0]))
    np.testing.assert_allclose(np.asarray(buf[0, 40:56]), 7.0)  # right fill
    np.testing.assert_allclose(np.asarray(buf[1, 32:48]), 7.0)  # sample 1 right fill


def test_sample_negatives_excludes_self(rng):
    feats = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    lens = jnp.array([10, 6])
    negs = sample_negatives(jax.random.PRNGKey(0), feats, lens, 8)
    assert negs.shape == (8, 2, 10, 4)
    # no negative equals the anchor frame itself (within valid range)
    negs_np = np.asarray(negs)
    feats_np = np.asarray(feats)
    for b in range(2):
        for t in range(int(lens[b])):
            for n in range(8):
                assert not np.array_equal(negs_np[n, b, t], feats_np[b, t])


def test_contrastive_loss_prefers_match(rng):
    b, t, d, n = 2, 6, 8, 4
    target = rng.standard_normal((b, t, d)).astype(np.float32)
    negs = rng.standard_normal((n, b, t, d)).astype(np.float32)
    valid = np.ones((b, t), dtype=np.float32)
    loss_good, acc_good = contrastive_loss(
        jnp.asarray(target), jnp.asarray(target), jnp.asarray(negs),
        jnp.asarray(valid), 0.3,
    )
    loss_bad, _ = contrastive_loss(
        jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32)),
        jnp.asarray(target), jnp.asarray(negs), jnp.asarray(valid), 0.3,
    )
    assert float(loss_good) < float(loss_bad)
    assert float(acc_good) == 1.0


def test_check_collapse_detects_collapse(rng):
    b, t, d = 2, 12, 8
    lens = jnp.array([12, 9])
    # collapsed: every frame the same vector -> off-diagonal self-sim ~ 1
    one = rng.standard_normal((1, 1, d)).astype(np.float32)
    collapsed = jnp.asarray(np.tile(one, (b, t, 1)))
    healthy = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    diag_c = jax.jit(check_collapse)(collapsed, healthy, lens)
    diag_h = jax.jit(check_collapse)(healthy, healthy, lens)
    assert float(diag_c["self_sim"]) > 0.99
    assert abs(float(diag_h["self_sim"])) < 0.5
    # pred == target -> per-frame similarity is exactly 1
    assert float(diag_h["pred_target_sim"]) > 0.999
    assert set(diag_h) == {
        "self_sim", "target_self_sim", "pred_target_sim", "cross_utt_sim",
    }


def test_pretrain_step_end_to_end(rng):
    model = ST2VecEncoder(TINY_CFG)
    tx = optax.adamw(1e-3)
    b, n_samples = 2, 16000
    hop = 160
    spec_len = 112  # ceil(16000/160)=100 -> pad16 -> 112
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (b, spec_len, TINY_CFG.num_features), tx
    )
    step = make_pretrain_step(model, TINY_CFG, tx)

    wavs = rng.standard_normal((b, n_samples)).astype(np.float32) * 0.1
    lens = np.array([n_samples, 12000], dtype=np.int32)
    batch = host_augment_batch(
        TINY_CFG, wavs, lens, wavs + 0.01, lens, spec_len,
        np.random.default_rng(0),
    )
    t0 = jax.device_get(state.teacher["projector"])
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"]), m
    assert 0.0 <= float(m["accuracy"]) <= 1.0
    assert 0.9 < float(m["momentum"]) <= 1.0
    # teacher moved toward student (EMA applied)
    t1 = jax.device_get(state.teacher["projector"])
    diffs = [
        np.abs(a - b_).max()
        for a, b_ in zip(jax.tree.leaves(t0), jax.tree.leaves(t1))
    ]
    assert max(diffs) > 0
    assert int(jax.device_get(state.step)) == 2


@pytest.mark.slow
def test_pretrain_step_bf16(rng):
    import optax

    model = ST2VecEncoder(TINY_CFG)
    tx = optax.adamw(1e-3)
    b, spec_len = 2, 112
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (b, spec_len, TINY_CFG.num_features), tx
    )
    step = make_pretrain_step(model, TINY_CFG, tx, bf16=True)
    wavs = rng.standard_normal((b, 16000)).astype(np.float32) * 0.1
    lens = np.array([16000, 12000], dtype=np.int32)
    batch = host_augment_batch(
        TINY_CFG, wavs, lens, wavs + 0.01, lens, spec_len,
        np.random.default_rng(0),
    )
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # params stay fp32 (mixed precision: compute-only bf16)
    assert all(
        p.dtype == np.float32
        for p in jax.tree.leaves(jax.device_get(state.params))
        if np.issubdtype(p.dtype, np.floating)
    )
