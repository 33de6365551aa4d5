"""wav2vec 2.0 model family tests (reference wav2vec_model.py / Wav2VecLoss):
conv extractor parity vs a torch twin, length bookkeeping, grad scaling,
and an end-to-end pretrain step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpu_speech.models.spiral.encoder import TransformerCfg
from tpu_speech.models.spiral.wav2vec_model import (
    ConvFeatureEncoder,
    Wav2Vec2Config,
    Wav2Vec2Model,
    conv_subsampled_lens,
    grad_multiply,
    wav2vec2_base_config,
)
from tpu_speech.train.wav2vec import (
    host_time_mask,
    init_wav2vec_state,
    make_pretrain_step,
)

TINY = Wav2Vec2Config(
    conv_layers=((8, 4, 2), (8, 3, 2)),
    encoder=TransformerCfg(
        encoder_layers=1, embedding_dim=16, ffn_embedding_dim=32,
        num_attention_heads=2, dropout=0.0, attention_dropout=0.0,
        encoder_layerdrop=0.0, conv_pos=8, conv_pos_groups=4,
        layer_norm_first=False,
    ),
    dropout_input=0.0, dropout_features=0.0,
    final_dim=12, n_negatives=4, feature_grad_mult=1.0,
    latent_vars=6, latent_groups=2,
    mask_prob=0.5, mask_length=2,
)


def test_conv_subsampled_lens_formula():
    cfg = TINY
    lens = conv_subsampled_lens(cfg, jnp.array([64, 40, 7]))
    # layer1: (L-4)//2+1 ; layer2: (L-3)//2+1
    def ref(n):
        n = (n - 4) // 2 + 1
        n = (n - 3) // 2 + 1
        return max(n, 0)
    assert list(np.asarray(lens)) == [ref(64), ref(40), ref(7)]


def test_conv_feature_encoder_torch_parity(rng):
    torch = pytest.importorskip("torch")
    cfg = Wav2Vec2Config(conv_layers=((6, 4, 2), (6, 3, 2)),
                         extractor_mode="default", conv_bias=False)
    enc = ConvFeatureEncoder(cfg)
    wavs = rng.standard_normal((2, 50)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(wavs))

    # torch twin (fairseq extractor: Conv1d -> GroupNorm(d, d) on 1st -> gelu)
    conv0 = torch.nn.Conv1d(1, 6, 4, 2, bias=False)
    gn = torch.nn.GroupNorm(6, 6)
    conv1 = torch.nn.Conv1d(6, 6, 3, 2, bias=False)
    with torch.no_grad():
        # flax (k, in, out) -> torch (out, in, k)
        conv0.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["params"]["conv_0"]["kernel"]), (2, 1, 0))))
        conv1.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["params"]["conv_1"]["kernel"]), (2, 1, 0))))
        gn.weight.copy_(torch.from_numpy(
            np.asarray(params["params"]["gn_0"]["scale"])))
        gn.bias.copy_(torch.from_numpy(
            np.asarray(params["params"]["gn_0"]["bias"])))
        xt = torch.from_numpy(wavs).unsqueeze(1)
        yt = torch.nn.functional.gelu(gn(conv0(xt)))
        yt = torch.nn.functional.gelu(conv1(yt))
    yj = enc.apply(params, jnp.asarray(wavs))
    np.testing.assert_allclose(
        np.asarray(yj), yt.permute(0, 2, 1).numpy(), atol=2e-5
    )


def test_grad_multiply():
    g = jax.grad(lambda x: jnp.sum(grad_multiply(x, 0.25) ** 2))(
        jnp.ones((3,))
    )
    np.testing.assert_allclose(np.asarray(g), 0.25 * 2.0 * np.ones(3))


def test_wav2vec_pretrain_step(rng):
    model = Wav2Vec2Model(TINY)
    tx = optax.adamw(1e-3)
    b, s = 2, 200
    state = init_wav2vec_state(model, jax.random.PRNGKey(0), (b, s), tx)
    wavs = rng.standard_normal((b, s)).astype(np.float32)
    lens = np.array([s, s - 40], dtype=np.int32)
    t = int(conv_subsampled_lens(TINY, jnp.array([s]))[0])
    mask = host_time_mask(TINY, lens, t, rng=np.random.default_rng(0))
    assert mask.shape == (b, t) and mask.any()

    step = make_pretrain_step(model, TINY, tx, grad_clip=1.0)
    p0 = jax.device_get(
        state.params["params"]["final_proj"]["kernel"]
    ).copy()
    for i in range(2):
        state, metrics = step(
            state, jnp.asarray(wavs), jnp.asarray(lens), jnp.asarray(mask),
            jax.random.PRNGKey(i),
        )
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"]) and np.isfinite(m["contrastive_loss"])
    assert 0.0 <= float(m["accuracy"]) <= 1.0
    assert float(m["prob_ppl"]) > 0  # codebook in use
    p1 = jax.device_get(state.params["params"]["final_proj"]["kernel"])
    assert not np.allclose(p0, p1)
    assert int(jax.device_get(state.step)) == 2


def test_wav2vec_features_only(rng):
    model = Wav2Vec2Model(TINY)
    wavs = jnp.asarray(rng.standard_normal((2, 120)).astype(np.float32))
    lens = jnp.array([120, 80], dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "gumbel": jax.random.PRNGKey(2)}, wavs, lens,
    )
    ctx, feat_lens = model.apply(
        params, wavs, lens, method=Wav2Vec2Model.extract_features,
    )
    assert ctx.shape[0] == 2 and ctx.shape[2] == TINY.encoder.embedding_dim
    assert int(feat_lens[0]) > int(feat_lens[1]) > 0


def test_base_config_matches_reference_recipe():
    cfg = wav2vec2_base_config()
    # wav2vec_config.py:116 — 320x subsample over 7 conv layers
    assert cfg.conv_layers == (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2),
    )
    assert cfg.encoder.encoder_layers == 12
    assert cfg.encoder.embedding_dim == 768
    assert cfg.latent_vars == 320 and cfg.latent_groups == 2
    assert cfg.mask_prob == 0.65 and cfg.mask_length == 10
    assert cfg.logit_temp == 0.1 and cfg.final_dim == 256


def test_wav2vec_ctc_finetune(rng):
    """Wav2Vec2CTCModel (the reference's wav2vec CTC wrapper): pretrained
    encoder grafts in, CTC loss optimizes, frozen-encoder gate works."""
    import optax

    from tpu_speech.models.spiral.ctc import ctc_loss
    from tpu_speech.models.spiral.wav2vec_model import (
        Wav2Vec2CTCModel,
        Wav2Vec2Model,
        load_wav2vec_pretrained_encoder,
    )

    b, s = 2, 200
    wavs = jnp.asarray(rng.standard_normal((b, s)).astype(np.float32))
    lens = jnp.array([s, s - 40], dtype=jnp.int32)

    # pretrain params to graft
    pre = Wav2Vec2Model(TINY).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "gumbel": jax.random.PRNGKey(2)}, wavs, lens,
    )["params"]

    model = Wav2Vec2CTCModel(TINY, num_classes=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        wavs, lens,
    )
    params = load_wav2vec_pretrained_encoder(variables["params"], pre)
    # encoder weights really came from the pretrain tree
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["mask_emb"]),
        np.asarray(pre["mask_emb"]),
    )
    assert "quantizer" not in params["encoder"]

    labels = jnp.asarray(rng.integers(0, 5, size=(b, 4)).astype(np.int32))
    label_lens = jnp.array([4, 3], dtype=jnp.int32)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def step(params, opt_state, freeze):
        def loss_fn(p):
            lp, ol = model.apply(
                {"params": p}, wavs, lens, train=False,
                freeze_encoder=freeze,
            )
            return ctc_loss(lp, ol, labels, label_lens, model.blank_idx)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    # frozen: encoder gradient must be exactly zero
    _, _, loss0, grads = step(params, opt_state, True)
    enc_gnorm = optax.global_norm(grads["encoder"])
    assert float(enc_gnorm) == 0.0
    assert np.isfinite(float(loss0))

    # unfrozen: loss decreases on the fixed batch
    p, o = params, opt_state
    losses = []
    for _ in range(4):
        p, o, loss, _ = step(p, o, False)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
