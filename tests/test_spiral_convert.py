"""SPIRAL checkpoint conversion against the GENUINE reference model.

tests/spiral_oracle.py constructs the reference torch ``ST2VecEncoder`` from
the shipped spiral_base_pretrain_ls960 experiment config (with stubs for its
unavailable deps); compat/torch_spiral.py must convert its state_dict into
trees structurally identical to ours, and the converted weights must
reproduce the reference's student/teacher forward numerically."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")

from spiral_oracle import load_st2vec_encoder  # noqa: E402

from tpu_speech.compat.torch_spiral import convert_st2vec  # noqa: E402
from tpu_speech.models.spiral.st2vec import (  # noqa: E402
    ST2VecEncoder,
    spiral_base_config,
    teacher_param_subset,
)


@pytest.fixture(scope="module")
def reference():
    enc, cfg = load_st2vec_encoder()
    enc.eval()
    return enc


@pytest.fixture(scope="module")
def converted(reference):
    return convert_st2vec(reference.state_dict())


def _paths(tree, pre=()):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _paths(tree[k], pre + (k,))
    else:
        yield pre, tuple(np.shape(tree))


def test_structure_matches_our_init(reference, converted):
    params, batch_stats, teacher = converted
    model = ST2VecEncoder(spiral_base_config())
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 128)), jnp.array([64]), train=False,
    )
    ours = dict(_paths(jax.tree.map(np.asarray, variables["params"])))
    theirs = dict(_paths(params))
    assert ours == theirs, (
        set(ours) ^ set(theirs) or
        {k: (ours[k], theirs[k]) for k in ours if ours[k] != theirs[k]}
    )
    ours_bs = dict(_paths(jax.tree.map(np.asarray, variables["batch_stats"])))
    theirs_bs = dict(_paths(batch_stats))
    assert ours_bs == theirs_bs
    # teacher mirrors feature_encoder + projector exactly
    assert dict(_paths(teacher)) == dict(
        _paths(teacher_param_subset(params))
    )


def test_student_forward_parity(reference, converted):
    """Full spiral-base student chain (feature_encoder -> projector ->
    predictor) with converted weights vs the reference torch modules."""
    params, batch_stats, _ = converted
    rng = np.random.default_rng(0)
    b, t, f = 2, 96, 128
    specs = rng.standard_normal((b, t, f)).astype(np.float32)
    lens = np.array([t, t - 24], dtype=np.int32)

    with torch.no_grad():
        xt = torch.from_numpy(specs).transpose(1, 2)  # (B, F, T)
        lt = torch.from_numpy(lens.astype(np.int64))
        feats_t, lens_t, _ = reference.feature_encoder(xt, lt)
        proj_t = reference.projector(feats_t.transpose(1, 2), lens_t)
        pred_t = reference.predictor(proj_t, lens_t)

    model = ST2VecEncoder(spiral_base_config())
    (pred_j, feat_lens), _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(specs), jnp.asarray(lens), train=False,
        method=ST2VecEncoder.encode_student, mutable=["batch_stats"],
    )
    assert list(np.asarray(feat_lens)) == list(lens_t.numpy())
    tl = int(lens_t.min())
    ref = pred_t.numpy()[:, :tl]
    out = np.asarray(pred_j)[:, :tl]
    assert np.max(np.abs(ref - out)) < 5e-4, np.max(np.abs(ref - out))


def test_teacher_forward_parity(reference, converted):
    """EMA-teacher chain (target_feature_encoder -> target_projector)."""
    params, batch_stats, teacher = converted
    rng = np.random.default_rng(1)
    b, t, f = 1, 64, 128
    specs = rng.standard_normal((b, t, f)).astype(np.float32)
    lens = np.array([t], dtype=np.int32)

    with torch.no_grad():
        xt = torch.from_numpy(specs).transpose(1, 2)
        lt = torch.from_numpy(lens.astype(np.int64))
        feats_t, lens_t, _ = reference.target_feature_encoder(xt, lt)
        proj_t = reference.target_projector(feats_t.transpose(1, 2), lens_t)

    model = ST2VecEncoder(spiral_base_config())
    full = dict(params)
    full.update(teacher)  # teacher subtree replaces student weights
    proj_j, feat_lens = model.apply(
        {"params": full, "batch_stats": batch_stats},
        jnp.asarray(specs), jnp.asarray(lens), train=False,
        method=ST2VecEncoder.encode_teacher,
    )
    tl = int(lens_t.min())
    diff = np.max(np.abs(proj_t.numpy()[:, :tl] - np.asarray(proj_j)[:, :tl]))
    assert diff < 5e-4, diff


def test_lightning_prefix_strip(reference, converted):
    """PL .ckpt layout: {'state_dict': {'st2vec_encoder.<k>': v}} converts
    to the identical trees (the CLI path, spiral_runner._load_pretrain)."""
    params, batch_stats, teacher = converted
    wrapped = {"state_dict": {
        f"st2vec_encoder.{k}": v for k, v in reference.state_dict().items()
    }}
    p2, bs2, t2 = convert_st2vec(wrapped)
    a = jax.tree.map(np.asarray, (params, batch_stats, teacher))
    b = jax.tree.map(np.asarray, (p2, bs2, t2))
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    assert all(np.array_equal(x, y) for x, y in zip(flat_a, flat_b))


def test_ctc_decoder_forward_parity():
    """Genuine reference ConvASRDecoder (finetune subword config) vs our
    decoder with converted weights."""
    from spiral_oracle import load_conv_asr_decoder

    from tpu_speech.compat.torch_spiral import convert_conv_asr_decoder
    from tpu_speech.models.spiral.ctc import ConvASRDecoder

    ref, dec_cfg = load_conv_asr_decoder("spiral_base_finetune_ls100_char")
    ref.eval()
    params, batch_stats = convert_conv_asr_decoder(ref.state_dict())

    rng = np.random.default_rng(2)
    b, t, d = 2, 40, int(dec_cfg["feat_in"])
    feats = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([t, t - 10], dtype=np.int32)
    with torch.no_grad():
        lp_t, lens_t = ref(
            torch.from_numpy(feats).transpose(1, 2),
            torch.from_numpy(lens.astype(np.int64)),
        )
    from tpu_speech.models.spiral.encoder import ConvLayerCfg

    conv_cfgs = tuple(
        ConvLayerCfg(int(c["filters"]), tuple(c["kernel_size"]),
                     tuple(c["stride"]), c["norm_type"], c["act_func"],
                     float(c["dropout"]))
        for c in dec_cfg["conv_layers"]
    )
    assert len(conv_cfgs) == 3  # the char config's decoder stack
    ours = ConvASRDecoder(
        num_classes=len(dec_cfg["vocabulary"]), blank_pos="after_vocab_last",
        conv_layers=conv_cfgs,
        upsample_rate=int(dec_cfg["proj_upsampling"]["rate"]),
        upsample_filters=int(dec_cfg["proj_upsampling"]["filters"]),
        upsample_norm=dec_cfg["proj_upsampling"]["norm_type"],
        upsample_act=dec_cfg["proj_upsampling"]["act_func"],
        upsample_dropout=float(dec_cfg["proj_upsampling"]["dropout"]),
    )
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    lp_j, lens_j = ours.apply(variables, jnp.asarray(feats), jnp.asarray(lens))
    assert ours.blank_idx == ref.blank_idx
    assert ours.num_classes_with_blank == ref.num_classes_with_blank
    assert list(np.asarray(lens_j)) == list(lens_t.numpy())
    tl = int(lens_t.min())
    diff = np.max(np.abs(lp_t.numpy()[:, :tl] - np.asarray(lp_j)[:, :tl]))
    assert diff < 2e-5, diff


def test_convert_ctc_finetune_checkpoint(reference):
    """Full finetuned-model checkpoint layout ({'encoder.*', 'decoder.*'})
    splits and converts both halves."""
    from spiral_oracle import load_conv_asr_decoder

    from tpu_speech.compat.torch_spiral import convert_ctc_finetune

    dec, _ = load_conv_asr_decoder("spiral_base_finetune_ls100_char")
    # the finetune model drops the pretraining-only modules
    # (st2vec_model.py:318-327) before saving
    enc_sd = {k: v for k, v in reference.state_dict().items()
              if not k.startswith(("target_", "predictor.", "projector."))}
    sd = {"state_dict": {}}
    sd["state_dict"].update(
        {f"encoder.{k}": v for k, v in enc_sd.items()}
    )
    sd["state_dict"].update(
        {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    )
    (enc_params, enc_bs, teacher), (dec_params, dec_bs) = (
        convert_ctc_finetune(sd)
    )
    assert "feature_encoder" in enc_params and not teacher
    assert "decoder_proj" in dec_params


def test_genuine_featurizer_parity(reference):
    """The genuine reference wav2spec (AudioToMelSpectrogramPreprocessor ->
    FilterbankFeatures, features.py:228-455) vs our wav_to_spec on the same
    waveforms: dither off (eval), preemph + STFT + mel + log + per-feature
    norm + pad-to-16."""
    from tpu_speech.models.spiral.st2vec import spiral_base_config, wav_to_spec

    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    lens = np.array([32000, 24000], dtype=np.int32)
    with torch.no_grad():
        feats_t, lens_t = reference.wav2spec(
            input_signal=torch.from_numpy(wavs),
            length=torch.from_numpy(lens.astype(np.int64)),
        )
    fj, lj = wav_to_spec(
        spiral_base_config(), jnp.asarray(wavs), jnp.asarray(lens)
    )
    assert list(np.asarray(lj)) == list(lens_t.numpy())
    tv = int(lens_t.min())
    diff = np.max(np.abs(
        feats_t.numpy().transpose(0, 2, 1)[:, :tv] - np.asarray(fj)[:, :tv]
    ))
    assert diff < 5e-4, diff
