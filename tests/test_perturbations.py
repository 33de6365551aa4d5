"""Augmentation registry completion (reference parts/perturb.py:291-823):
impulse/RIR convolution, codec transcode, RIR+noise composition,
process_augmentations factory, and the tarred-shard streaming dataset
(audio_to_text.py:798+)."""

import json
import os
import random
import tarfile

import numpy as np
import pytest

from tpu_speech.data.spiral import (
    AudioAugmentor,
    AudioBatchCollate,
    ImpulsePerturbation,
    PERTURBATIONS,
    RirAndNoisePerturbation,
    TarredAudioDataset,
    TranscodePerturbation,
    _alaw_roundtrip,
    _ulaw_roundtrip,
    process_augmentations,
)
from tpu_speech.data.wav import write_wav

SR = 16000


def _write_manifest(path, entries):
    with open(path, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")


def _make_rir_manifest(tmp_path, rng):
    # exponentially decaying sparse impulse response
    rir = np.zeros(800, dtype=np.float32)
    taps = rng.integers(0, 800, size=12)
    rir[taps] = rng.standard_normal(12) * np.exp(-taps / 300.0)
    rir[0] = 1.0
    p = str(tmp_path / "rir.wav")
    write_wav(p, rir * 0.5, SR)
    mpath = str(tmp_path / "rir_manifest.json")
    _write_manifest(mpath, [{"audio_filepath": p, "duration": 0.05}])
    return mpath


def test_impulse_perturbation(tmp_path, rng):
    mpath = _make_rir_manifest(tmp_path, rng)
    wav = (rng.standard_normal(SR) * 0.1).astype(np.float32)
    p = ImpulsePerturbation(mpath, rng=random.Random(0))
    out = p(wav, SR)
    assert out.shape == wav.shape and out.dtype == np.float32
    assert np.isfinite(out).all()
    assert not np.allclose(out, wav)  # reverberation applied
    # shift_impulse variant also runs and differs from the unshifted one
    p2 = ImpulsePerturbation(mpath, shift_impulse=True, rng=random.Random(0))
    out2 = p2(wav, SR)
    assert out2.shape == wav.shape and np.isfinite(out2).all()


def test_g711_roundtrips_are_faithful_but_lossy(rng):
    x = (rng.standard_normal(4000) * 0.2).clip(-1, 1).astype(np.float32)
    for fn in (_alaw_roundtrip, _ulaw_roundtrip):
        y = fn(x)
        err = x - y
        snr = 10 * np.log10(np.mean(x**2) / (np.mean(err**2) + 1e-12))
        assert snr > 20.0, (fn.__name__, snr)   # close...
        assert np.mean(err**2) > 0              # ...but not bit-identical


def test_transcode_perturbation(rng):
    wav = (np.sin(2 * np.pi * 440 * np.arange(SR) / SR) * 0.3).astype(np.float32)
    p = TranscodePerturbation(rng=random.Random(0))
    out = p(wav, SR)
    assert out.shape == wav.shape and out.dtype == np.float32
    # codec chain preserves the signal grossly but not exactly
    corr = np.corrcoef(wav, out)[0, 1]
    assert corr > 0.8
    assert not np.allclose(out, wav)


def test_rir_and_noise_perturbation(tmp_path, rng):
    rir_manifest = _make_rir_manifest(tmp_path, rng)
    noise = (rng.standard_normal(SR) * 0.05).astype(np.float32)
    npth = str(tmp_path / "noise.wav")
    write_wav(npth, noise, SR)
    nman = str(tmp_path / "noise_manifest.json")
    _write_manifest(nman, [{"audio_filepath": npth, "duration": 1.0}])
    p = RirAndNoisePerturbation(rir_manifest, nman, rir_prob=1.0,
                                rng=random.Random(0))
    wav = (rng.standard_normal(SR) * 0.1).astype(np.float32)
    out = p(wav, SR)
    assert out.shape == wav.shape and np.isfinite(out).all()


def test_process_augmentations(tmp_path, rng):
    mpath = _make_rir_manifest(tmp_path, rng)
    aug = process_augmentations({
        "gain": {"prob": 1.0, "min_gain_dbfs": -6, "max_gain_dbfs": 6},
        "impulse": {"prob": 0.5, "manifest_path": mpath},
        "transcode_aug": {"prob": 0.2},
    })
    assert isinstance(aug, AudioAugmentor)
    assert len(aug.perturbations) == 3
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = aug(wav, SR)
    assert out.shape == wav.shape
    assert process_augmentations(None) is None
    assert process_augmentations(aug) is aug
    with pytest.raises(KeyError):
        process_augmentations({"nope": {}})
    with pytest.raises(ValueError):
        process_augmentations({"gain": {"prob": 2.0}})
    # registry carries the reference's names
    for name in ("speed", "gain", "impulse", "shift", "noise", "white_noise",
                 "rir_noise_aug", "transcode_aug"):
        assert name in PERTURBATIONS


def _make_tar_shards(tmp_path, rng, n=6):
    entries = []
    shard_paths = [str(tmp_path / f"shard_{i}.tar") for i in range(2)]
    tars = [tarfile.open(p, "w") for p in shard_paths]
    for i in range(n):
        wav = (rng.standard_normal(SR // 2) * 0.1).astype(np.float32)
        wpath = str(tmp_path / f"utt{i}.wav")
        write_wav(wpath, wav, SR)
        tars[i % 2].add(wpath, arcname=f"utt{i}.wav")
        entries.append({
            "audio_filepath": wpath, "duration": 0.5, "text": f"text {i}",
        })
    for t in tars:
        t.close()
    mpath = str(tmp_path / "manifest.json")
    _write_manifest(mpath, entries)
    return mpath, shard_paths


def test_tarred_dataset_streams_all(tmp_path, rng):
    mpath, shards = _make_tar_shards(tmp_path, rng)
    ds = TarredAudioDataset(mpath, shards, SR, crop_size=4000,
                            return_both=True, shuffle_n=4)
    items = list(ds)
    assert len(items) == 6
    for it in items:
        assert it["wav"].shape == (4000,)
        assert it["p_wav"].shape == (4000,)


def test_tarred_dataset_shards_disjoint(tmp_path, rng):
    mpath, shards = _make_tar_shards(tmp_path, rng)
    a = TarredAudioDataset(mpath, shards, SR, shard_id=0, num_shards=2)
    b = TarredAudioDataset(mpath, shards, SR, shard_id=1, num_shards=2)
    na, nb = len(list(a)), len(list(b))
    assert na + nb == 6 and na > 0 and nb > 0


def test_tarred_dataset_batches_and_labels(tmp_path, rng):
    from tpu_speech.text.tokenizers import CharTokenizer, DEFAULT_CHAR_LABELS

    mpath, shards = _make_tar_shards(tmp_path, rng)
    tok = CharTokenizer(DEFAULT_CHAR_LABELS)
    ds = TarredAudioDataset(mpath, shards, SR, crop_size=4000,
                            tokenizer=tok)
    items = list(ds)
    assert all("labels" in it and len(it["labels"]) > 0 for it in items)

    ds2 = TarredAudioDataset(mpath, shards, SR, crop_size=4000,
                             return_both=True)
    collate = AudioBatchCollate(4000)
    batches = list(ds2.iter_batches(2, collate))
    assert len(batches) == 3
    assert batches[0]["wavs"].shape == (2, 4000)


def test_wer_html_diagnosis(tmp_path):
    from tpu_speech.eval.wer import align_words, render_wer_html

    ops = align_words("the cat sat down", "the cat sat")
    assert ops == [("ok", "the", "the"), ("ok", "cat", "cat"),
                   ("ok", "sat", "sat"), ("ins", "down", "")]
    ops = align_words("a c", "a b c")
    assert ("del", "", "b") in ops

    hyps = ["the cat sat down", "hello word", "exact match"]
    refs = ["the cat sat", "hello world", "exact match"]
    path = str(tmp_path / "diag.html")
    stats = render_wer_html(hyps, refs, path, ids=["u1", "u2", "u3"])
    assert stats["ins"] == 1 and stats["sub"] == 1 and stats["del"] == 0
    assert stats["wer"] == pytest.approx(2 / 7)
    assert stats["ser"] == pytest.approx(2 / 3)
    html = open(path).read()
    assert "u2" in html and 'class="sub"' in html and 'class="ins"' in html
    assert "WER = 28.57%" in html


def test_wer_text_preprocess_and_keyphrases():
    from tpu_speech.eval.wer import (
        key_phrase_stats,
        remove_comment_txt_preprocess,
        txt_preprocess,
    )

    assert txt_preprocess('Hello, World! "quoted" (x)\n\tnext') == \
        "hello world quoted x next"
    assert txt_preprocess("end.") == "end"
    assert remove_comment_txt_preprocess("keep [noise] this.") == "keep this"

    stats = key_phrase_stats(
        hypotheses=["call john smith now", "no phrase here"],
        references=["call john smith today", "john smith was here"],
        key_phrases=["john smith"],
    )
    assert stats["matched"] == 1
    assert stats["ref_keyphrases"] == 2 and stats["hyp_keyphrases"] == 1
    assert stats["jaccard"] == pytest.approx(1 / 2)
    assert stats["f1"] == pytest.approx(2 / 3)

    # alignment-correct counting (simple_wer_v2.py AddHypRef:313-318): the
    # hyp splits the phrase with an insertion, so hyp.count() misses it, but
    # every phrase word aligns 'ok' -> matched_ref contains the phrase
    stats = key_phrase_stats(
        hypotheses=["call john and smith"],
        references=["call john smith"],
        key_phrases=["john smith"],
    )
    assert stats["matched"] == 1 and stats["hyp_keyphrases"] == 0
    assert stats["ref_keyphrases"] == 1
    assert stats["f1"] == pytest.approx(2.0)  # the reference's F1>1 quirk

    # inputs are preprocessed like the reference (init:209-213, :238-240)
    stats = key_phrase_stats(
        hypotheses=["Call John Smith!"],
        references=["call [noise] john smith"],
        key_phrases=["John Smith"],
    )
    assert stats["matched"] == 1 == stats["ref_keyphrases"]

    with pytest.raises(ValueError):
        key_phrase_stats(["a", "b"], ["a"], ["a"])


def test_wer_length_mismatch_raises():
    from tpu_speech.eval.wer import analyze_errors, render_wer_html, word_error_rate

    with pytest.raises(ValueError):
        word_error_rate(["a", "b"], ["a"])
    with pytest.raises(ValueError):
        analyze_errors(["a"], ["a", "b"])
    with pytest.raises(ValueError):
        render_wer_html(["a", "b"], ["a"], "/dev/null")
