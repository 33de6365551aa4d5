"""Native C++ audio batch pipeline (native/audio_pipeline.cpp) vs the Python
data path it replaces (data/spiral.py AudioDataset/RandomNoisePerturbation/
AudioBatchCollate). Host-only: no jax."""

import os
import struct

import numpy as np
import pytest
import scipy.io.wavfile

from tpu_speech.data import native_pipeline as npipe
from tpu_speech.data.spiral import (
    AudioAugmentor,
    AudioDataset,
    GainPerturbation,
    RandomNoisePerturbation,
)
from tpu_speech.data.wav import read_wav

SR = 16000

pytestmark = pytest.mark.skipif(
    not npipe.native_available(), reason="native audio pipeline not built"
)


def _write_manifest(path, wav_paths, duration=10.0):
    import json

    with open(path, "w") as f:
        for p in wav_paths:
            f.write(json.dumps({"audio_filepath": str(p),
                                "duration": duration, "text": ""}) + "\n")
    return str(path)


def _tone(n, freq=440.0, amp=0.3, sr=SR):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _write_int16(path, wav):
    scipy.io.wavfile.write(path, SR, (wav * 32767).astype(np.int16))


def _write_24bit(path, wav):
    """Hand-rolled 24-bit PCM wav (scipy reads these; the native parser
    rejects them -> exercises the per-item Python fallback)."""
    data = (np.clip(wav, -1, 1) * (2**23 - 1)).astype(np.int32)
    raw = b"".join(struct.pack("<i", int(v))[:3] for v in data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, SR, SR * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)


# ---------------------------------------------------------------------------
# wav reader parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["int16", "int32", "uint8", "float32",
                                  "stereo16"])
def test_read_wav_native_matches_python(tmp_path, kind):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(5000) * 0.2).astype(np.float32)
    path = str(tmp_path / f"{kind}.wav")
    if kind == "int16":
        scipy.io.wavfile.write(path, SR, (wav * 32767).astype(np.int16))
    elif kind == "int32":
        scipy.io.wavfile.write(path, SR,
                               (wav * 2**31).astype(np.int64)
                               .clip(-2**31, 2**31 - 1).astype(np.int32))
    elif kind == "uint8":
        scipy.io.wavfile.write(path, SR,
                               ((wav * 127) + 128).astype(np.uint8))
    elif kind == "float32":
        scipy.io.wavfile.write(path, SR, wav)
    else:  # stereo int16 -> mean of channels
        st = np.stack([wav, -0.5 * wav], axis=1)
        scipy.io.wavfile.write(path, SR, (st * 32767).astype(np.int16))
    ref, ref_sr = read_wav(path)
    got = npipe.read_wav_native(path)
    assert got is not None
    nat, nat_sr = got
    assert nat_sr == ref_sr == SR
    assert nat.dtype == np.float32
    np.testing.assert_allclose(nat, ref.astype(np.float32), atol=1e-6)


def test_read_wav_native_window(tmp_path):
    wav = _tone(4000)
    path = str(tmp_path / "t.wav")
    _write_int16(path, wav)
    full, _ = read_wav(path)
    seg, _ = npipe.read_wav_native(path, start=1000, max_frames=500)
    np.testing.assert_allclose(seg, full[1000:1500].astype(np.float32),
                               atol=1e-6)
    # past-the-end start clamps to empty
    seg, _ = npipe.read_wav_native(path, start=10_000)
    assert seg.shape == (0,)


def test_read_wav_native_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.wav")
    with open(path, "wb") as f:
        f.write(b"not a wav file at all")
    assert npipe.read_wav_native(path) is None


# ---------------------------------------------------------------------------
# batch prep vs numpy oracle
# ---------------------------------------------------------------------------


def _oracle_batch(wav_paths, crop_size, crop_u, noise_paths, noise_u, snr_db):
    """Numpy re-statement of tsp_prepare_pretrain_batch given the uniforms
    (the same math as AudioDataset._load_cropped + RandomNoisePerturbation)."""
    b = len(wav_paths)
    wavs = np.zeros((b, crop_size), np.float32)
    p_wavs = np.zeros((b, crop_size), np.float32)
    lens = np.zeros((b,), np.int32)
    for i, p in enumerate(wav_paths):
        wav, _ = read_wav(p)
        wav = wav.astype(np.float32)
        if len(wav) > crop_size:
            start = int(crop_u[i] * (len(wav) - crop_size))
            wav = wav[start:start + crop_size]
        n = len(wav)
        wavs[i, :n] = wav
        lens[i] = n
        mixed = wav
        if noise_paths[i] is not None:
            noise, _ = read_wav(noise_paths[i])
            noise = noise.astype(np.float32)
            if len(noise) < n:
                noise = np.tile(noise, int(np.ceil(n / max(len(noise), 1))))
            span = max(len(noise) - n, 1)
            start = min(int(noise_u[i] * span), span - 1)
            seg = noise[start:start + n]
            p_sig = np.mean(wav.astype(np.float64) ** 2) + 1e-12
            p_noise = np.mean(seg.astype(np.float64) ** 2) + 1e-12
            scale = np.sqrt(p_sig / (p_noise * 10 ** (snr_db[i] / 10)))
            mixed = (wav + np.float32(scale) * seg).astype(np.float32)
        p_wavs[i, :n] = mixed
    return wavs, lens, p_wavs


def test_prepare_batch_matches_oracle(tmp_path):
    rng = np.random.default_rng(7)
    crop = 2000
    paths, noise_paths = [], []
    # mixed lengths: longer than crop (random-crop path), shorter (pad path)
    for i, n in enumerate([5000, 1200, 2000, 3777]):
        p = str(tmp_path / f"s{i}.wav")
        _write_int16(p, (rng.standard_normal(n) * 0.2).astype(np.float32))
        paths.append(p)
    # noise shorter than crop (tiling path) and longer
    for i, n in enumerate([700, 6000]):
        p = str(tmp_path / f"n{i}.wav")
        _write_int16(p, (rng.standard_normal(n) * 0.1).astype(np.float32))
        noise_paths.append(p)
    noise = [noise_paths[0], None, noise_paths[1], noise_paths[0]]
    snr = np.array([5.0, 0.0, 20.0, -3.0], np.float32)

    batch, failed = npipe.prepare_pretrain_batch(
        paths, crop, np.random.default_rng(123), noise, snr, expected_sr=SR
    )
    assert failed == []
    # replay the identical uniforms the call drew
    r = np.random.default_rng(123)
    crop_u, noise_u = r.random(4), r.random(4)
    wavs, lens, p_wavs = _oracle_batch(paths, crop, crop_u, noise, noise_u,
                                       snr)
    np.testing.assert_array_equal(batch["wav_lens"], lens)
    np.testing.assert_array_equal(batch["p_wav_lens"], lens)
    np.testing.assert_allclose(batch["wavs"], wavs, atol=1e-6)
    np.testing.assert_allclose(batch["p_wavs"], p_wavs, atol=2e-5)
    # clean row without noise is exactly the perturbed row
    np.testing.assert_array_equal(batch["wavs"][1], batch["p_wavs"][1])
    # achieved SNR of the mixed rows matches the requested SNR
    for i in (0, 2, 3):
        n = lens[i]
        add = batch["p_wavs"][i, :n] - batch["wavs"][i, :n]
        got_snr = 10 * np.log10(
            (np.mean(batch["wavs"][i, :n] ** 2) + 1e-12)
            / (np.mean(add ** 2) + 1e-12)
        )
        assert abs(got_snr - snr[i]) < 0.1, (i, got_snr, snr[i])


def test_prepare_batch_flags_unreadable(tmp_path):
    good = str(tmp_path / "g.wav")
    _write_int16(good, _tone(3000))
    bad = str(tmp_path / "missing.wav")
    batch, failed = npipe.prepare_pretrain_batch(
        [good, bad], 2000, np.random.default_rng(0), expected_sr=SR
    )
    assert failed == [1]
    assert batch["wav_lens"][0] == 2000 and batch["wav_lens"][1] == 0
    assert not batch["wavs"][1].any()
    # sample-rate mismatch is also a (python-refillable) failure
    batch, failed = npipe.prepare_pretrain_batch(
        [good], 2000, np.random.default_rng(0), expected_sr=22050
    )
    assert failed == [0]


# ---------------------------------------------------------------------------
# NativePretrainBatcher gating + end-to-end batches
# ---------------------------------------------------------------------------


def _make_dataset(tmp_path, rng, n_files=6, crop=2000, augmentor=None):
    paths = []
    for i in range(n_files):
        p = tmp_path / f"u{i}.wav"
        _write_int16(str(p),
                     (rng.standard_normal(3000 + 311 * i) * 0.2)
                     .astype(np.float32))
        paths.append(p)
    man = _write_manifest(tmp_path / "train.json", paths)
    return AudioDataset(man, sample_rate=SR, crop_size=crop,
                        augmentor=augmentor, return_both=True)


def test_batcher_builds_and_batches(tmp_path):
    rng = np.random.default_rng(3)
    noise_wavs = []
    for i in range(2):
        p = tmp_path / f"noise{i}.wav"
        _write_int16(str(p),
                     (rng.standard_normal(900) * 0.1).astype(np.float32))
        noise_wavs.append(p)
    noise_man = _write_manifest(tmp_path / "noise.json", noise_wavs)
    aug = AudioAugmentor(
        [(1.0, RandomNoisePerturbation(noise_man, 0.0, 30.0, ratio=1.0))]
    )
    ds = _make_dataset(tmp_path, rng, crop=2000, augmentor=aug)
    batcher = npipe.NativePretrainBatcher.maybe_build(ds, seed=0)
    assert batcher is not None
    batch = batcher([0, 1, 2, 3])
    assert batch["wavs"].shape == (4, 2000)
    assert batch["p_wavs"].shape == (4, 2000)
    assert (batch["wav_lens"] == np.minimum(
        [3000, 3311, 3622, 3933], 2000)).all()
    # with prob=1/ratio=1 every row is perturbed
    for i in range(4):
        n = batch["wav_lens"][i]
        assert not np.array_equal(batch["p_wavs"][i, :n],
                                  batch["wavs"][i, :n])
    # reproducible from the seed
    again = npipe.NativePretrainBatcher.maybe_build(ds, seed=0)([0, 1, 2, 3])
    np.testing.assert_array_equal(batch["p_wavs"], again["p_wavs"])


def test_batcher_no_augmentor_yields_identical_pair(tmp_path):
    ds = _make_dataset(tmp_path, np.random.default_rng(1))
    batcher = npipe.NativePretrainBatcher.maybe_build(ds, seed=0)
    assert batcher is not None
    batch = batcher([0, 1])
    np.testing.assert_array_equal(batch["wavs"], batch["p_wavs"])
    # and the clean rows agree with the python dataset's own crop window
    # distribution-wise: same file content, crop inside the file
    full, _ = read_wav(ds.entries[0]["audio_filepath"])
    n = batch["wav_lens"][0]
    row = batch["wavs"][0, :n]
    # row must be a contiguous slice of the file
    found = False
    for s in range(len(full) - n + 1):
        if np.allclose(full[s:s + n], row, atol=1e-6):
            found = True
            break
    assert found


def test_batcher_gating(tmp_path):
    rng = np.random.default_rng(2)
    # non-native-expressible augmentor -> None
    ds = _make_dataset(tmp_path, rng,
                       augmentor=AudioAugmentor([(1.0, GainPerturbation())]))
    assert npipe.NativePretrainBatcher.maybe_build(ds) is None
    # return_both=False -> None
    man = _write_manifest(tmp_path / "m2.json",
                          [ds.entries[0]["audio_filepath"]])
    ds2 = AudioDataset(man, sample_rate=SR, crop_size=2000, return_both=False)
    assert npipe.NativePretrainBatcher.maybe_build(ds2) is None
    # no crop size -> None
    ds3 = AudioDataset(man, sample_rate=SR, crop_size=None, return_both=True)
    assert npipe.NativePretrainBatcher.maybe_build(ds3) is None


def test_batcher_python_fallback_for_unparseable_item(tmp_path):
    rng = np.random.default_rng(4)
    p0 = tmp_path / "a.wav"
    _write_int16(str(p0), (rng.standard_normal(3000) * 0.2)
                 .astype(np.float32))
    p1 = tmp_path / "b24.wav"  # scipy-readable, native-rejected (24-bit)
    _write_24bit(str(p1), _tone(2500, amp=0.4))
    man = _write_manifest(tmp_path / "m.json", [p0, p1])
    ds = AudioDataset(man, sample_rate=SR, crop_size=2000, return_both=True)
    batcher = npipe.NativePretrainBatcher.maybe_build(ds, seed=0)
    assert batcher is not None
    batch = batcher([0, 1])
    assert batch["wav_lens"][0] == 2000
    assert batch["wav_lens"][1] == 2000  # refilled through the python path
    full1, _ = read_wav(str(p1))
    # the refilled row is a genuine slice of the 24-bit file's samples
    row = batch["wavs"][1]
    assert np.abs(row).max() > 0.1
    n = 2000
    found = any(
        np.allclose(full1[s:s + n], row, atol=1e-6)
        for s in range(len(full1) - n + 1)
    )
    assert found


def test_loader_with_batch_fn(tmp_path):
    from tpu_speech.data.loader import DataLoader

    ds = _make_dataset(tmp_path, np.random.default_rng(5))
    batcher = npipe.NativePretrainBatcher.maybe_build(ds, seed=0)
    loader = DataLoader(ds, batch_size=3, collate_fn=None, shuffle=False,
                        num_workers=0, batch_fn=batcher)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert set(b) == {"wavs", "wav_lens", "p_wavs", "p_wav_lens"}
        assert b["wavs"].shape == (3, 2000)
