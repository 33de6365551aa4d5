"""Export utility + VCTK dataset variant tests."""

import os

import numpy as np

import jax.numpy as jnp

from tpu_speech.data.diffvc import (
    VCTK_UNSEEN_SENTENCES,
    VCTK_UNSEEN_SPEAKERS,
    VCTKDecDataset,
    VCTKEncDataset,
)
from tpu_speech.utils.export import export_fn, load_exported


def test_export_roundtrip(tmp_path):
    def fn(x):
        return jnp.sin(x) * 2.0

    x = jnp.arange(8, dtype=jnp.float32)
    path = str(tmp_path / "fn.stablehlo")
    export_fn(fn, (x,), path, platforms=("cpu",))
    assert os.path.getsize(path) > 0
    loaded = load_exported(path)
    got = loaded.call(x)
    np.testing.assert_allclose(np.asarray(got), np.sin(np.arange(8)) * 2.0,
                               atol=1e-6)


def test_vctk_datasets(tmp_path, rng):
    for spk in ("p225", "p252"):  # p252 is an unseen speaker
        for d in ("mels", "mels_mode", "embeds"):
            os.makedirs(tmp_path / d / spk, exist_ok=True)
        for sent in ("001", "006"):  # 001 is an unseen sentence
            uid = f"{spk}_{sent}"
            mel = rng.standard_normal((8, 50)).astype(np.float32)
            np.save(tmp_path / "mels" / spk / f"{uid}_mel.npy", mel)
            np.save(tmp_path / "mels_mode" / spk / f"{uid}_avgmel.npy", mel)
            np.save(
                tmp_path / "embeds" / spk / f"{uid}_embed.npy",
                rng.standard_normal(256).astype(np.float32),
            )
    enc = VCTKEncDataset(str(tmp_path))
    enc_ids = [m for m, s in enc.train_info]
    assert enc_ids == ["p225_006"]
    dec = VCTKDecDataset(str(tmp_path))
    train_ids = [m for m, s in dec.train_info]
    # only seen speaker + seen sentence remains
    assert train_ids == ["p225_006"]
    assert "p252" in VCTK_UNSEEN_SPEAKERS
    assert "001" in VCTK_UNSEEN_SENTENCES
