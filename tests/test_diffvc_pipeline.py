"""DiffVC data pipeline + two-stage trainer smoke tests (virtual CPU mesh)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpu_speech.data.diffvc import (
    VCDecBatchCollate,
    VCDecDataset,
    VCEncBatchCollate,
    VCEncDataset,
    build_average_mels,
)
from tpu_speech.data.textgrid import get_tier, has_phone
from tpu_speech.models.diffvc.encoder import FwdDiffusion
from tpu_speech.models.diffvc.vc import DiffVC
from tpu_speech.train.diffvc import (
    DiffVCTrainer,
    make_dec_train_step,
    make_enc_train_step,
)
from tpu_speech.train.state import TrainState

TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.3
            text = "sil"
        intervals [2]:
            xmin = 0.3
            xmax = 0.7
            text = "AH0"
        intervals [3]:
            xmin = 0.7
            xmax = 1.0
            text = "{spn}"
"""


@pytest.fixture
def vc_tree(tmp_path, rng):
    """Synthetic DiffVC data tree: 2 speakers x 3 utterances."""
    n_mels = 8
    for spk in ("s1", "s2"):
        for d in ("mels", "mels_mode", "embeds", "textgrids"):
            os.makedirs(tmp_path / d / spk, exist_ok=True)
        for u in range(3):
            uid = f"{spk}_{u:03d}"
            t = int(rng.integers(40, 90))
            mel = rng.standard_normal((n_mels, t)).astype(np.float32)
            np.save(tmp_path / "mels" / spk / f"{uid}_mel.npy", mel)
            np.save(tmp_path / "mels_mode" / spk / f"{uid}_avgmel.npy", mel * 0.5)
            np.save(
                tmp_path / "embeds" / spk / f"{uid}_embed.npy",
                rng.standard_normal(256).astype(np.float32),
            )
            tg = TG.replace('text = "{spn}"', 'text = "sp"')
            (tmp_path / "textgrids" / spk / f"{uid}.TextGrid").write_text(tg)
    return tmp_path, n_mels


def test_textgrid_parser(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(TG.replace("{spn}", "spn"))
    tier = get_tier(str(p))
    assert [iv.text for iv in tier] == ["sil", "AH0", "spn"]
    assert tier[1].start_time == 0.3
    assert has_phone(str(p), "spn")
    p2 = tmp_path / "b.TextGrid"
    p2.write_text(TG.replace("{spn}", "sp"))
    assert not has_phone(str(p2), "spn")


def test_enc_dataset_and_collate(vc_tree):
    data_dir, n_mels = vc_tree
    ds = VCEncDataset(str(data_dir))
    assert len(ds) == 6
    item = ds[0]
    assert item["x"].shape[1] == n_mels
    collate = VCEncBatchCollate(train_frames=32, n_mels=n_mels)
    batch = collate([ds[i] for i in range(4)])
    assert batch["x"].shape == (4, 32, n_mels)
    assert (batch["lengths"] <= 32).all()


def test_dec_dataset_and_collate(vc_tree):
    data_dir, n_mels = vc_tree
    ds = VCDecDataset(str(data_dir), min_utts_per_speaker=1)
    assert len(ds) == 6
    collate = VCDecBatchCollate(train_frames=32, n_mels=n_mels)
    batch = collate([ds[i] for i in range(4)])
    assert batch["mel1"].shape == (4, 32, n_mels)
    assert batch["c"].shape == (4, 256)
    # two crops of the same utterance generally differ
    assert not np.allclose(batch["mel1"], batch["mel2"])


def test_avg_mel_builder(vc_tree):
    data_dir, n_mels = vc_tree
    modes = build_average_mels(str(data_dir), avg_type="test")
    assert "AH0" in modes and modes["AH0"].shape == (n_mels,)
    out = data_dir / "mels_test" / "s1"
    assert len(list(out.iterdir())) == 3


TINY_ENC = dict(n_feats=8, channels=16, filters=32, heads=2, layers=1,
                kernel=3, dropout=0.1, window_size=2, dim=8)


@pytest.mark.slow
def test_enc_train_step(vc_tree, rng):
    data_dir, n_mels = vc_tree
    model = FwdDiffusion(**TINY_ENC)
    x = jnp.zeros((8, 32, n_mels))
    mask = jnp.ones((8, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, mask, train=False)
    tx = optax.adam(5e-4)
    state = TrainState.create({"params": variables["params"]}, tx)
    step = make_enc_train_step(model, tx)
    batch = {
        "x": rng.standard_normal((8, 32, n_mels)).astype(np.float32),
        "y": rng.standard_normal((8, 32, n_mels)).astype(np.float32),
        "lengths": np.full((8,), 32, dtype=np.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_dec_train_step_freezes_encoder(rng):
    model = DiffVC(n_feats=8, channels=16, filters=32, heads=2, layers=1,
                   kernel=3, dropout=0.1, window_size=2, enc_dim=8, spk_dim=16,
                   use_ref_t=True, dec_dim=16)
    b, tf, f = 8, 16, 8
    x = jnp.zeros((b, tf, f))
    xl = jnp.full((b,), tf)
    c = jnp.zeros((b, 256))
    variables = model.init(
        jax.random.PRNGKey(0), x, xl, x, c, jax.random.PRNGKey(1), train=False
    )
    tx = optax.adam(1e-4)
    state = TrainState.create({"params": variables["params"]}, tx)
    enc_before = jax.device_get(state.params["params"]["encoder"])
    step = make_dec_train_step(model, tx)
    batch = {
        "mel1": rng.standard_normal((b, tf, f)).astype(np.float32),
        "mel2": rng.standard_normal((b, tf, f)).astype(np.float32),
        "mel_lengths": np.full((b,), tf, dtype=np.int32),
        "c": rng.standard_normal((b, 256)).astype(np.float32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    enc_after = jax.device_get(state.params["params"]["encoder"])
    for a, b_ in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after)):
        np.testing.assert_array_equal(a, b_)


@pytest.mark.slow
def test_diffvc_encoder_overfits(rng):
    """Stage-1 avg-voice encoder learns: masked-MSE loss on a fixed batch
    drops over repeated steps (reference train_enc.py validates by loss)."""
    import optax

    import jax
    import jax.numpy as jnp

    from tpu_speech.models.diffvc.encoder import FwdDiffusion
    from tpu_speech.train.diffvc import make_enc_train_step
    from tpu_speech.train.state import TrainState

    model = FwdDiffusion(n_feats=8, channels=16, filters=32, heads=2,
                         layers=1, kernel=3, dropout=0.0, window_size=2,
                         dim=16)
    b, t = 4, 32
    x = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    mask = jnp.ones((b, t, 1))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, y, mask, train=True, method=FwdDiffusion.compute_loss,
    )
    tx = optax.adam(2e-3)
    state = TrainState.create({"params": params["params"]}, tx)
    step = make_enc_train_step(model, tx)
    batch = {"x": x, "y": y, "lengths": lengths}
    first = None
    for i in range(60):
        state, m = step(state, batch, jax.random.PRNGKey(2))
        if i == 0:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    assert last < 0.5 * first, (first, last)


def test_mel_spectral_subtraction_uses_source_silence():
    """The notebook denoiser locates the quietest window in the SOURCE mel,
    then reads the noise profile from the synthesized mel at that index
    (inference.ipynb mel_spectral_subtraction)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))
    from inference_vc import mel_spectral_subtraction, noise_median_smoothing

    rng = np.random.default_rng(0)
    T, F = 40, 8
    src = np.full((T, F), 1.0)
    src[10:17] = -6.0  # silence in the source at t=10
    synth = rng.normal(0.0, 0.1, (T, F)).astype(np.float64)
    synth[30:37] = -9.0  # a quieter region elsewhere in the synth
    out = mel_spectral_subtraction(synth, src, smoothing_window=1)
    assert out.shape == (T, F)
    # noise profile must come from synth[t=10..15], NOT the synth minimum
    noise = noise_median_smoothing(
        np.min(np.exp(2.0 * synth.T[:, 10:15]), axis=-1), 1)
    sig = np.exp(2.0 * synth.T) - noise[:, None]
    # frames where subtraction dominates the floor must match exactly
    expect = np.log(np.sqrt(np.maximum(sig, 0.02 * noise[:, None]))).T
    np.testing.assert_allclose(out, expect, rtol=1e-6)


@pytest.mark.slow
def test_diffvc_bf16_steps(rng):
    """bf16 mixed precision for both DiffVC stages: finite fp32 loss, fp32
    master params preserved, encoder still frozen in the decoder stage."""
    model = FwdDiffusion(**TINY_ENC)
    n_mels = TINY_ENC["n_feats"]
    x = jnp.zeros((4, 32, n_mels))
    mask = jnp.ones((4, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, mask, train=False)
    tx = optax.adam(5e-4)
    state = TrainState.create({"params": variables["params"]}, tx)
    step = make_enc_train_step(model, tx, bf16=True)
    batch = {
        "x": rng.standard_normal((4, 32, n_mels)).astype(np.float32),
        "y": rng.standard_normal((4, 32, n_mels)).astype(np.float32),
        "lengths": np.full((4,), 32, dtype=np.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert metrics["loss"].dtype == jnp.float32
    assert np.isfinite(float(metrics["loss"]))
    for p in jax.tree.leaves(state.params):
        assert p.dtype == jnp.float32  # master weights stay fp32

    dec = DiffVC(n_feats=8, channels=16, filters=32, heads=2, layers=1,
                 kernel=3, dropout=0.1, window_size=2, enc_dim=8, spk_dim=16,
                 use_ref_t=True, dec_dim=16)
    b, tf, f = 4, 16, 8
    variables = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((b, tf, f)), jnp.full((b,), tf),
        jnp.zeros((b, tf, f)), jnp.zeros((b, 256)), jax.random.PRNGKey(1),
        train=False,
    )
    state = TrainState.create({"params": variables["params"]}, optax.adam(1e-4))
    step = make_dec_train_step(dec, optax.adam(1e-4), bf16=True)
    batch = {
        "mel1": rng.standard_normal((b, tf, f)).astype(np.float32),
        "mel2": rng.standard_normal((b, tf, f)).astype(np.float32),
        "mel_lengths": np.full((b,), tf, dtype=np.int32),
        "c": rng.standard_normal((b, 256)).astype(np.float32),
    }
    enc_before = jax.device_get(state.params["params"]["encoder"])
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    enc_after = jax.device_get(state.params["params"]["encoder"])
    for a, b_ in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after)):
        np.testing.assert_array_equal(a, b_)
