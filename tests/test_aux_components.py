"""Auxiliary components: Gumbel VQ, spec augmentations, MFCC, exp manager,
profiler, GE2E trainer, native MAS."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpu_speech.models.spiral.augment import (
    crop_or_pad_spectrogram,
    mfcc_features,
    negative_cosine_similarity_loss,
    spec_augment,
    spec_cutout,
)
from tpu_speech.models.spiral.quantizer import GumbelVectorQuantizer
from tpu_speech.models.speaker_encoder import SpeakerEncoder
from tpu_speech.ops.monotonic_align import maximum_path_numpy
from tpu_speech.ops.monotonic_align_native import (
    maximum_path_native,
    native_available,
)
from tpu_speech.train.speaker_encoder import init_ge2e_state, make_ge2e_train_step
from tpu_speech.utils.exp_manager import ExpManager
from tpu_speech.utils.profiling import StepTimer


def test_gumbel_vq(rng):
    vq = GumbelVectorQuantizer(dim=16, num_vars=8, groups=2, vq_dim=16)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    params = vq.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, 0, train=True,
    )
    q, ppl_loss, temp, ppl = vq.apply(
        params, x, 100, train=True, rngs={"gumbel": jax.random.PRNGKey(2)}
    )
    assert q.shape == (2, 10, 16)
    assert 0.0 <= float(ppl_loss) <= 1.0
    assert float(ppl) <= 16.0
    # eval path (hard argmax)
    q2, *_ = vq.apply(params, x, 100, train=False)
    assert np.isfinite(np.asarray(q2)).all()
    # grads flow through the straight-through estimator
    g = jax.grad(
        lambda p: vq.apply(
            p, x, 0, train=True, rngs={"gumbel": jax.random.PRNGKey(3)}
        )[0].sum()
    )(params)
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree.leaves(g))


def test_spec_augment_and_cutout(rng):
    specs = jnp.ones((2, 50, 32))
    out = spec_augment(jax.random.PRNGKey(0), specs, freq_width=8, time_width=10)
    assert out.shape == specs.shape
    assert float(out.sum()) < float(specs.sum())  # something masked
    out2 = spec_cutout(jax.random.PRNGKey(1), specs, rect_time=10, rect_freq=8)
    assert float(out2.sum()) < float(specs.sum())


def test_crop_or_pad():
    specs = jnp.ones((2, 50, 8))
    lens = jnp.array([50, 40])
    out, l2 = crop_or_pad_spectrogram(specs, lens, 30, rng=jax.random.PRNGKey(0))
    assert out.shape == (2, 30, 8)
    assert (np.asarray(l2) <= 30).all()
    out3, l3 = crop_or_pad_spectrogram(specs, lens, 64)
    assert out3.shape == (2, 64, 8)
    assert np.asarray(out3[:, 50:]).sum() == 0


def test_negative_cosine_loss(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    assert np.isclose(float(negative_cosine_similarity_loss(x, x)), -1.0)
    y = -x
    assert np.isclose(float(negative_cosine_similarity_loss(x, y)), 1.0)


def test_mfcc(rng):
    wavs = jnp.asarray((rng.standard_normal((1, 8000)) * 0.1).astype(np.float32))
    lens = jnp.array([8000])
    mfcc, out_lens = mfcc_features(wavs, lens, n_mfcc=13, nfilt=40, dither=0.0)
    assert mfcc.shape[-1] == 13
    assert np.isfinite(np.asarray(mfcc)).all()


def test_exp_manager(tmp_path):
    em = ExpManager(name="t", base_dir=str(tmp_path))
    assert os.path.exists(os.path.join(em.log_dir, "env.json"))
    em.save_config({"a": 1})
    em.append_log("hello")
    assert os.path.exists(os.path.join(em.log_dir, "config.json"))
    em2 = ExpManager(name="t", base_dir=str(tmp_path), resume_if_exists=False)
    assert em2.log_dir != em.log_dir  # new version dir


def test_step_timer():
    t = StepTimer()
    with t.measure("x"):
        pass
    t.tick("y")
    t.tock("y")
    s = t.summary()
    assert "x" in s and "y" in s and s["x"]["count"] == 1


def test_ge2e_train_step(rng):
    model = SpeakerEncoder(hidden_size=16, embedding_size=16, num_layers=1)
    tx = optax.adam(1e-3)
    state = init_ge2e_state(model, jax.random.PRNGKey(0), 20, 8, tx)
    step = make_ge2e_train_step(model, tx)
    frames = jnp.asarray(
        rng.standard_normal((3, 4, 20, 8)).astype(np.float32)
    )  # (speakers, utts, T, F)
    l0 = None
    for i in range(3):
        state, m = step(state, frames)
        if l0 is None:
            l0 = float(m["loss"])
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < l0  # optimizing


def test_native_mas_matches_oracle(rng):
    v = rng.standard_normal((3, 12, 30)).astype(np.float32)
    m = np.zeros_like(v)
    for i, (tx, ty) in enumerate([(12, 30), (8, 20), (5, 5)]):
        m[i, :tx, :ty] = 1
    got = maximum_path_native(v, m)
    want = maximum_path_numpy(v, m)
    np.testing.assert_array_equal(got, want)
    assert native_available() or True  # fallback path also valid
