"""int16 waveform wire format: host quantize + on-device decode.

The input pipeline ships int16 PCM samples over the host->device link and
the jitted step converts to float32 on device (wav_to_spec), halving the
dominant H2D payload (round-4 verdict weak #5; the reference DataLoader
ships float32, st2vec_pretrain.py:225-233). These tests pin the contract:

1. the device decode is BIT-EXACT against the host-side read_wav
   conversion for int16-sourced audio (the production case), and
2. re-quantizing augmented (float) waveforms errs by <= 0.5 LSB, and
3. a pretrain step fed the int16 wire reproduces the float-wire loss
   exactly when the floats are int16-representable.
"""

import dataclasses
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tests.test_spiral_pretrain import TINY_CFG
from tpu_speech.data.wav import read_wav, write_wav
from tpu_speech.models.spiral.st2vec import ST2VecEncoder, wav_to_spec
from tpu_speech.train.spiral import (
    host_augment_batch,
    init_spiral_state,
    make_pretrain_step,
    quantize_wire_int16,
)


def test_device_decode_bit_exact_vs_host():
    """int16 -> f32/32768 on device == the same conversion on host, bitwise,
    including the extremes."""
    ints = np.concatenate([
        np.array([-32768, -32767, -1, 0, 1, 32766, 32767], np.int16),
        np.random.default_rng(0).integers(
            -32768, 32768, size=4000).astype(np.int16),
    ])
    host = ints.astype(np.float32) / 32768.0
    cfg = TINY_CFG

    # decode exactly as wav_to_spec does, isolated from the filterbank
    dev = jax.jit(
        lambda w: w.astype(jnp.float32) * (1.0 / 32768.0)
    )(jnp.asarray(ints))
    np.testing.assert_array_equal(np.asarray(dev), host)

    # and through wav_to_spec itself: int16 input == float input, bitwise
    wavs_i = jnp.asarray(ints[None, :4000].reshape(1, 4000))
    wavs_f = jnp.asarray(host[None, :4000].reshape(1, 4000))
    lens = jnp.array([4000], dtype=jnp.int32)
    cfg0 = dataclasses.replace(cfg, dither=0.0)
    s_i, _ = jax.jit(lambda w, l: wav_to_spec(cfg0, w, l))(wavs_i, lens)
    s_f, _ = jax.jit(lambda w, l: wav_to_spec(cfg0, w, l))(wavs_f, lens)
    np.testing.assert_array_equal(np.asarray(s_i), np.asarray(s_f))


def test_wav_file_roundtrip_bit_exact():
    """Disk int16 PCM -> read_wav floats -> quantize_wire_int16 recovers the
    original samples (the un-augmented production path is lossless)."""
    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32768, size=8000).astype(np.int16)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.wav")
        write_wav(path, pcm, 16000)
        wav, sr = read_wav(path)
    assert sr == 16000
    batch = quantize_wire_int16({"wavs": wav[None].astype(np.float32)})
    np.testing.assert_array_equal(batch["wavs"][0], pcm)


def test_quantize_error_bound_and_clip():
    rng = np.random.default_rng(2)
    w = rng.uniform(-1.0, 1.0, size=10000).astype(np.float32)
    q = quantize_wire_int16({"wavs": w[None]})["wavs"][0]
    back = q.astype(np.float32) / 32768.0
    assert np.max(np.abs(back - w)) <= 0.5 / 32768.0 + 1e-9
    # out-of-range samples (hot augmented mixes) clip instead of wrapping
    loud = np.array([[2.0, -2.0]], np.float32)
    q2 = quantize_wire_int16({"wavs": loud})["wavs"]
    assert q2[0, 0] == 32767 and q2[0, 1] == -32768


def test_pretrain_step_loss_equal_across_wire():
    """One pretrain step on int16-representable audio: the int16 wire and
    the float32 wire produce the SAME loss (identical f32 tensors reach the
    featurizer, so the programs differ only by the on-device decode)."""
    cfg = dataclasses.replace(TINY_CFG, dither=0.0)
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(1e-3)
    b, n = 2, 20480
    from tpu_speech.train.spiral_runner import _spec_len

    spec_len = _spec_len(n, cfg.sample_rate)
    rng = np.random.default_rng(3)
    ints = rng.integers(-3000, 3000, size=(b, n)).astype(np.int16)
    wavs = ints.astype(np.float32) / 32768.0
    lens = np.full((b,), n, np.int32)
    batch = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(4),
    )
    batch_i16 = quantize_wire_int16(batch)
    np.testing.assert_array_equal(batch_i16["wavs"], ints)

    losses = []
    for bb in (batch, batch_i16):
        state = init_spiral_state(
            model, jax.random.PRNGKey(0), (b, spec_len, cfg.num_features), tx
        )
        step = make_pretrain_step(model, cfg, tx)
        _, m = step(
            state, jax.tree.map(jnp.asarray, bb), jax.random.PRNGKey(1)
        )
        losses.append(float(jax.device_get(m["loss"])))
    assert losses[0] == losses[1], losses


def _mulaw_expand_host(q: np.ndarray) -> np.ndarray:
    """Exact host-side inverse of quantize_wire_mulaw's companding."""
    mu = 255.0
    y = q.astype(np.float32) / 127.5 - 1.0
    return np.sign(y) * (1.0 / mu) * (
        np.exp(np.abs(y) * np.log1p(mu)) - 1.0
    ).astype(np.float32)


def test_mulaw_roundtrip_snr_and_device_decode():
    """Opt-in 8-bit mu-law wire (quarter payload): companding round trip
    holds >= 30 dB SNR on speech-scale signals, and the on-device expansion
    matches the host inverse to f32 rounding."""
    from tpu_speech.train.spiral import quantize_wire, quantize_wire_mulaw

    rng = np.random.default_rng(5)
    # speech-like: broadband noise shaped to ~0.1 RMS with quiet passages
    w = (rng.standard_normal(16000) * 0.1 *
         (0.2 + 0.8 * rng.uniform(size=16000))).astype(np.float32)
    w = np.clip(w, -1.0, 1.0)
    q = quantize_wire_mulaw({"wavs": w[None]})["wavs"]
    assert q.dtype == np.uint8
    back = _mulaw_expand_host(q[0])
    snr = 10.0 * np.log10(
        float(np.mean(w ** 2)) / float(np.mean((back - w) ** 2)))
    assert snr >= 30.0, snr

    # device decode (wav_to_spec's uint8 branch) == host inverse
    dev = jax.jit(
        lambda u: jnp.sign(u.astype(jnp.float32) * (1.0 / 127.5) - 1.0)
        * (1.0 / 255.0)
        * (jnp.exp(jnp.abs(u.astype(jnp.float32) * (1.0 / 127.5) - 1.0)
                   * jnp.log1p(255.0)) - 1.0)
    )(jnp.asarray(q[0]))
    np.testing.assert_allclose(np.asarray(dev), back, atol=2e-7)

    # dispatcher surface
    assert quantize_wire({"wavs": w[None]}, "float32")["wavs"].dtype == np.float32
    assert quantize_wire({"wavs": w[None]}, "int16")["wavs"].dtype == np.int16
    assert quantize_wire({"wavs": w[None]}, "mulaw")["wavs"].dtype == np.uint8
    with pytest.raises(ValueError):
        quantize_wire({"wavs": w[None]}, "int8")


def test_pretrain_step_runs_on_mulaw_wire():
    """A pretrain step fed the uint8 wire runs end-to-end and lands near the
    float-wire loss (lossy companding: close, not equal)."""
    from tpu_speech.train.spiral import quantize_wire_mulaw

    cfg = dataclasses.replace(TINY_CFG, dither=0.0)
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(1e-3)
    b, n = 2, 20480
    from tpu_speech.train.spiral_runner import _spec_len

    spec_len = _spec_len(n, cfg.sample_rate)
    rng = np.random.default_rng(6)
    wavs = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)
    lens = np.full((b,), n, np.int32)
    batch = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(7),
    )
    batch_u8 = quantize_wire_mulaw(batch)
    assert batch_u8["wavs"].dtype == np.uint8

    losses = []
    for bb in (batch, batch_u8):
        state = init_spiral_state(
            model, jax.random.PRNGKey(0), (b, spec_len, cfg.num_features), tx
        )
        step = make_pretrain_step(model, cfg, tx)
        _, m = step(
            state, jax.tree.map(jnp.asarray, bb), jax.random.PRNGKey(1)
        )
        losses.append(float(jax.device_get(m["loss"])))
    assert np.isfinite(losses[1])
    assert abs(losses[0] - losses[1]) < 0.05 * max(abs(losses[0]), 1e-6), losses
