"""Guard: jitted hot-path programs must not close over device arrays.

A device array captured by a jitted function is embedded as an MLIR
CONSTANT at lowering time: jax fetches its value back to the host (a
blocking round trip per leaf on remote-device harnesses) and inlines the
bytes into the program. Round 4 hit both failure modes: a closed-over
128-float mask embedding stalled SPIRAL step lowering for 30+ minutes on
the tunneled dev chip, and the streaming step closed over the full ~100 M
param tree — a ~400 MB program that exceeded the remote compiler's request
limit (HTTP 413). Host constants must stay numpy (lowered directly, no
fetch); big trees must be jit ARGUMENTS.

The guard counts jax.Array constant-handler hits while lowering each hot
step and allows none.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


@contextlib.contextmanager
def _count_device_constants():
    # private-surface dependency: a JAX upgrade renaming either symbol
    # should read as "guard needs porting", not as a hot-path regression
    try:
        import jax._src.array as jarray
        import jax._src.interpreters.mlir as mlir

        orig = jarray._array_mlir_constant_handler
        jarray.ArrayImpl, mlir.register_constant_handler
    except (ImportError, AttributeError) as e:  # pragma: no cover
        pytest.skip(f"JAX private constant-handler surface moved: {e}")

    calls = []

    def patched(val, *a, **k):
        calls.append((val.shape, str(val.dtype), val.nbytes))
        return orig(val, *a, **k)

    mlir.register_constant_handler(jarray.ArrayImpl, patched)
    try:
        yield calls
    finally:
        mlir.register_constant_handler(jarray.ArrayImpl, orig)


def test_spiral_pretrain_step_has_no_device_constants():
    from tests.test_spiral_pretrain import TINY_CFG
    from tpu_speech.models.spiral.st2vec import ST2VecEncoder
    from tpu_speech.train.spiral import (
        host_augment_batch,
        init_spiral_state,
        make_pretrain_step,
    )

    from tpu_speech.train.spiral_runner import _spec_len

    cfg = TINY_CFG
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(1e-3)
    b, crop = 2, 20480
    spec_len = _spec_len(crop, cfg.sample_rate)
    wavs = np.zeros((b, crop), np.float32)
    lens = np.full((b,), wavs.shape[1], np.int32)
    batch = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(0))
    batch = jax.tree.map(jnp.asarray, batch)
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (b, spec_len, cfg.num_features), tx)
    step = make_pretrain_step(model, cfg, tx)
    with _count_device_constants() as calls:
        jax.jit(step, donate_argnums=(0,)).lower(
            state, batch, jax.random.PRNGKey(1))
    assert not calls, f"device-array constants embedded: {calls}"


def test_stream_step_has_no_device_constants_and_small_hlo():
    import dataclasses

    from tests.test_spiral_pretrain import TINY_CFG

    from tpu_speech.models.spiral.ctc import CTCFinetuneModel
    from tpu_speech.models.spiral.encoder import ConvLayerCfg, StreamingCfg
    from tpu_speech.models.spiral.streaming import feat_spec, make_stream_step

    cfg = dataclasses.replace(
        TINY_CFG, streaming=StreamingCfg(chunk_frames=32, left_chunks=1))
    model = CTCFinetuneModel(
        cfg, 29, "vocab_first",
        decoder_convs=(ConvLayerCfg(32, (5,), (1,), None, "relu", 0.0),),
    )
    spec_len = 64
    specs = jnp.zeros((1, spec_len, cfg.num_features))
    lens = jnp.full((1,), spec_len, dtype=jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, specs, lens, train=False)
    feat = feat_spec(sample_rate=cfg.sample_rate, nfilt=cfg.num_features)
    init_state, step = make_stream_step(model, variables["params"], feat=feat)
    hop = int(0.01 * cfg.sample_rate)
    window = jnp.zeros((1, 32 * hop + feat.overlap))
    n_valid = jnp.full((1,), 32, dtype=jnp.int32)
    st = init_state(1)
    with _count_device_constants() as calls:
        # lower the INNER jit with params as arguments — re-jitting the
        # bound wrapper would re-capture params as constants (the exact
        # hazard make_stream_step documents)
        step._jit_step.lower(step._params, st, window, n_valid)
    big = [c for c in calls if c[2] > 4096]
    assert not big, f"large device-array constants embedded: {big}"


def test_gradtts_train_step_has_no_device_constants():
    from tpu_speech.models.grad_tts import GradTTS
    from tpu_speech.text import symbols
    from tpu_speech.train.gradtts import make_train_step
    from tpu_speech.train.state import TrainState

    model = GradTTS(n_vocab=len(symbols) + 1)
    rng = np.random.default_rng(0)
    b, t_x, t_y = 2, 12, 64
    batch = {
        "x": jnp.asarray(rng.integers(
            1, len(symbols), size=(b, t_x)).astype(np.int32)),
        "x_lengths": jnp.full((b,), t_x, dtype=jnp.int32),
        "y": jnp.asarray(rng.standard_normal((b, t_y, 80)).astype(np.float32)),
        "y_lengths": jnp.full((b,), t_y, dtype=jnp.int32),
    }
    params = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, batch["x"][:1],
        batch["x_lengths"][:1], batch["y"][:1], jnp.array([t_y]),
        jax.random.PRNGKey(1), train=False,
    )
    tx = optax.adam(1e-4)
    state = TrainState.create({"params": params["params"]}, tx)
    step = make_train_step(model, tx, out_size=None)
    with _count_device_constants() as calls:
        jax.jit(step, donate_argnums=(0,)).lower(
            state, batch, jax.random.PRNGKey(2))
    assert not calls, f"device-array constants embedded: {calls}"
