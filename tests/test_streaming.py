"""Streaming (chunk-incremental) inference == offline streaming-mode model.

The guarantee under test: a CTCFinetuneModel built with
ST2VecConfig(streaming=StreamingCfg(...)) — causal convs, causal positional
conv, block-chunked attention, causal cumulative feature normalization —
produces EXACTLY the same log-probs whether run offline over the whole
utterance or chunk by chunk through make_stream_step's carried caches
(KV caches, conv tails, normalization stats). That is train/serve parity by
construction; the reference ships fairseq incremental-state attention unused
(SPIRAL/nemo/collections/asr/parts/multihead_attention.py:15-465).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_speech.models.spiral.ctc import CTCFinetuneModel
from tpu_speech.models.spiral.encoder import (
    ConvLayerCfg,
    ConvTransformerBlockCfg,
    StreamingCfg,
    TransformerCfg,
)
from tpu_speech.models.spiral.features import filterbank_features
from tpu_speech.models.spiral.st2vec import ST2VecConfig
from tpu_speech.models.spiral.streaming import (
    StreamingTranscriber,
    make_stream_step,
)
from tpu_speech.models.spiral.wav2vec import chunked_attention_mask

CHUNK = 16          # spec frames per streaming chunk
HOP = 160
NFILT = 16


def tiny_streaming_model(chunk=CHUNK, left=2):
    blocks = (
        ConvTransformerBlockCfg(
            conv_layers=(
                ConvLayerCfg(24, (5,), (2,), "ln", "relu", 0.0),
                ConvLayerCfg(24, (1,), (1,), "ln", None, 0.0),
            ),
            transformer=TransformerCfg(
                2, 24, 48, 2, 0.0, attention_dropout=0.0,
                conv_pos=8, conv_pos_groups=2,
            ),
        ),
        ConvTransformerBlockCfg(
            conv_layers=(ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),),
            transformer=TransformerCfg(
                1, 32, 64, 2, 0.0, attention_dropout=0.0,
                conv_pos=8, conv_pos_groups=2,
            ),
        ),
    )
    cfg = ST2VecConfig(
        blocks=blocks, num_features=NFILT,
        streaming=StreamingCfg(chunk_frames=chunk, left_chunks=left),
    )
    model = CTCFinetuneModel(
        encoder_cfg=cfg, num_classes=6,
        decoder_convs=(ConvLayerCfg(16, (5,), (1,), None, "relu", 0.0),),
        upsample_rate=2, upsample_filters=16,
    )
    return model, cfg


def offline_feats(wav, lens):
    """Streaming-mode featurizer, offline: causal cumulative normalization,
    no utterance-global time-domain normalization, no dither."""
    feats, feat_lens = filterbank_features(
        jnp.asarray(wav), jnp.asarray(lens), sample_rate=16000, nfilt=NFILT,
        normalize="per_feature_causal", do_normalize_time_domain=False,
        pad_to=0,
    )
    return feats, feat_lens


def preemph_padded(wav):
    """Host-side preemphasis + symmetric 256-sample reflect pad, mirroring
    features.filterbank_features:86-92 (n_fft=512 at 16 kHz / 20 ms)."""
    p = wav.copy()
    p[:, 1:] = wav[:, 1:] - 0.97 * wav[:, :-1]
    return np.pad(p, ((0, 0), (256, 256)), mode="reflect")


def init_model(model, t_frames, batch=2, seed=0):
    specs = jnp.zeros((batch, t_frames, NFILT))
    lens = jnp.full((batch,), t_frames, dtype=jnp.int32)
    variables = jax.jit(
        model.init, static_argnames=("train",)
    )(jax.random.PRNGKey(seed), specs, lens, train=False)
    return variables["params"]


def test_chunked_attention_mask_shape():
    m = np.asarray(chunked_attention_mask(8, 2, 1))
    # frame 5 is in chunk 2: sees chunks 1..2 -> frames 2..5
    assert list(np.nonzero(m[5])[0]) == [2, 3, 4, 5]
    # frame 0 (chunk 0): itself and frame 1 only
    assert list(np.nonzero(m[0])[0]) == [0, 1]
    # no future chunks
    assert not m[3, 4]


def test_streaming_step_matches_offline_full_chunks():
    model, cfg = tiny_streaming_model()
    rng = np.random.default_rng(0)
    n_chunks, batch = 4, 2
    n = n_chunks * CHUNK * HOP
    wav = rng.standard_normal((batch, n)).astype(np.float32) * 0.1

    t = n_chunks * CHUNK
    feats, feat_lens = offline_feats(wav, np.full((batch,), n, np.int64))
    params = init_model(model, t, batch)
    off_logp, off_lens = model.apply(
        {"params": params}, feats[:, :t], jnp.asarray(feat_lens),
        train=False,
    )

    init_state, step = make_stream_step(model, params)
    state = init_state(batch)
    padded = preemph_padded(wav)
    w = CHUNK * HOP
    got = []
    for j in range(n_chunks):
        window = jnp.asarray(padded[:, j * w:j * w + w + 352])
        state, logp, _, lens = step(
            state, window, jnp.full((batch,), CHUNK, np.int32)
        )
        got.append(np.asarray(logp))
    got = np.concatenate(got, axis=1)

    off = np.asarray(off_logp)
    assert got.shape[1] == int(off_lens[0])
    np.testing.assert_allclose(got, off[:, :got.shape[1]], atol=2e-4)


def test_streaming_transcriber_matches_offline_greedy():
    """Arbitrary feed sizes + a partial final chunk through flush(): the
    collapsed greedy ids equal the offline streaming-mode model's."""
    model, cfg = tiny_streaming_model()
    rng = np.random.default_rng(1)
    batch = 1
    n = int(3.4 * CHUNK * HOP)  # NOT a whole number of chunks
    wav = rng.standard_normal((batch, n)).astype(np.float32) * 0.1

    feats, feat_lens = offline_feats(wav, np.full((batch,), n, np.int64))
    t_total = int(feat_lens[0])
    params = init_model(model, feats.shape[1], batch)
    off_logp, off_lens = model.apply(
        {"params": params}, feats, jnp.asarray(feat_lens), train=False,
    )
    ids = np.argmax(np.asarray(off_logp)[0, :int(off_lens[0])], axis=-1)
    ref, prev = [], -1
    for tok in ids:
        if tok != model.blank_idx and tok != prev:
            ref.append(int(tok))
        prev = tok

    tr = StreamingTranscriber(model, params, batch=batch)
    pos, sizes = 0, [1000, 3171, 40, 2500, 9000]
    i = 0
    while pos < n:
        step_n = min(sizes[i % len(sizes)], n - pos)
        tr.feed(wav[:, pos:pos + step_n])
        pos += step_n
        i += 1
    got = tr.flush()[0]
    assert got == ref


@pytest.mark.slow
def test_run_spiral_streaming_eval_cli(tmp_path):
    """The product surface: `run_spiral.py --run_mode=test --streaming_eval`
    on a streaming-mode config decodes the test manifest through the
    chunk-incremental transcriber."""
    import json
    import os
    import sys

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    sys.path.insert(0, os.path.join(repo, "cli"))
    import run_spiral

    from tpu_speech.data.wav import write_wav

    sr = 16000
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    entries = []
    for i in range(3):
        wav = (rng.standard_normal(int(sr * 0.6)) * 0.1).astype(np.float32)
        p = str(data / f"utt{i}.wav")
        write_wav(p, wav, sr)
        entries.append(
            {"audio_filepath": p, "duration": 0.6, "text": "hello world"}
        )
    with open(data / "manifest.json", "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    run_spiral.main([
        "--config_name=spiral_tiny_stream_test",
        "--manifest_dir", str(data),
        "--model_save_dir", str(tmp_path / "logs"),
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--streaming_eval=true",
        "--resume_if_exists=false",
    ])


def test_streaming_mode_trains():
    """The streaming-mode model is an ordinary offline forward: it must
    init/apply under jit with gradients (train/serve parity trainability)."""
    model, cfg = tiny_streaming_model()
    batch, t = 2, 4 * CHUNK
    rng = np.random.default_rng(2)
    specs = jnp.asarray(rng.standard_normal((batch, t, NFILT)).astype(np.float32))
    lens = jnp.full((batch,), t, dtype=jnp.int32)
    params = init_model(model, t, batch)

    def loss_fn(p):
        logp, _ = model.apply(
            {"params": p}, specs, lens, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.mean(jnp.square(logp))

    g = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)
