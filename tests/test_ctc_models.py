"""EncDecCTCModel (Jasper/QuartzNet conv-CTC family, reference
ctc_models.py): featurize -> encode -> decode -> CTC train step + greedy
decode plumbing."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpu_speech.eval.wer import ctc_greedy_decode
from tpu_speech.models.spiral.ctc_models import (
    EncDecCTCConfig,
    EncDecCTCModel,
    init_ctc_state,
    make_ctc_train_step,
    quartznet5x3_blocks,
)
from tpu_speech.models.spiral.jasper import JasperBlockCfg

TINY = EncDecCTCConfig(
    num_classes=5,
    blocks=(
        JasperBlockCfg(8, 5, repeat=1, stride=2, residual=False,
                       separable=True, dropout=0.0),
        JasperBlockCfg(8, 5, repeat=2, dropout=0.0),
    ),
    n_mels=12,
    decoder_filters=16,
)


def test_featurize_and_forward(rng):
    model = EncDecCTCModel(TINY)
    wavs = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
    lens = jnp.array([3200, 1600], dtype=jnp.int32)
    specs, spec_lens = model.featurize(wavs, lens)
    assert specs.shape[0] == 2 and specs.shape[2] == TINY.n_mels
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        specs, spec_lens,
    )
    log_probs, out_lens = model.apply(params, specs, spec_lens)
    # blank appended after vocab (NeMo CTC convention)
    assert log_probs.shape[-1] == TINY.num_classes + 1
    assert model.blank_idx == TINY.num_classes
    # log-softmax output
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_probs).sum(-1)), 1.0, atol=1e-4
    )
    # stride-2 first block halves the time axis
    assert int(out_lens[0]) == (int(spec_lens[0]) + 1) // 2


def test_ctc_train_step_and_decode(rng):
    model = EncDecCTCModel(TINY)
    tx = optax.adamw(1e-3)
    b, t = 2, 40
    state = init_ctc_state(model, jax.random.PRNGKey(0), (b, t, TINY.n_mels), tx)
    batch = {
        "specs": jnp.asarray(rng.standard_normal((b, t, TINY.n_mels)).astype(np.float32)),
        "spec_lens": jnp.array([t, t - 8], dtype=jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 5, size=(b, 6)).astype(np.int32)),
        "label_lens": jnp.array([6, 4], dtype=jnp.int32),
    }
    step = make_ctc_train_step(model, tx, grad_clip=1.0)
    losses = []
    for i in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(jax.device_get(m["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizes on the fixed batch
    log_probs, out_lens = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["specs"], batch["spec_lens"]
    )
    hyps = ctc_greedy_decode(
        np.asarray(log_probs), np.asarray(out_lens), blank_idx=model.blank_idx
    )
    assert len(hyps) == b
    assert all(model.blank_idx not in h for h in hyps)


def test_quartznet_preset_shapes():
    blocks = quartznet5x3_blocks(16)
    assert len(blocks) == 5
    assert blocks[0].stride == 2 and blocks[0].separable


def test_ctc_bpe_model_and_decode(rng, tmp_path):
    """EncDecCTCModelBPE analog: vocab size comes from the tokenizer, decode
    goes through tokenizer.ids_to_text (reference ctc_bpe_models.py:60-90 +
    metrics/wer_bpe.py)."""
    from tpu_speech.models.spiral.ctc_models import (
        decode_ctc_bpe,
        make_ctc_bpe_model,
    )
    from tpu_speech.text.tokenizers import SubwordTokenizer

    vocab = tmp_path / "vocab.txt"
    vocab.write_text(
        "\n".join(["<unk>", "▁the", "▁cat", "▁s", "at", "s"]),
        encoding="utf-8",
    )
    tok = SubwordTokenizer(str(vocab))
    model = make_ctc_bpe_model(
        tok, blocks=TINY.blocks, n_mels=12, decoder_filters=16
    )
    assert model.cfg.num_classes == tok.vocab_size
    assert model.blank_idx == tok.vocab_size  # appended after vocab

    specs = jnp.asarray(rng.standard_normal((2, 24, 12)).astype(np.float32))
    spec_lens = jnp.array([24, 16], dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        specs, spec_lens,
    )
    log_probs, out_lens = model.apply(params, specs, spec_lens)
    assert log_probs.shape[-1] == tok.vocab_size + 1
    texts = decode_ctc_bpe(log_probs, out_lens, tok, model.blank_idx)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
    # round trip sanity: tokenizer inverts its own encoding
    assert tok.ids_to_text(tok.text_to_ids("the cat sat")) == "the cat sat"
