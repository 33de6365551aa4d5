"""Jasper/QuartzNet-style end-to-end CTC ASR model (reference:
SPIRAL/nemo/collections/asr/models/ctc_models.py:EncDecCTCModel — the NeMo
conv-CTC family the fork carries alongside SPIRAL; shipped but unreachable
from its run_spiral CLI, like jasper.py itself).

Composition is the reference's: mel featurizer (AudioToMelSpectrogram
preprocessor) -> ConvASREncoder (Jasper blocks) -> ConvASRDecoder ->
log-probs -> CTC. Everything runs as one jitted graph on static shapes;
SpecAugment-style masking is host-provided like the SPIRAL models.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpu_speech.models.spiral.ctc import ConvASRDecoder, ctc_loss
from tpu_speech.models.spiral.features import filterbank_features
from tpu_speech.models.spiral.jasper import ConvASREncoder, JasperBlockCfg


def quartznet5x3_blocks(filters: int = 256) -> Tuple[JasperBlockCfg, ...]:
    """A compact QuartzNet-style preset (separable repeated convs with
    residuals; the reference's block zoo is YAML-driven in upstream NeMo and
    not shipped in the fork, so this preset stands in for smoke/recipe use)."""
    return (
        JasperBlockCfg(filters, 33, repeat=1, stride=2, residual=False,
                       separable=True),
        JasperBlockCfg(filters, 33, repeat=3, separable=True),
        JasperBlockCfg(filters, 39, repeat=3, separable=True),
        JasperBlockCfg(filters * 2, 51, repeat=3, separable=True),
        JasperBlockCfg(filters * 2, 87, repeat=1, residual=False,
                       separable=True, dilation=2),
    )


@dataclasses.dataclass(frozen=True)
class EncDecCTCConfig:
    num_classes: int
    blocks: Tuple[JasperBlockCfg, ...] = quartznet5x3_blocks()
    sample_rate: int = 16000
    n_mels: int = 64
    window_size: float = 0.02
    window_stride: float = 0.01
    blank_pos: str = "after_vocab_last"  # NeMo CTC: blank appended last
    decoder_filters: int = 1024
    dither: float = 1e-5


class EncDecCTCModel(nn.Module):
    """wav (B, S) -> CTC log-probs (B, T, V+1) (ctc_models.py forward:
    preprocessor -> encoder -> decoder)."""

    cfg: EncDecCTCConfig

    def setup(self):
        c = self.cfg
        self.encoder = ConvASREncoder(c.blocks, name="encoder")
        from tpu_speech.models.spiral.encoder import ConvLayerCfg

        self.decoder = ConvASRDecoder(
            num_classes=c.num_classes,
            conv_layers=(
                ConvLayerCfg(c.decoder_filters, (1,), (1,), None, "relu", 0.0),
            ),
            blank_pos=c.blank_pos,
            name="decoder",
        )

    @property
    def blank_idx(self) -> int:
        if self.cfg.blank_pos == "vocab_first":
            return 0
        return self.cfg.num_classes  # appended after vocab

    def featurize(self, wavs, wav_lens, train: bool = False, rng=None):
        return filterbank_features(
            wavs, wav_lens, sample_rate=self.cfg.sample_rate,
            window_size=self.cfg.window_size,
            window_stride=self.cfg.window_stride, nfilt=self.cfg.n_mels,
            dither=self.cfg.dither, training=train, rng=rng,
        )

    def __call__(self, specs, spec_lens, train: bool = False):
        feats, feat_lens = self.encoder(specs, spec_lens, train=train)
        log_probs, out_lens = self.decoder(feats, feat_lens, train=train)
        return log_probs, out_lens


def make_ctc_bpe_model(tokenizer,
                       blocks: Tuple[JasperBlockCfg, ...] = None,
                       **cfg_overrides) -> EncDecCTCModel:
    """EncDecCTCModelBPE analog (reference ctc_bpe_models.py:60-90): the
    conv-CTC model with a subword tokenizer supplying the vocabulary size;
    blank appended after the vocab, exactly as the reference initializes
    `cfg.decoder.vocabulary` from `tokenizer.get_vocab()`."""
    cfg = EncDecCTCConfig(
        num_classes=tokenizer.vocab_size,
        blocks=blocks if blocks is not None else quartznet5x3_blocks(),
        **cfg_overrides,
    )
    return EncDecCTCModel(cfg)


def decode_ctc_bpe(log_probs, out_lens, tokenizer, blank_idx: int):
    """Greedy decode to text via the tokenizer — the WERBPE decode path
    (reference metrics/wer_bpe.py: ctc_decoder_predictions_tensor uses
    tokenizer.ids_to_text instead of a char vocabulary)."""
    import numpy as np

    from tpu_speech.eval.wer import ctc_greedy_decode

    ids = ctc_greedy_decode(
        np.asarray(log_probs), np.asarray(out_lens), blank_idx
    )
    return [tokenizer.ids_to_text(seq) for seq in ids]


def init_ctc_state(model: EncDecCTCModel, rng, input_shape, tx):
    from tpu_speech.models.spiral.ctc import CTCTrainState

    specs = jnp.zeros(input_shape)
    lens = jnp.full((input_shape[0],), input_shape[1], dtype=jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, specs, lens)
    return CTCTrainState(
        jnp.zeros((), jnp.int32), variables["params"],
        variables.get("batch_stats", {}), tx.init(variables["params"]),
    )


def make_ctc_train_step(model: EncDecCTCModel, tx,
                        grad_clip: Optional[float] = None):
    """One donated jit step: featurized specs + CTC targets -> update (the
    reference trains via ModelPT/PTL training_step; Jasper BN statistics ride
    the flax batch_stats collection)."""
    from tpu_speech.models.spiral.ctc import CTCTrainState

    def loss_fn(params, batch_stats, batch, rng):
        (log_probs, out_lens), updated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["specs"], batch["spec_lens"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss = ctc_loss(
            log_probs, out_lens, batch["labels"], batch["label_lens"],
            model.blank_idx,
        )
        return loss, ({"loss": loss}, updated.get("batch_stats", {}))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: "CTCTrainState", batch, rng):
        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            CTCTrainState(state.step + 1, new_params, new_bs, opt_state),
            metrics,
        )

    return step
