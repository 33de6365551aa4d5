"""wav2vec 2.0 pretraining model (reference:
SPIRAL/nemo/collections/asr/models/wav2vec/wav2vec_model.py:72-390 and
wav2vec_config.py) — the second self-supervised model family the reference
ships (present but, like Jasper, unreachable from its run_spiral CLI).

TPU-first redesign rather than a port:

- raw-waveform ConvFeatureEncoder as channels-last strided convs (the
  reference's fairseq extractor is (B, 1, S) channels-first Conv1d chains);
- the reference gathers masked frames into a dynamic "fake batch"
  (wav2vec_model.py:296-309, 360-366); here every tensor keeps its static
  (B, T, ...) shape and masked positions are selected by a 0/1 weight in the
  loss — identical objective, no dynamic shapes under jit;
- negatives are drawn per frame from the utterance's valid frames (the
  fixed-shape formulation shared with ST2Vec; the reference's default draws
  from the masked subset only, whose count is data-dependent — its
  `negatives_from_everywhere` option is the shape-static behaviour);
- the Gumbel codebook perplexity statistics are weighted by the mask instead
  of gathering (quantizer.py `weight` arg);
- `feature_grad_mult` becomes a custom-vjp gradient scaler.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_speech.models.spiral.encoder import TransformerCfg
from tpu_speech.models.spiral.quantizer import GumbelVectorQuantizer
from tpu_speech.models.spiral.wav2vec import TransformerEncoder


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Defaults = wav2vec 2.0 BASE (wav2vec_config.py:47-185)."""

    # conv feature extractor: (dim, kernel, stride) — 320x subsample to 20 ms
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2),
    )
    extractor_mode: str = "default"  # 'default' (group-norm 1st) | 'layer_norm'
    conv_bias: bool = False
    encoder: TransformerCfg = TransformerCfg(
        encoder_layers=12, embedding_dim=768, ffn_embedding_dim=3072,
        num_attention_heads=8, dropout=0.1, attention_dropout=0.1,
        activation_dropout=0.0, encoder_layerdrop=0.05,
        conv_pos=128, conv_pos_groups=16, layer_norm_first=False,
    )
    dropout_input: float = 0.1
    dropout_features: float = 0.1
    final_dim: int = 256
    logit_temp: float = 0.1
    n_negatives: int = 100
    feature_grad_mult: float = 0.1
    # quantizer (wav2vec_config.py:89-108)
    quantize_targets: bool = True
    latent_vars: int = 320
    latent_groups: int = 2
    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    # masking (wav2vec_config.py:128-156)
    mask_prob: float = 0.65
    mask_length: int = 10
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 10
    # loss weights (wav2vec_config.py:122-125)
    prob_ppl_weight: float = 0.1
    feature_loss_weight: float = 0.0


def wav2vec2_base_config(**overrides) -> Wav2Vec2Config:
    return Wav2Vec2Config(**overrides)


@jax.custom_vjp
def grad_multiply(x, scale):
    return x


def _gm_fwd(x, scale):
    return x, scale


def _gm_bwd(scale, g):
    return g * scale, None


grad_multiply.defvjp(_gm_fwd, _gm_bwd)


def conv_subsampled_lens(cfg: Wav2Vec2Config, wav_lens):
    """Valid output lengths through the (no-padding) conv stack
    (fairseq get_subsampled_lens semantics)."""
    lens = wav_lens
    for _, k, s in cfg.conv_layers:
        lens = (lens - k) // s + 1
    return jnp.maximum(lens, 0)


class ConvFeatureEncoder(nn.Module):
    """Raw wav -> frame features via strided valid convs
    (fairseq ConvFeatureExtractionModel; channels-last here)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, wavs, train: bool = False):
        x = wavs[:, :, None]  # (B, S, 1)
        for i, (dim, k, s) in enumerate(self.cfg.conv_layers):
            x = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID",
                use_bias=self.cfg.conv_bias, name=f"conv_{i}",
            )(x)
            if self.cfg.extractor_mode == "layer_norm":
                x = nn.LayerNorm(name=f"ln_{i}")(x)
            elif i == 0:  # 'default': instance-norm on the first block only
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=1e-5, name="gn_0"
                )(x)
            x = nn.gelu(x, approximate=False)  # torch nn.GELU is exact-erf
        return x  # (B, T, C)


class Wav2Vec2Model(nn.Module):
    """Pretraining forward (wav2vec_model.py:263-375): conv-extract,
    layer-norm, project, mask, transformer-contextualize; quantized targets
    from the unmasked features. All outputs keep (B, T, ...) static shapes;
    masked positions are marked by the returned `loss_weight`."""

    cfg: Wav2Vec2Config

    def setup(self):
        c = self.cfg
        self.feature_extractor = ConvFeatureEncoder(c, name="feature_extractor")
        self.layer_norm = nn.LayerNorm(name="layer_norm")
        embed = c.conv_layers[-1][0]
        self.post_extract_proj = (
            nn.Dense(c.encoder.embedding_dim, name="post_extract_proj")
            if embed != c.encoder.embedding_dim else None
        )
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(1.0),
            (c.encoder.embedding_dim,),
        )
        e = c.encoder
        self.encoder = TransformerEncoder(
            e.embedding_dim, e.encoder_layers, e.ffn_embedding_dim,
            e.num_attention_heads, e.dropout, e.attention_dropout,
            e.activation_dropout, e.activation_fn, e.layer_norm_first,
            e.encoder_layerdrop, e.conv_pos, e.conv_pos_groups,
            name="encoder",
        )
        if c.quantize_targets:
            self.quantizer = GumbelVectorQuantizer(
                dim=embed, num_vars=c.latent_vars, groups=c.latent_groups,
                vq_dim=c.final_dim, temp=c.latent_temp, name="quantizer",
            )
        self.project_q = nn.Dense(c.final_dim, name="project_q")
        self.final_proj = nn.Dense(c.final_dim, name="final_proj")
        self.dropout_input_mod = nn.Dropout(c.dropout_input)
        self.dropout_features_mod = nn.Dropout(c.dropout_features)

    def __call__(self, wavs, wav_lens, time_mask=None, num_updates=0,
                 train: bool = False, features_only: bool = False):
        """wavs (B, S); time_mask (B, T) bool (host-side compute_mask_indices,
        None disables masking). Returns `features_only`: (context, feat_lens);
        else dict(logits, targets, feat_lens, loss_weight, features_penalty,
        prob_ppl_loss, cur_temp, prob_ppl)."""
        c = self.cfg
        if c.feature_grad_mult > 0:
            features = self.feature_extractor(wavs, train=train)
            if c.feature_grad_mult != 1.0:
                features = grad_multiply(features, c.feature_grad_mult)
        else:
            features = jax.lax.stop_gradient(
                self.feature_extractor(wavs, train=train)
            )
        feat_lens = conv_subsampled_lens(c, wav_lens)
        t = features.shape[1]
        valid = (jnp.arange(t)[None, :] < feat_lens[:, None])  # (B, T)

        features_penalty = (
            jnp.sum(jnp.where(valid[:, :, None], features, 0.0) ** 2)
            / jnp.maximum(jnp.sum(valid) * features.shape[-1], 1.0)
        )

        features = self.layer_norm(features)
        unmasked_features = features

        if self.post_extract_proj is not None:
            features = self.post_extract_proj(features)
        features = self.dropout_input_mod(features, deterministic=not train)
        unmasked_features = self.dropout_features_mod(
            unmasked_features, deterministic=not train
        )

        if time_mask is not None:
            x = jnp.where(
                time_mask[:, :, None],
                self.mask_emb.astype(features.dtype)[None, None, :],
                features,
            )
        else:
            x = features

        context = self.encoder(x, padding_mask=~valid, train=train)
        if features_only:
            return context, feat_lens

        if c.quantize_targets:
            weight = (
                (time_mask & valid).astype(jnp.float32)
                if time_mask is not None else valid.astype(jnp.float32)
            )
            targets, prob_ppl_loss, cur_temp, prob_ppl = self.quantizer(
                unmasked_features, num_updates, train=train, weight=weight,
            )
            targets = self.project_q(targets)
        else:
            targets = self.project_q(unmasked_features)
            prob_ppl_loss = jnp.zeros(())
            cur_temp = jnp.zeros(())
            prob_ppl = jnp.zeros(())

        logits = self.final_proj(context)
        loss_weight = (
            (time_mask & valid) if time_mask is not None else valid
        ).astype(jnp.float32)
        return {
            "logits": logits,
            "targets": targets,
            "feat_lens": feat_lens,
            "loss_weight": loss_weight,
            "features_penalty": features_penalty,
            "prob_ppl_loss": prob_ppl_loss,
            "cur_temp": cur_temp,
            "prob_ppl": prob_ppl,
        }

    def extract_features(self, wavs, wav_lens, train: bool = False):
        """Contextual features for downstream heads (CTC finetune); the
        pretraining-only modules (quantizer/project_q/final_proj) are simply
        unused — the analog of remove_pretraining_modules
        (wav2vec_model.py:379-384)."""
        return self(wavs, wav_lens, time_mask=None, train=train,
                    features_only=True)


class Wav2Vec2CTCModel(nn.Module):
    """wav2vec 2.0 encoder + conv CTC head — the reference's wav2vec
    finetune wrapper (spec2vec/ctc_finetune_model.py:42-73; shipped but
    gated off by the `encoder_type == 'st'` assert in ctc_finetune.py:89).
    Encoder-freeze-for-N-updates becomes a stop_gradient gate like the
    SPIRAL finetune model."""

    cfg: Wav2Vec2Config
    num_classes: int
    blank_pos: str = "after_vocab_last"

    @property
    def blank_idx(self) -> int:
        if self.blank_pos == "vocab_first":
            return 0
        if self.blank_pos == "after_vocab_last":
            return self.num_classes
        return self.num_classes - 1

    def setup(self):
        from tpu_speech.models.spiral.ctc import ConvASRDecoder

        self.encoder = Wav2Vec2Model(self.cfg, name="encoder")
        self.decoder = ConvASRDecoder(
            self.num_classes, blank_pos=self.blank_pos, name="decoder"
        )

    def __call__(self, wavs, wav_lens, time_mask=None, train: bool = False,
                 freeze_encoder: bool = False):
        """time_mask: optional host span mask — the reference masks during
        finetune training as a SpecAugment-style regularizer
        (ctc_finetune_model.py:56 `mask=self.training`)."""
        ctx, feat_lens = self.encoder(
            wavs, wav_lens, time_mask=time_mask, train=train,
            features_only=True,
        )
        if freeze_encoder:
            ctx = jax.lax.stop_gradient(ctx)
        return self.decoder(ctx, feat_lens, train=train)


def load_wav2vec_pretrained_encoder(finetune_params, pretrain_params):
    """Graft pretrained wav2vec params into the finetune composite (the
    reference's param-prefix-strip load, ctc_finetune.py:511-533); the
    pretraining-only modules are dropped."""
    drop = {"quantizer", "project_q", "final_proj"}
    encoder = {k: v for k, v in pretrain_params.items() if k not in drop}
    out = dict(finetune_params)
    out["encoder"] = encoder
    return out
