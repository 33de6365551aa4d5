"""ST2Vec: SPIRAL's teacher-student perturbation-invariant pretraining core.

TPU-native re-design of
SPIRAL/nemo/collections/asr/models/st2vec/st2vec_model.py:66-606. Differences
that matter on TPU:

- the teacher position shift (RandomShift, :425-510) keeps a static buffer of
  T + 2*max_shift spec frames and uses dynamic_update_slice / dynamic_slice
  with traced shift amounts instead of shape-changing pads;
- the "flatten valid frames into a fake batch" negative sampling (:375-413)
  becomes a fixed-shape per-frame gather with validity masks: every (b, t)
  samples n_negatives indices uniformly from the same utterance's valid
  frames excluding t;
- the EMA teacher is a separate parameter tree updated by a pytree lerp in the
  jitted train step (ema_update :568-571, cosine momentum schedule :588-606);
- span/channel mask indices are computed host-side (numpy, as the reference
  does) and passed into the step as boolean arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_speech.models.spiral.encoder import (
    ConvLayerCfg,
    ConvTransformerBlockCfg,
    FeatureEncoder,
    Projector,
    StreamingCfg,
    TransformerCfg,
    spiral_base_blocks,
)
from tpu_speech.models.spiral.features import filterbank_features
from tpu_speech.utils.typing_contracts import typecheck


@dataclasses.dataclass(frozen=True)
class ST2VecConfig:
    blocks: Tuple[ConvTransformerBlockCfg, ...]
    num_features: int = 128
    sample_rate: int = 16000
    projector_dim: int = 256
    predictor_convs: Tuple[ConvLayerCfg, ...] = (
        ConvLayerCfg(256, (5,), (1,), "bn", "relu", 0.0, bias=None),
        ConvLayerCfg(256, (5,), (1,), "bn", "relu", 0.0, bias=None),
    )
    n_negatives: int = 100
    logit_temp: float = 0.3
    shift_unit: int = 8  # spec frames per feature frame (subsample factor)
    max_shift: int = 16  # max teacher shift in units
    target_momentum: float = 0.995
    target_momentum_final: float = 1.0
    target_momentum_steps: int = 200000
    mask_prob: float = 0.5
    mask_length: int = 20
    mask_channel_prob: float = 0.4
    mask_channel_length: int = 20
    dither: float = 1e-5  # train-only waveform dither (features.py CONSTANT)
    # streaming-trainable encoder mode (causal convs + chunked attention);
    # see encoder.StreamingCfg and models/spiral/streaming.py
    streaming: Optional[StreamingCfg] = None


def spiral_base_config(**overrides) -> ST2VecConfig:
    return ST2VecConfig(blocks=spiral_base_blocks(), **overrides)


def spiral_large_config(**overrides) -> ST2VecConfig:
    """SPIRAL-large (spiral_large_pretrain_librilight.py:36-158): 1024-d
    encoder, 512-d projector/predictor, EMA momentum 0.99 -> 0.999."""
    from tpu_speech.models.spiral.encoder import spiral_large_blocks

    kw = dict(
        blocks=spiral_large_blocks(),
        projector_dim=512,
        predictor_convs=(
            ConvLayerCfg(512, (5,), (1,), "bn", "relu", 0.0, bias=None),
            ConvLayerCfg(512, (5,), (1,), "bn", "relu", 0.0, bias=None),
        ),
        target_momentum=0.99,
        target_momentum_final=0.999,
    )
    kw.update(overrides)
    return ST2VecConfig(**kw)


class ST2VecEncoder(nn.Module):
    """Student tower: feature encoder -> projector -> predictor.

    The teacher tower reuses ``encode_teacher`` with its own (EMA) params.
    """

    cfg: ST2VecConfig

    def setup(self):
        self.feature_encoder = FeatureEncoder(
            self.cfg.blocks, streaming=self.cfg.streaming
        )
        self.projector = Projector(output_dim=self.cfg.projector_dim)
        self.predictor = Projector(
            conv_layers=self.cfg.predictor_convs,
            output_dim=self.cfg.projector_dim,
        )

    @typecheck(specs="B T F @spec", spec_lens="B @lengths")
    def encode_student(self, specs, spec_lens, train: bool = False):
        feats, feat_lens = self.feature_encoder(specs, spec_lens, train=train)
        proj = self.projector(feats, feat_lens, train=train)
        pred = self.predictor(proj, feat_lens, train=train)
        return pred, feat_lens

    @typecheck(specs="B T F @spec", spec_lens="B @lengths")
    def encode_teacher(self, specs, spec_lens, train: bool = False):
        feats, feat_lens = self.feature_encoder(specs, spec_lens, train=train)
        proj = self.projector(feats, feat_lens, train=train)
        return proj, feat_lens

    @typecheck(specs="B T F @spec", spec_lens="B @lengths")
    def encode_features(self, specs, spec_lens, train: bool = False):
        """features_only path (CTC finetune): encoder output, no projector."""
        return self.feature_encoder(specs, spec_lens, train=train)

    def __call__(self, specs, spec_lens, train: bool = False):
        return self.encode_student(specs, spec_lens, train=train)


def teacher_param_subset(params):
    """Subtree the EMA teacher mirrors (feature_encoder + projector)."""
    return {
        "feature_encoder": params["feature_encoder"],
        "projector": params["projector"],
    }


def ema_update(teacher, student, momentum):
    """Pytree lerp: teacher <- m * teacher + (1 - m) * student."""
    return jax.tree.map(
        lambda t, s: t * momentum + (1.0 - momentum) * s,
        teacher,
        teacher_param_subset(student),
    )


def momentum_schedule(step, base, final, max_steps, kind: str = "cosine"):
    frac = jnp.clip(step.astype(jnp.float32) / max_steps, 0.0, 1.0)
    if kind == "linear":
        return base + (final - base) * frac
    return final + 0.5 * (base - final) * (1 + jnp.cos(jnp.pi * frac))


def wav_to_spec(cfg: ST2VecConfig, wavs, wav_lens, training=False, rng=None):
    if wavs.dtype == jnp.uint8:
        # mu-law wire format (opt-in, train/spiral.py::quantize_wire_mulaw):
        # exact inverse of the host companding — quarter the f32 payload.
        mu = 255.0
        y = wavs.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        wavs = jnp.sign(y) * (1.0 / mu) * (
            jnp.exp(jnp.abs(y) * jnp.log1p(mu)) - 1.0
        )
    elif jnp.issubdtype(wavs.dtype, jnp.integer):
        # int16 wire format: the input pipeline ships source PCM samples and
        # converts on device INSIDE the jitted step — int16 -> f32 is exact
        # and /32768 is a power-of-two scale, so the result is bit-identical
        # to the host-side read_wav conversion at half the H2D payload
        # (the reference pays 4 B/sample for audio whose source files are
        # int16 PCM; see train/spiral.py::quantize_wire_int16 and the
        # bench.py::spiral_input_pipeline_efficiency wire A/B).
        wavs = wavs.astype(jnp.float32) * (1.0 / 32768.0)
    if getattr(cfg, "streaming", None) is not None:
        # streaming-mode models train exactly as they serve: causal
        # cumulative normalization, no utterance-global time-domain
        # normalization (streaming.py carries these stats across chunks)
        return filterbank_features(
            wavs, wav_lens, sample_rate=cfg.sample_rate,
            nfilt=cfg.num_features, dither=getattr(cfg, "dither", 1e-5),
            normalize="per_feature_causal", do_normalize_time_domain=False,
            training=training, rng=rng,
        )
    return filterbank_features(
        wavs, wav_lens, sample_rate=cfg.sample_rate, nfilt=cfg.num_features,
        dither=getattr(cfg, "dither", 1e-5),
        training=training, rng=rng,
    )


def teacher_shift(specs, spec_lens, k_units, r_units, unit, max_units,
                  mask_emb):
    """Left/right shift the clean specs by (k, r) feature units, filling
    introduced frames with the mask embedding. Static output length
    T + 2 * max_units * unit (RandomShift.shift, st2vec_model.py:443-485).
    """
    b, t, f = specs.shape
    pad_total = 2 * max_units * unit
    buf = jnp.zeros((b, t + pad_total, f), dtype=specs.dtype)
    k_frames = k_units * unit
    r_frames = r_units * unit
    buf = jax.lax.dynamic_update_slice(buf, specs, (0, k_frames, 0))
    new_lens = spec_lens + k_frames + r_frames
    pos = jnp.arange(t + pad_total)[None, :]
    # left fill [0, k) and right fill [len + k, len + k + r): mask embedding
    left = pos < k_frames
    right = (pos >= (spec_lens[:, None] + k_frames)) & (pos < new_lens[:, None])
    fill = left | right
    buf = jnp.where(fill[:, :, None], mask_emb[None, None, :], buf)
    return buf, new_lens


# Perf note (measured on v5e, B=24/250k-crop step): reformulating the
# negatives as an all-pairs (B,T,T) gram matmul + scalar-logit gathers
# (avoiding this (N,B,T,D) materialization) ran ~5% SLOWER end to end —
# XLA already fuses the gather+cosine+softmax chain here, and the extra
# fp32-precision grams plus the (B,T,T) scatter in backward cost more than
# the vector gathers. Keep the materialized formulation.
# Re-measured round 3 in isolation (scripts/bench_negloss.py, incl. a
# content-hash neg_is_pos variant): gram fwd+bwd 23.2 ms vs materialized
# 9.9 ms fp32 / 7.8 ms bf16 at the operating point — 2.3x slower, verdict
# unchanged.
def sample_negatives(rng, feats, feat_lens, n_negatives):
    """Per-frame negatives from the same utterance's valid frames, excluding
    the frame itself (sample_negatives_flat, st2vec_model.py:375-413, without
    the fake-batch flatten). feats: (B, T, D) -> (N, B, T, D)."""
    b, t, d = feats.shape
    high = jnp.maximum(feat_lens - 1, 1)[:, None, None]  # (B,1,1)
    idx = jax.random.randint(rng, (b, t, n_negatives), 0, high)
    pos = jnp.arange(t)[None, :, None]
    idx = idx + (idx >= pos)
    idx = jnp.minimum(idx, t - 1)
    negs = jnp.take_along_axis(
        feats[:, :, None, :], idx[..., None], axis=1
    )  # gather over time: feats (B, T, 1, D), idx (B, T, N, 1)
    return jnp.transpose(negs, (2, 0, 1, 3))  # (N, B, T, D)


def check_collapse(pred, targets, feat_lens, trunc: int = 80):
    """Representation-collapse diagnostics (st2vec_model.py:287-312).

    The reference prints cosine-similarity matrices of the first utterance's
    features against themselves / the teacher projections / a second
    utterance. Here the same quantities are reduced to jit-friendly scalars
    (a collapsed representation drives the off-diagonal self-similarity
    toward 1): returns a dict of float32 scalars
      self_sim          mean off-diagonal cos-sim of pred[0] with itself
      target_self_sim   same for targets[0]
      pred_target_sim   mean per-frame cos(pred[0], targets[0])
      cross_utt_sim     mean per-frame cos(pred[0], pred[1])  (B >= 2)
    All over the first min(feat_lens, trunc) frames, like the reference's
    trunc_len = min(feature_lens.min(), 80).
    """
    t = min(trunc, pred.shape[1])
    n = jnp.minimum(jnp.min(feat_lens), t)  # traced valid length
    frame_ok = (jnp.arange(t) < n).astype(jnp.float32)  # (t,)

    def unit(x):  # (t, D) -> L2-normalized float32 rows
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    p0 = unit(pred[0, :t])
    g0 = unit(targets[0, :t])

    def offdiag_mean(u):
        sim = u @ u.T  # (t, t)
        w = frame_ok[:, None] * frame_ok[None, :] * (1.0 - jnp.eye(t))
        return jnp.sum(sim * w) / jnp.maximum(jnp.sum(w), 1.0)

    def frame_mean(a, b):
        return jnp.sum(jnp.sum(a * b, -1) * frame_ok) / jnp.maximum(
            jnp.sum(frame_ok), 1.0
        )

    out = {
        "self_sim": offdiag_mean(p0),
        "target_self_sim": offdiag_mean(g0),
        "pred_target_sim": frame_mean(p0, g0),
    }
    if pred.shape[0] >= 2:
        out["cross_utt_sim"] = frame_mean(p0, unit(pred[1, :t]))
    return out


def contrastive_loss(
    logits, targets, negatives, valid_mask, logit_temp: float
):
    """InfoNCE over cosine similarities (losses/wav2vecloss.py:55-128).

    logits/targets: (B, T, D); negatives: (N, B, T, D);
    valid_mask: (B, T) 1.0 at valid frames. Returns (loss, accuracy).
    """
    neg_is_pos = jnp.all(targets[None] == negatives, axis=-1)  # (N, B, T)
    cand = jnp.concatenate([targets[None], negatives], axis=0)  # (1+N, B, T, D)

    def cos(a, b):
        # float32 similarity regardless of compute dtype (the reference casts:
        # torch.cosine_similarity(logits.float(), targets.float()))
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        return num / jnp.maximum(den, 1e-8)

    sims = cos(logits[None], cand) / logit_temp  # (1+N, B, T)
    sims = jnp.concatenate(
        [sims[:1], jnp.where(neg_is_pos, -1e9, sims[1:])], axis=0
    )
    logp = jax.nn.log_softmax(sims, axis=0)
    ce = -logp[0]  # (B, T)
    denom = jnp.maximum(jnp.sum(valid_mask), 1.0)
    loss = jnp.sum(ce * valid_mask) / denom

    arg = jnp.argmax(sims, axis=0)
    arg_min = jnp.argmin(sims, axis=0)
    correct = (arg == 0) & ~((arg == 0) & (arg_min == 0))
    acc = jnp.sum(correct.astype(jnp.float32) * valid_mask) / denom
    return loss, acc
