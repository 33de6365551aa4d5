"""wav2vec 2.0 pretraining step (reference Wav2VecEncoderModel._step +
Wav2VecLoss, wav2vec_model.py:221-237 / losses/wav2vecloss.py:55-128):
InfoNCE at masked positions against quantized targets, + codebook-perplexity
and feature-L2 penalties. One donated jit step; masking indices are computed
host-side (numpy, exactly like the reference) and fed in as a fixed-shape
boolean array."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.models.spiral.masking import compute_mask_indices
from tpu_speech.models.spiral.st2vec import contrastive_loss, sample_negatives
from tpu_speech.models.spiral.wav2vec_model import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    conv_subsampled_lens,
)
from tpu_speech.train.state import TrainState


def host_time_mask(cfg: Wav2Vec2Config, wav_lens: np.ndarray, max_frames: int,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """(B, max_frames) bool span mask over conv-output frames (the reference
    computes mask indices in numpy too, wav2vec_model.py:391-429)."""
    # same arithmetic as conv_subsampled_lens, pure numpy — this runs on the
    # per-batch host data path, where a device round trip is wasted latency
    feat_lens = np.asarray(wav_lens)
    for _, k, s in cfg.conv_layers:
        feat_lens = (feat_lens - k) // s + 1
    feat_lens = np.maximum(feat_lens, 0)
    mask, _ = compute_mask_indices(
        (len(feat_lens), max_frames), feat_lens, cfg.mask_prob,
        cfg.mask_length, shrink_to_batch_min=False, rng=rng,
    )
    return mask.astype(bool)


def init_wav2vec_state(model: Wav2Vec2Model, rng, input_shape, tx):
    wavs = jnp.zeros(input_shape)
    lens = jnp.full((input_shape[0],), input_shape[1], dtype=jnp.int32)
    # jitted: eager Module.init is one remote compile per param initializer
    params = jax.jit(model.init)(
        {"params": rng, "dropout": rng, "gumbel": rng}, wavs, lens,
    )
    return TrainState.create(params, tx)


def make_pretrain_step(model: Wav2Vec2Model, cfg: Wav2Vec2Config, tx,
                       grad_clip: Optional[float] = None,
                       bf16: bool = False):
    def loss_fn(params, wavs, wav_lens, time_mask, num_updates, rng):
        p = params
        if bf16:
            p = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
                p,
            )
            wavs = wavs.astype(jnp.bfloat16)
        r_drop, r_gumbel, r_neg = jax.random.split(rng, 3)
        out = model.apply(
            {"params": p["params"] if "params" in p else p},
            wavs, wav_lens, time_mask=time_mask, num_updates=num_updates,
            train=True, rngs={"dropout": r_drop, "gumbel": r_gumbel},
        )
        negs = sample_negatives(
            r_neg, out["targets"], out["feat_lens"], cfg.n_negatives
        )
        c_loss, acc = contrastive_loss(
            out["logits"], out["targets"], negs, out["loss_weight"],
            cfg.logit_temp,
        )
        loss = (
            c_loss
            + cfg.prob_ppl_weight * out["prob_ppl_loss"]
            + cfg.feature_loss_weight * out["features_penalty"]
        )
        metrics = {
            "loss": loss.astype(jnp.float32),
            "contrastive_loss": c_loss.astype(jnp.float32),
            "accuracy": acc,
            "prob_ppl": out["prob_ppl"],
            "cur_temp": out["cur_temp"],
        }
        return loss.astype(jnp.float32), metrics

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, wavs, wav_lens, time_mask, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, wavs, wav_lens, time_mask, state.step, rng
        )
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        inner = grads["params"] if "params" in grads else grads
        p_inner = (
            state.params["params"] if "params" in state.params
            else state.params
        )
        updates, opt_state = tx.update(inner, state.opt_state, p_inner)
        new_inner = optax.apply_updates(p_inner, updates)
        new_params = (
            {**state.params, "params": new_inner}
            if "params" in state.params else new_inner
        )
        return (
            TrainState(state.step + 1, new_params, opt_state),
            metrics,
        )

    return step
