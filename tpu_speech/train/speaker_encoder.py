"""GE2E speaker-encoder training (reference: DiffVC/speaker_encoder/encoder/
train.py): speakers-per-batch x utterances-per-speaker partials -> GE2E
softmax loss with the reference's gradient treatment (similarity params'
grads scaled by 0.01, global clip 3)."""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.models.speaker_encoder import SpeakerEncoder, ge2e_loss


@flax.struct.dataclass
class GE2EState:
    step: jax.Array
    params: Any
    sim_weight: jax.Array
    sim_bias: jax.Array
    opt_state: Any


def init_ge2e_state(model: SpeakerEncoder, rng, n_frames: int, n_mels: int, tx):
    params = model.init(rng, jnp.zeros((1, n_frames, n_mels)))["params"]
    sim_w = jnp.asarray(10.0)
    sim_b = jnp.asarray(-5.0)
    full = {"model": params, "sim_weight": sim_w, "sim_bias": sim_b}
    return GE2EState(
        jnp.zeros((), jnp.int32), params, sim_w, sim_b, tx.init(full)
    )


def make_ge2e_train_step(model: SpeakerEncoder, tx):
    def loss_fn(params, sim_w, sim_b, frames):
        s, u, t, f = frames.shape
        embeds = model.apply({"params": params}, frames.reshape(s * u, t, f))
        embeds = embeds.reshape(s, u, -1)
        loss, sim = ge2e_loss(embeds, sim_w, sim_b)
        return loss, sim

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: GE2EState, frames):
        (loss, sim), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, state.sim_weight, state.sim_bias, frames)
        g_model, g_w, g_b = grads
        # reference: scale similarity grads by 0.01 then clip all to norm 3
        g_w = g_w * 0.01
        g_b = g_b * 0.01
        full = {"model": g_model, "sim_weight": g_w, "sim_bias": g_b}
        gnorm = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(full)))
        scale = jnp.minimum(1.0, 3.0 / (gnorm + 1e-6))
        full = jax.tree.map(lambda g: g * scale, full)
        params_full = {
            "model": state.params,
            "sim_weight": state.sim_weight,
            "sim_bias": state.sim_bias,
        }
        updates, opt_state = tx.update(full, state.opt_state, params_full)
        new = optax.apply_updates(params_full, updates)
        return (
            GE2EState(
                state.step + 1, new["model"], new["sim_weight"],
                new["sim_bias"], opt_state,
            ),
            {"loss": loss, "grad_norm": gnorm},
        )

    return step
