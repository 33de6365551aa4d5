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
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, n_frames, n_mels)))["params"]
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
        return loss, (sim, embeds)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: GE2EState, frames):
        (loss, (sim, embeds)), grads = jax.value_and_grad(
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
            {"loss": loss, "grad_norm": gnorm, "sim": sim, "embeds": embeds},
        )

    return step


def train_speaker_encoder(
    clean_data_root: str,
    models_dir: str,
    run_id: str = "ge2e",
    speakers_per_batch: int = 64,
    utterances_per_speaker: int = 10,
    n_frames: int = 160,
    n_mels: int = 40,
    learning_rate: float = 1e-4,
    max_steps: int = 1_000_000,
    vis_every: int = 10,
    umap_every: int = 100,
    save_every: int = 500,
    backup_every: int = 7500,
    force_restart: bool = False,
    seed: int = 0,
):
    """Reference GE2E training loop (encoder/train.py:18-126), TPU-native:
    one donated jitted step; EER host-side from the step's similarity matrix;
    periodic 2-D embedding projections saved to ``<run_id>_backups/`` (PCA
    replaces UMAP — no umap dependency offline); checkpoint + resume.
    """
    import os

    from tpu_speech.data.speaker_verification import SpeakerVerificationSampler
    from tpu_speech.models.speaker_encoder import equal_error_rate
    from tpu_speech.utils.checkpoint import Checkpointer
    from tpu_speech.utils.plotting import plot_projections

    sampler = SpeakerVerificationSampler(
        clean_data_root, speakers_per_batch, utterances_per_speaker,
        n_frames, seed=seed,
    )
    model = SpeakerEncoder()
    tx = optax.adam(learning_rate)
    state = init_ge2e_state(
        model, jax.random.PRNGKey(seed), n_frames, n_mels, tx
    )
    os.makedirs(models_dir, exist_ok=True)
    backup_dir = os.path.join(models_dir, f"{run_id}_backups")
    ckpt = Checkpointer(os.path.join(models_dir, run_id))
    if not force_restart:
        restored = ckpt.restore_latest(jax.device_get(state))
        if restored is not None:
            state = restored
            print(f"Resuming '{run_id}' at step {int(state.step)}.")
    step_fn = make_ge2e_train_step(model, tx)
    # every step's (loss, sim) is kept as device arrays and fetched only at
    # report time, so the dispatch pipeline stays async between reports; the
    # reference averages loss/EER over the window since the last report
    # (encoder/train.py vis.update)
    window = []
    start = int(jax.device_get(state.step))
    for step in range(start + 1, max_steps + 1):
        frames = sampler.next_batch().reshape(
            speakers_per_batch, utterances_per_speaker, n_frames, -1
        )
        state, metrics = step_fn(state, jnp.asarray(frames))
        window.append((metrics["loss"], metrics["sim"]))
        if step % vis_every == 0:
            fetched = jax.device_get(window)
            losses = [float(lo) for lo, _ in fetched]
            eers = [
                equal_error_rate(np.asarray(sim), speakers_per_batch)
                for _, sim in fetched
            ]
            print(
                f"Step {step:6d}   Loss: {np.mean(losses):.4f}   "
                f"EER: {np.mean(eers):.4f}", flush=True,
            )
            window.clear()
        if umap_every and step % umap_every == 0:
            os.makedirs(backup_dir, exist_ok=True)
            embeds = np.asarray(jax.device_get(metrics["embeds"]))
            embeds = embeds.reshape(-1, embeds.shape[-1])
            plot_projections(
                embeds, utterances_per_speaker, step,
                os.path.join(backup_dir, f"{run_id}_proj_{step:06d}.png"),
            )
        if save_every and step % save_every == 0:
            ckpt.save(step, jax.device_get(state), blocking=False)
        if backup_every and step % backup_every == 0:
            os.makedirs(backup_dir, exist_ok=True)
            Checkpointer(os.path.join(backup_dir, f"bak_{step:06d}")).save(
                step, jax.device_get(state)
            )
    ckpt.wait()  # drain the async checkpoint write
    return state
