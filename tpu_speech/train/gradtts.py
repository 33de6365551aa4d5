"""Grad-TTS training loop: jitted DP train step + epoch driver.

The reference loop (Grad-TTS/train.py:97-175) is a Python loop over
loss/backward/clip/step with CPU-side MAS; here the entire update — encoder,
MAS, crop, diffusion loss, grads, per-module clip, Adam — is one jitted,
donated function. Data parallelism: batch sharded over the mesh 'data' axis,
params replicated; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.models.grad_tts import GradTTS
from tpu_speech.parallel.mesh import make_mesh, replicate, shard_batch
from tpu_speech.train.optim import clip_subtree_by_global_norm
from tpu_speech.train.state import TrainState
from tpu_speech.utils.checkpoint import Checkpointer


def make_train_step(model: GradTTS, tx: optax.GradientTransformation,
                    out_size: Optional[int], bf16: bool = False):
    """Returns jitted step(state, batch, rng) -> (state, metrics).

    bf16=True casts params + mel targets to bfloat16 for the network
    forward/backward (master params, optimizer state, and updates stay
    float32 — standard TPU mixed precision; same scheme as the SPIRAL
    pretrain step)."""

    def loss_fn(params, batch, rng):
        y = batch["y"]
        if bf16:
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
            y = y.astype(jnp.bfloat16)
        dur_loss, prior_loss, diff_loss = model.apply(
            {"params": params},
            batch["x"], batch["x_lengths"], y, batch["y_lengths"],
            rng,
            spk=batch.get("spk"),
            out_size=out_size,
            train=True,
            rngs={"dropout": jax.random.fold_in(rng, 7)},
        )
        loss = dur_loss + prior_loss + diff_loss
        return loss.astype(jnp.float32), (dur_loss, prior_loss, diff_loss)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (dur, prior, diff)), grads = grad_fn(
            state.params["params"], batch, rng
        )
        # per-module clip to max_norm=1 (train.py:115-118); spk_emb rides with
        # the encoder group (reference leaves it unclipped; it is tiny)
        grads, enc_norm = clip_subtree_by_global_norm(grads, ("encoder",), 1.0)
        grads, dec_norm = clip_subtree_by_global_norm(grads, ("estimator",), 1.0)
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params["params"]
        )
        params = optax.apply_updates(state.params["params"], updates)
        metrics = {
            "loss": loss, "dur_loss": dur, "prior_loss": prior,
            "diff_loss": diff, "enc_grad_norm": enc_norm,
            "dec_grad_norm": dec_norm,
        }
        return (
            TrainState(state.step + 1, {"params": params}, opt_state),
            metrics,
        )

    return train_step


class GradTTSTrainer:
    """Epoch driver: logging (TensorBoard + train.log), checkpoints, resume,
    per-epoch synthesis previews (mel/attention images, Grad-TTS/train.py:142-175)."""

    def __init__(
        self,
        model: GradTTS,
        params,
        log_dir: str,
        learning_rate: float = 1e-4,
        out_size: Optional[int] = None,
        mesh=None,
        save_every: int = 1,
        bf16: bool = False,
        exp=None,
        preview_batch=None,
        preview_timesteps: int = 50,
        preview_max_frames: int = 512,
    ):
        """exp: optional utils.exp_manager.ExpManager — owns the (versioned)
        log dir, TB writer, env capture. preview_batch: dict with padded
        int32 'x' (B, Tx) and 'x_lengths' (+ optional 'spk') used for the
        per-epoch synthesis previews the reference logs as its de-facto
        integration test (train.py:142-172)."""
        from tpu_speech.parallel import distributed

        self.model = model
        self.exp = exp
        self.primary = distributed.is_primary()
        if exp is not None:
            log_dir = exp.log_dir
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.tx = optax.adam(learning_rate)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.state = TrainState.create({"params": params["params"]}, self.tx)
        self.state = replicate(self.mesh, self.state)
        self.train_step = make_train_step(model, self.tx, out_size, bf16=bf16)
        self.ckpt = Checkpointer(os.path.join(log_dir, "ckpt"))
        self.save_every = save_every
        self.tb = None
        if self.primary:
            if exp is not None:
                self.tb = exp.tb
            else:
                try:
                    from tensorboardX import SummaryWriter

                    self.tb = SummaryWriter(log_dir)
                except Exception:
                    self.tb = None
        self.preview_batch = preview_batch
        self.preview_timesteps = preview_timesteps
        self.preview_max_frames = preview_max_frames
        from tpu_speech.utils.profiling import StepTimer

        self.timer = StepTimer()
        self.iteration = 0

    def resume_if_exists(self) -> bool:
        restored = self.ckpt.restore_latest(jax.device_get(self.state))
        if restored is None:
            return False
        self.state = replicate(self.mesh, restored)
        self.iteration = int(restored.step)
        return True

    def save_archive(self, config=None, name: str = "gradtts"):
        """Write the self-contained `.tpu_speech` archive at train end (the
        reference ships raw .pt state_dicts, Grad-TTS/train.py:174-175; the
        archive is the ModelPT `.nemo` analog consumable by
        cli/inference.py -c)."""
        if not self.primary:
            return None
        from tpu_speech.utils.archive import save_archive

        path = os.path.join(self.log_dir, f"{name}.tpu_speech")
        state = jax.device_get(self.state)
        save_archive(path, config or {}, state.params["params"])
        return path

    def log_ground_truth(self, batch, n: int = 3):
        """Log target mels once at startup (Grad-TTS/train.py:89-95)."""
        if self.tb is None:
            return
        from tpu_speech.utils.plotting import plot_tensor

        for i in range(min(n, len(batch["y"]))):
            L = int(batch["y_lengths"][i])
            img = plot_tensor(np.asarray(batch["y"][i][:L]).T)
            self.tb.add_image(
                f"image_{i}/ground_truth", img, 0, dataformats="HWC"
            )

    _preview_fn = None

    def log_previews(self, epoch: int, n: int = 3):
        """Per-epoch synthesis previews: generated enc/dec mels + alignment
        images to TB and PNGs in the log dir (train.py:142-172 — the
        reference's de-facto integration test)."""
        if self.preview_batch is None:
            return
        from functools import partial as _partial

        from tpu_speech.models.grad_tts import synthesize
        from tpu_speech.utils.plotting import plot_tensor, save_plot

        if self._preview_fn is None:
            self._preview_fn = jax.jit(_partial(
                synthesize, self.model,
                n_timesteps=self.preview_timesteps,
                y_max_length=self.preview_max_frames,
            ))
        pb = self.preview_batch
        enc, dec, attn, ylen = jax.device_get(self._preview_fn(
            self.state.params,
            jnp.asarray(pb["x"]), jnp.asarray(pb["x_lengths"]),
            spk=(jnp.asarray(pb["spk"]) if pb.get("spk") is not None else None),
            rng=jax.random.PRNGKey(epoch),
        ))
        for i in range(min(n, len(pb["x"]))):
            L = max(int(ylen[i]), 1)
            tx_len = int(pb["x_lengths"][i])
            enc_i = np.asarray(enc[i][:L]).T
            dec_i = np.asarray(dec[i][:L]).T
            attn_i = np.asarray(attn[i])[:tx_len, :L]
            if self.tb is not None:
                self.tb.add_image(f"image_{i}/generated_enc",
                                  plot_tensor(enc_i), self.iteration,
                                  dataformats="HWC")
                self.tb.add_image(f"image_{i}/generated_dec",
                                  plot_tensor(dec_i), self.iteration,
                                  dataformats="HWC")
                self.tb.add_image(f"image_{i}/alignment",
                                  plot_tensor(attn_i), self.iteration,
                                  dataformats="HWC")
            save_plot(enc_i, os.path.join(self.log_dir, f"generated_enc_{i}.png"))
            save_plot(dec_i, os.path.join(self.log_dir, f"generated_dec_{i}.png"))
            save_plot(attn_i, os.path.join(self.log_dir, f"alignment_{i}.png"))

    def train_epoch(self, loader, epoch: int, base_rng: jax.Array):
        agg = {"dur_loss": [], "prior_loss": [], "diff_loss": []}
        t0 = time.time()
        n_frames = 0
        for batch in loader:
            rng = jax.random.fold_in(base_rng, self.iteration)
            # count frames from the raw host batch BEFORE sharding: after
            # shard_batch the lengths span non-addressable devices on
            # multi-host (device_get would raise) and cost a sync otherwise
            n_frames += int(np.sum(np.asarray(batch["y_lengths"])))
            batch = shard_batch(self.mesh, batch)
            self.timer.tick("step")
            self.state, metrics = self.train_step(self.state, batch, rng)
            m = jax.device_get(metrics)  # sync point closes the step timing
            self.timer.tock("step")
            if self.tb is not None and self.iteration % 10 == 0:
                self.tb.add_scalar("training/duration_loss", float(m["dur_loss"]), self.iteration)
                self.tb.add_scalar("training/prior_loss", float(m["prior_loss"]), self.iteration)
                self.tb.add_scalar("training/diffusion_loss", float(m["diff_loss"]), self.iteration)
                self.tb.add_scalar("training/encoder_grad_norm", float(m["enc_grad_norm"]), self.iteration)
                self.tb.add_scalar("training/decoder_grad_norm", float(m["dec_grad_norm"]), self.iteration)
                st = self.timer.summary().get("step")
                if st is not None:
                    self.tb.add_scalar("training/step_time_ms", st["mean_s"] * 1e3, self.iteration)
            for k in agg:
                agg[k].append(float(m[k]))
            self.iteration += 1

        dt = time.time() - t0
        msg = (
            "Epoch %d: duration loss = %.3f | prior loss = %.3f "
            "| diffusion loss = %.3f | %.0f frames/s\n"
            % (
                epoch,
                float(np.mean(agg["dur_loss"])) if agg["dur_loss"] else float("nan"),
                float(np.mean(agg["prior_loss"])) if agg["prior_loss"] else float("nan"),
                float(np.mean(agg["diff_loss"])) if agg["diff_loss"] else float("nan"),
                n_frames / max(dt, 1e-9),
            )
        )
        if self.primary:
            with open(os.path.join(self.log_dir, "train.log"), "a") as f:
                f.write(msg)
        if epoch % self.save_every == 0:
            if self.primary:
                self.ckpt.save(self.iteration, jax.device_get(self.state),
                               blocking=False)
            self.log_previews(epoch)
        return {k: float(np.mean(v)) if v else float("nan") for k, v in agg.items()}
