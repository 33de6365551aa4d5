"""DiffVC two-stage training: average-voice encoder, then decoder.

Mirrors DiffVC/train_enc.py:50-132 (encoder: masked MSE to avg-mels, Adam
5e-4) and DiffVC/train_dec.py:57-140 (decoder: score matching with frozen
encoder, Adam 1e-4), as jitted DP steps over the mesh.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.models.diffvc.encoder import FwdDiffusion
from tpu_speech.models.diffvc.vc import DiffVC
from tpu_speech.ops.masks import sequence_mask
from tpu_speech.parallel.mesh import make_mesh, replicate, shard_batch
from tpu_speech.train.state import TrainState
from tpu_speech.utils.checkpoint import Checkpointer


def _cast_bf16(tree):
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def make_enc_train_step(model: FwdDiffusion, tx, bf16: bool = False):
    """bf16=True casts params + mels to bfloat16 for the network forward/
    backward; master params, optimizer state, and updates stay float32
    (same scheme as train/gradtts.py and the SPIRAL steps)."""

    def loss_fn(params, batch, rng):
        x, y = batch["x"], batch["y"]
        if bf16:
            params, x, y = _cast_bf16(params), _cast_bf16(x), _cast_bf16(y)
        mask = sequence_mask(batch["lengths"], x.shape[1]).astype(
            x.dtype
        )[:, :, None]
        loss = model.apply(
            {"params": params}, x, y, mask,
            train=True, method=FwdDiffusion.compute_loss,
            rngs={"dropout": rng},
        )
        return loss.astype(jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params["params"], batch, rng
        )
        grads_flat = jax.tree.leaves(grads)
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in grads_flat))
        scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params["params"])
        params = optax.apply_updates(state.params["params"], updates)
        return (
            TrainState(state.step + 1, {"params": params}, opt_state),
            {"loss": loss, "grad_norm": gnorm},
        )

    return step


def make_dec_train_step(model: DiffVC, tx, bf16: bool = False):
    """bf16: same mixed-precision scheme as make_enc_train_step."""

    def loss_fn(params, batch, rng):
        mel1, mel2, c = batch["mel1"], batch["mel2"], batch["c"]
        if bf16:
            params = _cast_bf16(params)
            mel1, mel2, c = _cast_bf16(mel1), _cast_bf16(mel2), _cast_bf16(c)
        loss = model.apply(
            {"params": params},
            mel1, batch["mel_lengths"], mel2, c,
            rng, train=True, rngs={"dropout": jax.random.fold_in(rng, 5)},
        )
        return loss.astype(jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params["params"], batch, rng
        )
        # decoder-only training: zero encoder grads (frozen, vc.py:141-142
        # detaches; clip decoder to max_norm 1 as train_dec.py:108)
        grads = dict(grads)
        grads["encoder"] = jax.tree.map(jnp.zeros_like, grads["encoder"])
        dec_leaves = jax.tree.leaves(grads["estimator"])
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in dec_leaves))
        scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-6))
        grads["estimator"] = jax.tree.map(
            lambda g: g * scale, grads["estimator"]
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params["params"])
        params = optax.apply_updates(state.params["params"], updates)
        return (
            TrainState(state.step + 1, {"params": params}, opt_state),
            {"loss": loss, "grad_norm": gnorm},
        )

    return step


def _log_mel_and_audio(trainer, tag: str, log_mel, epoch: int,
                       sample_rate: int, n_mels: int):
    """One preview item: mel image (TB + PNG) and Griffin-Lim audio (TB),
    the reference's epoch-end observability (train_dec.py:115-136)."""
    from tpu_speech.audio.vocode import fast_griffin_lim
    from tpu_speech.utils.plotting import plot_tensor, save_plot

    from tpu_speech.data.wav import write_wav

    if not getattr(trainer, "primary", True):
        return  # host-side writes only; the global-mesh jit already ran
    mel = np.asarray(log_mel)
    if trainer.tb is not None:
        trainer.tb.add_image(
            f"{tag}/mel", plot_tensor(mel.T), epoch, dataformats="HWC"
        )
    wav = np.asarray(fast_griffin_lim(
        jnp.asarray(mel)[None], n_mels=n_mels, sample_rate=sample_rate
    ))[0]
    wav = wav / (np.abs(wav).max() + 1e-6)
    stem = tag.replace("/", "_")
    write_wav(os.path.join(trainer.log_dir, f"{stem}.wav"), wav, sample_rate)
    if trainer.tb is not None:
        try:
            trainer.tb.add_audio(
                f"{tag}/audio", wav[:, None], epoch, sample_rate=sample_rate
            )
        except Exception:
            pass  # tensorboardX audio encoding backend missing; wav on disk
    save_plot(mel.T, os.path.join(trainer.log_dir, f"{stem}.png"))


def make_enc_preview(model: FwdDiffusion, batch, n: int = 2,
                     sample_rate: int = 22050):
    """Stage-1 preview_fn: predicted average-voice mel vs target avg-mel
    (+ GL audio), matching DiffVC/train_enc.py:111-132."""
    fwd = jax.jit(lambda p, x, m: model.apply({"params": p}, x, m, train=False))

    def preview(trainer, epoch):
        x = jnp.asarray(batch["x"][:n])
        lens = np.asarray(batch["lengths"][:n])
        mask = sequence_mask(
            jnp.asarray(lens), x.shape[1]
        ).astype(x.dtype)[:, :, None]
        pred = jax.device_get(fwd(trainer.state.params["params"], x, mask))
        for i in range(min(n, x.shape[0])):
            L = int(lens[i])
            _log_mel_and_audio(trainer, f"enc_{i}/source", batch["x"][i][:L],
                               epoch, sample_rate, model.n_feats)
            _log_mel_and_audio(trainer, f"enc_{i}/predicted_avg", pred[i][:L],
                               epoch, sample_rate, model.n_feats)
            _log_mel_and_audio(trainer, f"enc_{i}/target_avg",
                               batch["y"][i][:L], epoch, sample_rate,
                               model.n_feats)

    return preview


def make_dec_preview(model: DiffVC, batch, n: int = 2, n_timesteps: int = 30,
                     sample_rate: int = 22050):
    """Stage-2 preview_fn: run the full reverse-diffusion conversion on fixed
    validation items and log source/generated mels + GL audio
    (DiffVC/train_dec.py:115-136)."""
    from functools import partial as _partial

    from tpu_speech.models.diffvc.vc import voice_convert

    convert = jax.jit(_partial(voice_convert, model, n_timesteps=n_timesteps))

    def preview(trainer, epoch):
        x = jnp.asarray(batch["mel1"][:n])
        lens = jnp.asarray(batch["mel_lengths"][:n])
        c = jnp.asarray(batch["c"][:n])
        params = {"params": trainer.state.params["params"]}
        _, converted = jax.device_get(convert(
            params, x, lens, x, lens, c, rng=jax.random.PRNGKey(epoch)
        ))
        lens = np.asarray(lens)
        for i in range(min(n, x.shape[0])):
            L = int(lens[i])
            _log_mel_and_audio(trainer, f"dec_{i}/source",
                               np.asarray(batch["mel1"][i][:L]), epoch,
                               sample_rate, model.n_feats)
            _log_mel_and_audio(trainer, f"dec_{i}/generated",
                               converted[i][:L], epoch, sample_rate,
                               model.n_feats)

    return preview


class DiffVCTrainer:
    """Generic epoch driver shared by both stages."""

    def __init__(self, step_fn, state, log_dir: str, mesh=None, save_every=1,
                 exp=None, preview_fn=None):
        """exp: optional ExpManager owning the log dir/TB. preview_fn:
        called as preview_fn(trainer, epoch) after each checkpoint — the
        stage CLIs use it for the reference's per-epoch mel-image +
        Griffin-Lim audio logging (DiffVC/train_dec.py:115-136)."""
        from tpu_speech.parallel import distributed

        self.step_fn = step_fn
        self.mesh = mesh if mesh is not None else make_mesh()
        self.state = replicate(self.mesh, state)
        self.exp = exp
        self.primary = distributed.is_primary()
        if exp is not None:
            log_dir = exp.log_dir
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.ckpt = Checkpointer(os.path.join(log_dir, "ckpt"))
        self.save_every = save_every
        self.preview_fn = preview_fn
        self.iteration = 0
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

    def resume_if_exists(self) -> bool:
        restored = self.ckpt.restore_latest(jax.device_get(self.state))
        if restored is None:
            return False
        self.state = replicate(self.mesh, restored)
        self.iteration = int(restored.step)
        return True

    def train_epoch(self, loader, epoch: int, base_rng):
        losses = []
        t0 = time.time()
        for batch in loader:
            rng = jax.random.fold_in(base_rng, self.iteration)
            self.state, metrics = self.step_fn(
                self.state, shard_batch(self.mesh, batch), rng
            )
            m = jax.device_get(metrics)
            losses.append(float(m["loss"]))
            if self.tb is not None and self.iteration % 10 == 0:
                self.tb.add_scalar("training/loss", float(m["loss"]), self.iteration)
                self.tb.add_scalar(
                    "training/grad_norm", float(m["grad_norm"]), self.iteration
                )
            self.iteration += 1
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        if self.primary:
            with open(os.path.join(self.log_dir, "train.log"), "a") as f:
                f.write(
                    "Epoch %d: loss = %.4f | %.1fs\n"
                    % (epoch, mean_loss, time.time() - t0)
                )
        if epoch % self.save_every == 0:
            if self.primary:
                self.ckpt.save(self.iteration, jax.device_get(self.state),
                               blocking=False)
            if self.preview_fn is not None:
                # ALL processes must launch the preview's jitted computation
                # (params span the global mesh); only the primary writes output
                self.preview_fn(self, epoch)
        return mean_loss
