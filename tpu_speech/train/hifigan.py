"""HiFi-GAN adversarial training: one jitted GAN step + epoch driver.

The reference vendors the HiFi-GAN model/losses inference-only
(Grad-TTS/hifi-gan/models.py:77-284 — "training code not wired", SURVEY §2.1),
so its users must train vocoders with the upstream recipe elsewhere. Here the
full recipe is first-class: discriminator update (MPD+MSD LS-GAN loss) then
generator update (adversarial + 2x feature-matching + 45x L1 mel loss) as a
single donated jit, with both loss mels computed on device (fmax=sr/2, the
upstream `fmax_for_loss=None` convention) so the host pipeline only ships raw
waveform segments. AdamW(b1=0.8, b2=0.99) with per-epoch 0.999 exponential lr
decay, matching the published V1 config.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_speech.audio.mel import mel_spectrogram
from tpu_speech.models.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from tpu_speech.parallel.mesh import make_mesh, replicate, shard_batch
from tpu_speech.utils.checkpoint import Checkpointer


@flax.struct.dataclass
class GANTrainState:
    """Generator + discriminator params and their two optimizer states."""

    step: jax.Array
    gen: dict
    disc: dict  # {"mpd": ..., "msd": ...}
    opt_g: optax.OptState
    opt_d: optax.OptState

    @classmethod
    def create(cls, gen_params, mpd_params, msd_params,
               tx_g: optax.GradientTransformation,
               tx_d: optax.GradientTransformation):
        disc = {"mpd": mpd_params, "msd": msd_params}
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            gen=gen_params,
            disc=disc,
            opt_g=tx_g.init(gen_params),
            opt_d=tx_d.init(disc),
        )


def make_optimizers(learning_rate: float = 2e-4, adam_b1: float = 0.8,
                    adam_b2: float = 0.99, lr_decay: float = 0.999,
                    steps_per_epoch: int = 1):
    """Two AdamW optimizers with the upstream per-epoch exponential decay."""
    def sched():
        return optax.exponential_decay(
            learning_rate, transition_steps=max(steps_per_epoch, 1),
            decay_rate=lr_decay, staircase=True,
        )
    tx_g = optax.adamw(sched(), b1=adam_b1, b2=adam_b2, weight_decay=0.01)
    tx_d = optax.adamw(sched(), b1=adam_b1, b2=adam_b2, weight_decay=0.01)
    return tx_g, tx_d


def make_gan_train_step(
    gen: Generator,
    mpd: MultiPeriodDiscriminator,
    msd: MultiScaleDiscriminator,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    mel_cfg: Optional[dict] = None,
    bf16: bool = False,
):
    """Returns jitted step(state, batch, rng) -> (state, metrics).

    batch: {"wav": (B, S) float32} and optionally "mel": (B, S/hop, n_mels)
    (fine-tuning mode feeds mels produced by an acoustic model; otherwise the
    input mel is computed on device with the training fmax). The L1 mel loss
    always compares full-band (fmax=sr/2) mels of target vs generated audio,
    both computed inside the jit.

    bf16=True runs generator and discriminator compute in bfloat16 with fp32
    master weights (mel losses stay fp32 for the log/clip numerics).
    """
    cfg = dict(n_fft=1024, num_mels=80, sampling_rate=22050, hop_size=256,
               win_size=1024, fmin=0.0, fmax=8000.0)
    if mel_cfg:
        cfg.update(mel_cfg)
    loss_cfg = dict(cfg, fmax=cfg["sampling_rate"] / 2.0)

    def cast(tree):
        if not bf16:
            return tree
        return jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree,
        )

    def mel_of(wav, c):
        return mel_spectrogram(wav.astype(jnp.float32), **c)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: GANTrainState, batch, rng):
        del rng  # the GAN step is deterministic given the batch
        wav = batch["wav"]
        mel_in = batch.get("mel")
        if mel_in is None:
            mel_in = mel_of(wav, cfg)
        x_in = cast(mel_in)
        wav_c = cast(wav)

        # --- discriminator update (generator frozen via stop_gradient) ---
        y_hat_sg = jax.lax.stop_gradient(
            gen.apply({"params": cast(state.gen)}, x_in)
        )

        def disc_loss_fn(dparams):
            dparams = cast(dparams)
            pr, pg, _, _ = mpd.apply({"params": dparams["mpd"]}, wav_c, y_hat_sg)
            loss_f, _, _ = discriminator_loss(pr, pg)
            sr_, sg_, _, _ = msd.apply({"params": dparams["msd"]}, wav_c, y_hat_sg)
            loss_s, _, _ = discriminator_loss(sr_, sg_)
            total = (loss_f + loss_s).astype(jnp.float32)
            return total, (loss_f.astype(jnp.float32),
                           loss_s.astype(jnp.float32))

        (loss_d, (loss_d_mpd, loss_d_msd)), grads_d = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc)
        upd_d, opt_d = tx_d.update(grads_d, state.opt_d, state.disc)
        disc = optax.apply_updates(state.disc, upd_d)

        # --- generator update against the UPDATED discriminators (the
        # upstream step order: optim_d.step() precedes the G losses) ---
        def gen_loss_fn(gparams):
            y_g = gen.apply({"params": cast(gparams)}, x_in)
            mel_g = mel_of(y_g, loss_cfg)
            mel_t = mel_of(wav, loss_cfg)
            loss_mel = 45.0 * jnp.mean(jnp.abs(mel_g - mel_t))
            _, pg, fr, fg = mpd.apply({"params": cast(disc["mpd"])}, wav_c, y_g)
            _, sg_, fr_s, fg_s = msd.apply({"params": cast(disc["msd"])}, wav_c, y_g)
            loss_fm = feature_loss(fr, fg) + feature_loss(fr_s, fg_s)
            adv_f, _ = generator_loss(pg)
            adv_s, _ = generator_loss(sg_)
            total = (adv_f + adv_s + loss_fm).astype(jnp.float32) + loss_mel
            return total, (loss_mel, loss_fm.astype(jnp.float32),
                           (adv_f + adv_s).astype(jnp.float32))

        (loss_g, (loss_mel, loss_fm, loss_adv)), grads_g = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen)
        upd_g, opt_g = tx_g.update(grads_g, state.opt_g, state.gen)
        gen_params = optax.apply_updates(state.gen, upd_g)

        metrics = {
            "loss_gen": loss_g, "loss_disc": loss_d,
            "mel_error": loss_mel / 45.0, "loss_fm": loss_fm,
            "loss_adv": loss_adv, "loss_disc_mpd": loss_d_mpd,
            "loss_disc_msd": loss_d_msd,
        }
        return GANTrainState(state.step + 1, gen_params, disc,
                             opt_g, opt_d), metrics

    return train_step


class HiFiGANTrainer:
    """Epoch driver: GAN step over the data mesh, TB scalars, validation mel
    error, periodic audio previews, orbax checkpoints with resume."""

    def __init__(
        self,
        gen: Generator,
        mpd: MultiPeriodDiscriminator,
        msd: MultiScaleDiscriminator,
        init_rng: jax.Array,
        log_dir: str,
        mel_cfg: Optional[dict] = None,
        learning_rate: float = 2e-4,
        adam_b1: float = 0.8,
        adam_b2: float = 0.99,
        lr_decay: float = 0.999,
        steps_per_epoch: int = 1,
        segment_size: int = 8192,
        mesh=None,
        save_every: int = 5,
        bf16: bool = False,
        exp=None,
    ):
        from tpu_speech.parallel import distributed

        self.gen, self.mpd, self.msd = gen, mpd, msd
        self.exp = exp
        self.primary = distributed.is_primary()
        if exp is not None:
            log_dir = exp.log_dir
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.mel_cfg = dict(n_fft=1024, num_mels=80, sampling_rate=22050,
                            hop_size=256, win_size=1024, fmin=0.0, fmax=8000.0)
        if mel_cfg:
            self.mel_cfg.update(mel_cfg)
        hop = self.mel_cfg["hop_size"]
        k1, k2, k3 = jax.random.split(init_rng, 3)
        mel0 = jnp.zeros((1, segment_size // hop, self.mel_cfg["num_mels"]))
        wav0 = jnp.zeros((1, segment_size))
        gen_p = jax.jit(gen.init)(k1, mel0)["params"]
        mpd_p = jax.jit(mpd.init)(k2, wav0, wav0)["params"]
        msd_p = jax.jit(msd.init)(k3, wav0, wav0)["params"]
        self.tx_g, self.tx_d = make_optimizers(
            learning_rate, adam_b1, adam_b2, lr_decay, steps_per_epoch)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.state = replicate(
            self.mesh,
            GANTrainState.create(gen_p, mpd_p, msd_p, self.tx_g, self.tx_d),
        )
        self.train_step = make_gan_train_step(
            gen, mpd, msd, self.tx_g, self.tx_d, self.mel_cfg, bf16=bf16)
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
        from tpu_speech.utils.profiling import StepTimer

        self.timer = StepTimer()
        self.iteration = 0
        self._val_fn = None

    def resume_if_exists(self) -> bool:
        restored = self.ckpt.restore_latest(jax.device_get(self.state))
        if restored is None:
            return False
        self.state = replicate(self.mesh, restored)
        self.iteration = int(restored.step)
        return True

    def train_epoch(self, loader, epoch: int, base_rng: jax.Array):
        agg = {"loss_gen": [], "loss_disc": [], "mel_error": []}
        t0 = time.time()
        n_samples = 0
        for batch in loader:
            rng = jax.random.fold_in(base_rng, self.iteration)
            n_samples += int(np.asarray(batch["wav"]).shape[0])
            batch = shard_batch(self.mesh, batch)
            self.timer.tick("step")
            self.state, metrics = self.train_step(self.state, batch, rng)
            m = jax.device_get(metrics)
            self.timer.tock("step")
            if self.tb is not None and self.iteration % 10 == 0:
                for k, v in m.items():
                    self.tb.add_scalar(f"training/{k}", float(v), self.iteration)
                st = self.timer.summary().get("step")
                if st is not None:
                    self.tb.add_scalar("training/step_time_ms",
                                       st["mean_s"] * 1e3, self.iteration)
            for k in agg:
                agg[k].append(float(m[k]))
            self.iteration += 1

        dt = time.time() - t0
        msg = (
            "Epoch %d: gen loss = %.3f | disc loss = %.3f "
            "| mel error = %.4f | %.1f utt/s\n"
            % (
                epoch,
                float(np.mean(agg["loss_gen"])) if agg["loss_gen"] else float("nan"),
                float(np.mean(agg["loss_disc"])) if agg["loss_disc"] else float("nan"),
                float(np.mean(agg["mel_error"])) if agg["mel_error"] else float("nan"),
                n_samples / max(dt, 1e-9),
            )
        )
        if self.primary:
            with open(os.path.join(self.log_dir, "train.log"), "a") as f:
                f.write(msg)
        if epoch % self.save_every == 0 and self.primary:
            self.ckpt.save(self.iteration, jax.device_get(self.state),
                               blocking=False)
        return {k: float(np.mean(v)) if v else float("nan")
                for k, v in agg.items()}

    def validate(self, loader, max_batches: int = 8, log_audio: int = 0):
        """Full-band mel L1 on held-out segments; optionally logs the first
        `log_audio` generated waveforms to TB."""
        if self._val_fn is None:
            loss_cfg = dict(self.mel_cfg,
                            fmax=self.mel_cfg["sampling_rate"] / 2.0)

            @jax.jit
            def val_fn(gen_params, wav, mel):
                y_g = self.gen.apply({"params": gen_params}, mel)
                err = jnp.mean(jnp.abs(
                    mel_spectrogram(y_g, **loss_cfg)
                    - mel_spectrogram(wav, **loss_cfg)))
                return err, y_g

            self._val_fn = val_fn
        errs, logged = [], 0
        for i, batch in enumerate(loader):
            if i >= max_batches:
                break
            wav = jnp.asarray(batch["wav"])
            mel = batch.get("mel")
            mel = (jnp.asarray(mel) if mel is not None
                   else mel_spectrogram(wav, **self.mel_cfg))
            err, y_g = jax.device_get(
                self._val_fn(self.state.gen, wav, mel))
            errs.append(float(err))
            if self.tb is not None and logged < log_audio:
                for j in range(min(log_audio - logged, y_g.shape[0])):
                    self.tb.add_audio(
                        f"validation/gen_audio_{logged}",
                        np.asarray(y_g[j])[:, None], self.iteration,
                        sample_rate=self.mel_cfg["sampling_rate"],
                    )
                    logged += 1
        val = float(np.mean(errs)) if errs else float("nan")
        if self.tb is not None:
            self.tb.add_scalar("validation/mel_error", val, self.iteration)
        return val
