"""HiFi-GAN vocoder training CLI.

The reference vendors HiFi-GAN inference-only (Grad-TTS/hifi-gan/models.py;
SURVEY §2.1 "training code not wired") and points users at the upstream
recipe; here that recipe is a first-class trainer: generator + MPD/MSD
adversarial training with feature-matching and on-device mel loss, the
published V1 config surface (same JSON keys as checkpts/hifigan-config.json),
versioned run dirs, TB, checkpoints, resume. Supports --fine_tuning with
acoustic-model mels (e.g. Grad-TTS outputs) like the upstream flag.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from tpu_speech.data.hifigan import (
    MelAudioBatchCollate,
    MelAudioDataset,
    load_wav_files,
)
from tpu_speech.data.loader import DataLoader
from tpu_speech.models.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from tpu_speech.train.hifigan import HiFiGANTrainer


def build_generator(h: dict) -> Generator:
    return Generator(
        resblock=str(h.get("resblock", "1")),
        upsample_rates=tuple(h.get("upsample_rates", (8, 8, 2, 2))),
        upsample_kernel_sizes=tuple(
            h.get("upsample_kernel_sizes", (16, 16, 4, 4))),
        upsample_initial_channel=int(h.get("upsample_initial_channel", 512)),
        resblock_kernel_sizes=tuple(h.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in h.get(
                "resblock_dilation_sizes", ((1, 3, 5),) * 3)),
    )


def mel_cfg_from(h: dict) -> dict:
    return dict(
        n_fft=int(h.get("n_fft", 1024)),
        num_mels=int(h.get("num_mels", 80)),
        sampling_rate=int(h.get("sampling_rate", 22050)),
        hop_size=int(h.get("hop_size", 256)),
        win_size=int(h.get("win_size", 1024)),
        fmin=float(h.get("fmin", 0.0)),
        fmax=float(h.get("fmax", 8000.0)),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True,
                   help="HiFi-GAN JSON config (hifigan-config.json keys)")
    p.add_argument("--input_wavs_dir", type=str, default="")
    p.add_argument("--input_training_file", type=str, required=True)
    p.add_argument("--input_validation_file", type=str, default=None)
    p.add_argument("--input_mels_dir", type=str, default=None)
    p.add_argument("--fine_tuning", action="store_true")
    p.add_argument("--log_dir", type=str, default="logs/hifigan")
    p.add_argument("--training_epochs", type=int, default=100)
    p.add_argument("--validation_interval", type=int, default=5)
    p.add_argument("--resume_if_exists", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--num_workers", type=int, default=4)
    args = p.parse_args()

    with open(args.config, encoding="utf-8") as f:
        h = json.load(f)
    mel_cfg = mel_cfg_from(h)
    segment = int(h.get("segment_size", 8192))
    batch_size = int(h.get("batch_size", 16))

    train_files = load_wav_files(args.input_training_file, args.input_wavs_dir)
    train_ds = MelAudioDataset(
        train_files, segment_size=segment,
        sampling_rate=mel_cfg["sampling_rate"],
        fine_tuning=args.fine_tuning, input_mels_dir=args.input_mels_dir,
        hop_size=mel_cfg["hop_size"], seed=int(h.get("seed", 1234)),
    )
    loader = DataLoader(train_ds, batch_size, MelAudioBatchCollate(),
                        num_workers=args.num_workers)
    val_loader = None
    if args.input_validation_file:
        val_ds = MelAudioDataset(
            load_wav_files(args.input_validation_file, args.input_wavs_dir),
            segment_size=segment, sampling_rate=mel_cfg["sampling_rate"],
            fine_tuning=args.fine_tuning, input_mels_dir=args.input_mels_dir,
            hop_size=mel_cfg["hop_size"],
        )
        val_loader = DataLoader(val_ds, min(batch_size, len(val_ds)),
                                MelAudioBatchCollate(), shuffle=False,
                                num_workers=1)

    from tpu_speech.utils.exp_manager import ExpManager

    exp = ExpManager(name="hifigan", explicit_log_dir=args.log_dir,
                     resume_if_exists=args.resume_if_exists)

    trainer = HiFiGANTrainer(
        build_generator(h), MultiPeriodDiscriminator(),
        MultiScaleDiscriminator(), jax.random.PRNGKey(int(h.get("seed", 1234))),
        log_dir=args.log_dir, mel_cfg=mel_cfg,
        learning_rate=float(h.get("learning_rate", 2e-4)),
        adam_b1=float(h.get("adam_b1", 0.8)),
        adam_b2=float(h.get("adam_b2", 0.99)),
        lr_decay=float(h.get("lr_decay", 0.999)),
        steps_per_epoch=len(loader), segment_size=segment,
        bf16=args.bf16, exp=exp,
    )
    if args.resume_if_exists and trainer.resume_if_exists():
        print(f"resumed at iteration {trainer.iteration}")

    rng = jax.random.PRNGKey(int(h.get("seed", 1234)) + 1)
    start_epoch = trainer.iteration // max(len(loader), 1)
    for epoch in range(start_epoch, args.training_epochs):
        agg = trainer.train_epoch(loader, epoch, rng)
        print(f"epoch {epoch}: gen={agg['loss_gen']:.3f} "
              f"disc={agg['loss_disc']:.3f} mel={agg['mel_error']:.4f}")
        if val_loader is not None and epoch % args.validation_interval == 0:
            val = trainer.validate(val_loader, log_audio=2)
            print(f"epoch {epoch}: validation mel error = {val:.4f}")
    trainer.ckpt.save(trainer.iteration, jax.device_get(trainer.state))


if __name__ == "__main__":
    main()
