"""Shared helpers for the SPIRAL experiment configs (mirrors how the
reference experiment files mutate the imported encoder config in place,
e.g. spiral_base_finetune_ls100_char.py:38-50)."""

import dataclasses

from tpu_speech.models.spiral.encoder import ConvLayerCfg
from tpu_speech.utils.config import DecoderConfig, NoisePerturbConfig


def finetune_transformer_overrides(blocks, layerdrop_first=None,
                                   layerdrop_last=0.1):
    """Finetune-time regularization bumps applied to the encoder blocks:
    transformer dropout/activation_dropout -> 0.1 on every block, layerdrop
    -> 0.1 on the last (and on the first for the large recipes)."""
    out = []
    for i, blk in enumerate(blocks):
        t = blk.transformer
        if t is not None:
            if i == len(blocks) - 1:
                ld = layerdrop_last
            elif layerdrop_first is not None:
                ld = layerdrop_first
            else:
                ld = t.encoder_layerdrop
            t = dataclasses.replace(
                t, dropout=0.1, activation_dropout=0.1, encoder_layerdrop=ld
            )
        out.append(dataclasses.replace(blk, transformer=t))
    return tuple(out)


def char_decoder(norm_type=None) -> DecoderConfig:
    """Char CTC head: 4x ProjUpsampling + 3 convs + appended blank
    (spiral_base_finetune_ls100_char.py:57-72; the large variant uses 'ln'
    conv norm)."""
    return DecoderConfig(
        conv_layers=(
            ConvLayerCfg(512, (5,), (1,), norm_type, "relu", 0.1),
            ConvLayerCfg(512, (5,), (1,), norm_type, "relu", 0.1),
            ConvLayerCfg(512, (5,), (1,), norm_type, "relu", 0.1),
        ),
        upsample_rate=4,
        upsample_filters=512,
        blank_pos="after_vocab_last",
    )


def subword_decoder() -> DecoderConfig:
    """Subword CTC head: 2 plain convs, blank first
    (spiral_base_finetune_ls100_subword.py:59-70)."""
    return DecoderConfig(
        conv_layers=(
            ConvLayerCfg(512, (5,), (1,), None, "relu", 0.1),
            ConvLayerCfg(512, (5,), (1,), None, "relu", 0.1),
        ),
        blank_pos="vocab_first",
    )


def finetune_run_config(
    config_name,
    encoder,
    decoder,
    labels=None,
    tokenizer_file=None,
    train_manifest="manifest_json/librivox-train-clean-100.json",
    batch_size=14,
    max_duration=24.0,
    max_steps=80000,
    expected_gpu_num=8,
    freeze_finetune_updates=2000,
    max_epochs=320,
    noise_perturb=None,
    sample_rate=16000,
    lr=0.00003,
):
    """CTC finetune RunConfig skeleton shared by the char/subword x
    base/large x ls100/ls960 recipe matrix (reference
    spiral_*_finetune_*.py:74-135 — only the knobs passed here differ)."""
    from tpu_speech.utils.config import (
        AdamWParams,
        AudioDatasetConfig,
        ExpManagerConfig,
        RunConfig,
        SchedParams,
        SpiralModelConfig,
        TrainerConfig,
    )

    model = SpiralModelConfig(
        encoder=encoder,
        labels=labels,
        tokenizer_file=tokenizer_file,
        decoder=decoder,
        noise_perturb=noise_perturb,
        freeze_finetune_updates=freeze_finetune_updates,
        optim=AdamWParams(
            lr=lr, eps=1e-6, betas=(0.9, 0.98), weight_decay=0.01,
            sched=SchedParams(
                name="PolynomialHoldDecayAnnealing", warmup_ratio=0.1,
                hold_ratio=0.4, max_steps=max_steps, min_lr=lr * 0.05,
            ),
        ),
        train_ds=AudioDatasetConfig(
            manifest_filepath=train_manifest,
            sample_rate=sample_rate, batch_size=batch_size, shuffle=True,
            max_duration=max_duration, num_workers=4,
        ),
        validation_ds=AudioDatasetConfig(
            manifest_filepath="manifest_json/librivox-dev-other.json",
            sample_rate=sample_rate, batch_size=batch_size, shuffle=False,
        ),
        test_ds=AudioDatasetConfig(
            manifest_filepath="manifest_json/librivox-test-clean.json",
            sample_rate=sample_rate, batch_size=batch_size, shuffle=False,
        ),
        expected_gpu_num=expected_gpu_num,
    )
    return RunConfig(
        name=config_name,
        model=model,
        trainer=TrainerConfig(max_epochs=max_epochs, max_steps=max_steps),
        exp_manager=ExpManagerConfig(name=config_name),
    )


def dns_noise(noise_dir: str = "/path/to/noise_data",
              sample_rate: int = 16000) -> NoisePerturbConfig:
    """Multi-condition training noise source (NoisePerturbConfig,
    spiral_base_pretrain_ls960_noise.py:214-223). Point manifest_path at a
    JSON-lines manifest of the DNS noise set."""
    return NoisePerturbConfig(
        manifest_path=noise_dir + "/noise/ms_dns_train.json",
        min_snr_db=0.0,
        max_snr_db=30.0,
        ratio=0.5,
        target_sr=sample_rate,
        cache_noise=True,
    )
