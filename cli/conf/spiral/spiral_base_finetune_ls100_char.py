"""SPIRAL-base LS-100 CTC finetune config (char labels).

Mirrors the reference finetune recipe
(SPIRAL/examples/asr/conf/spiral/spiral_base_finetune_ls100_subword.py) with
character labels (the subword variant needs a sentencepiece vocab file; pass
--tokenizer_file to run_spiral.py to use it): 80k steps, AdamW 3e-5
polynomial-hold, encoder frozen for the first 2k updates, lighter masking."""

import dataclasses

from tpu_speech.models.spiral.st2vec import spiral_base_config
from tpu_speech.text.tokenizers import DEFAULT_CHAR_LABELS
from tpu_speech.utils.config import (
    AdamWParams,
    AudioDatasetConfig,
    ExpManagerConfig,
    RunConfig,
    SchedParams,
    SpiralModelConfig,
    TrainerConfig,
)

config_name = "ctc_finetune"
sample_rate = 16000
max_steps = 80000
lr = 0.00003

encoder = dataclasses.replace(
    spiral_base_config(),
    mask_prob=0.3,
    mask_length=4,
    mask_channel_prob=0.3,
    mask_channel_length=20,
)

model = SpiralModelConfig(
    encoder=encoder,
    labels=DEFAULT_CHAR_LABELS,
    freeze_finetune_updates=2000,
    optim=AdamWParams(
        lr=lr, eps=1e-6, betas=(0.9, 0.98), weight_decay=0.01,
        sched=SchedParams(
            name="PolynomialHoldDecayAnnealing", warmup_ratio=0.1,
            hold_ratio=0.4, max_steps=max_steps, min_lr=lr * 0.05,
        ),
    ),
    train_ds=AudioDatasetConfig(
        manifest_filepath="manifest_json/librivox-train-clean-100.json",
        sample_rate=sample_rate, batch_size=14, shuffle=True,
        max_duration=24.0, num_workers=4,
    ),
    validation_ds=AudioDatasetConfig(
        manifest_filepath="manifest_json/librivox-dev-other.json",
        sample_rate=sample_rate, batch_size=14, shuffle=False,
    ),
    test_ds=AudioDatasetConfig(
        manifest_filepath="manifest_json/librivox-test-clean.json",
        sample_rate=sample_rate, batch_size=14, shuffle=False,
    ),
    expected_gpu_num=8,
)

cfg = RunConfig(
    name=config_name,
    model=model,
    trainer=TrainerConfig(max_epochs=320, max_steps=max_steps),
    exp_manager=ExpManagerConfig(name=config_name),
)
