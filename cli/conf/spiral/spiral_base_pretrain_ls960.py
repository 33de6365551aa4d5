"""SPIRAL-base LibriSpeech-960h pretraining config.

Mirrors the reference recipe
(SPIRAL/examples/asr/conf/spiral/spiral_base_pretrain_ls960.py): 200k steps,
batch 24/device, 250k-sample crops, AdamW 3e-3 cosine w/ 32k warmup, EMA
teacher momentum 0.995 -> 1.0 cosine."""

from tpu_speech.models.spiral.st2vec import spiral_base_config
from tpu_speech.utils.config import (
    AdamWParams,
    AudioDatasetConfig,
    ExpManagerConfig,
    RunConfig,
    SchedParams,
    SpiralModelConfig,
    TrainerConfig,
)

config_name = "st2vec"
sample_rate = 16000
max_steps = 200000

model = SpiralModelConfig(
    encoder=spiral_base_config(target_momentum_steps=max_steps),
    optim=AdamWParams(
        lr=0.003, eps=1e-6, betas=(0.9, 0.98), weight_decay=0.01,
        sched=SchedParams(
            name="CosineAnnealing", warmup_steps=32000, max_steps=max_steps,
            min_lr=0.0,
        ),
    ),
    train_ds=AudioDatasetConfig(
        manifest_filepath=(
            "manifest_json/librivox-train-clean-100.json,"
            "manifest_json/librivox-train-clean-360.json,"
            "manifest_json/librivox-train-other-500.json"
        ),
        sample_rate=sample_rate, batch_size=24, min_duration=2.0,
        crop_size=250000, shuffle=True, num_workers=4,
    ),
    validation_ds=AudioDatasetConfig(
        manifest_filepath="manifest_json/librivox-dev-clean.json",
        sample_rate=sample_rate, batch_size=24, min_duration=2.0,
        crop_size=250000, shuffle=False,
    ),
    test_ds=AudioDatasetConfig(
        manifest_filepath="manifest_json/librivox-test-clean.json",
        sample_rate=sample_rate, batch_size=24, min_duration=2.0,
        crop_size=250000, shuffle=False,
    ),
    expected_gpu_num=16,
)

cfg = RunConfig(
    name=config_name,
    model=model,
    trainer=TrainerConfig(max_epochs=280, max_steps=max_steps),
    exp_manager=ExpManagerConfig(name=config_name, save_top_k=5),
)
