"""SPIRAL-large Libri-Light (60k h) pretraining (reference
spiral_large_pretrain_librilight.py): 1024-d encoder, 500k steps,
batch 20/device, 256k-sample crops, AdamW 3e-3 cosine w/ 32k warmup,
EMA momentum 0.99 -> 0.999, recipe sized for 32 workers."""

from tpu_speech.models.spiral.st2vec import spiral_large_config
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
max_steps = 500000

model = SpiralModelConfig(
    encoder=spiral_large_config(target_momentum_steps=max_steps),
    optim=AdamWParams(
        lr=0.003, eps=1e-6, betas=(0.9, 0.98), weight_decay=0.01,
        sched=SchedParams(
            name="CosineAnnealing", warmup_steps=32000, max_steps=max_steps,
            min_lr=0.0,
        ),
    ),
    train_ds=AudioDatasetConfig(
        manifest_filepath=(
            "librilight_manifest_json/librilight_unlab600.json,"
            "librilight_manifest_json/librilight_unlab6k.json,"
            "librilight_manifest_json/librilight_unlab60k.json"
        ),
        sample_rate=sample_rate, batch_size=20, min_duration=2.0,
        crop_size=256000, shuffle=True, num_workers=4,
    ),
    validation_ds=AudioDatasetConfig(
        manifest_filepath="manifest_json/librivox-dev-clean.json",
        sample_rate=sample_rate, batch_size=20, min_duration=2.0,
        crop_size=256000, shuffle=False,
    ),
    test_ds=AudioDatasetConfig(
        manifest_filepath="manifest_json/librivox-test-clean.json",
        sample_rate=sample_rate, batch_size=20, min_duration=2.0,
        crop_size=256000, shuffle=False,
    ),
    expected_gpu_num=32,
)

cfg = RunConfig(
    name=config_name,
    model=model,
    trainer=TrainerConfig(max_epochs=700, max_steps=max_steps),
    exp_manager=ExpManagerConfig(name=config_name, save_top_k=5),
)
