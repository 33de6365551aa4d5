"""Tiny smoke-test config (CI / local verification): miniature encoder and
short crops so the full pretrain/finetune/test paths run in seconds."""

from tpu_speech.models.spiral.encoder import (
    ConvLayerCfg,
    ConvTransformerBlockCfg,
    TransformerCfg,
)
from tpu_speech.models.spiral.st2vec import ST2VecConfig
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

config_name = "st2vec_tiny"
sample_rate = 16000

_blocks = (
    ConvTransformerBlockCfg(
        conv_layers=(
            ConvLayerCfg(24, (5,), (2,), "ln", "relu", 0.0),
            ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),
        ),
        transformer=TransformerCfg(1, 32, 64, 4, 0.0, conv_pos=8, conv_pos_groups=4),
    ),
    ConvTransformerBlockCfg(
        conv_layers=(ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),),
        transformer=TransformerCfg(1, 32, 64, 4, 0.0, conv_pos=8, conv_pos_groups=4),
    ),
)

encoder = ST2VecConfig(
    blocks=_blocks,
    num_features=16,
    projector_dim=16,
    predictor_convs=(ConvLayerCfg(16, (3,), (1,), "bn", "relu", 0.0, bias=None),),
    n_negatives=4,
    max_shift=2,
    target_momentum_steps=100,
)

model = SpiralModelConfig(
    encoder=encoder,
    labels=DEFAULT_CHAR_LABELS,
    freeze_finetune_updates=1,
    optim=AdamWParams(
        lr=1e-3,
        sched=SchedParams(name="CosineAnnealing", warmup_steps=2, max_steps=100),
    ),
    train_ds=AudioDatasetConfig(
        manifest_filepath="manifest.json", sample_rate=sample_rate,
        batch_size=2, crop_size=16000, shuffle=True, num_workers=2,
        max_duration=1.0,
    ),
    validation_ds=AudioDatasetConfig(
        manifest_filepath="manifest.json", sample_rate=sample_rate,
        batch_size=2, shuffle=False, max_duration=1.0,
    ),
    test_ds=AudioDatasetConfig(
        manifest_filepath="manifest.json", sample_rate=sample_rate,
        batch_size=2, shuffle=False, max_duration=1.0,
    ),
)

cfg = RunConfig(
    name=config_name,
    model=model,
    trainer=TrainerConfig(max_epochs=1, max_steps=4,
                          val_check_interval_epochs=1),
    exp_manager=ExpManagerConfig(name=config_name),
)
