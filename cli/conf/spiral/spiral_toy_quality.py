"""Toy trains-to-quality config: a small-but-learnable SPIRAL on the
synthetic tone-word corpus (tests/toy_corpus.py). Used by the
trains-to-quality integration test (tests/test_spiral_quality.py) to drive
the REAL pretrain -> finetune -> test CLI paths to a quality metric — the
reference's de-facto integration test (spiral_pretrain.py:124-190)."""

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
    DecoderConfig,
    ExpManagerConfig,
    RunConfig,
    SchedParams,
    SpiralModelConfig,
    TrainerConfig,
)

config_name = "st2vec_toy"
sample_rate = 16000
crop_size = 12800  # one 0.8 s toy utterance exactly

_t = TransformerCfg(2, 48, 96, 4, 0.0, attention_dropout=0.0,
                    conv_pos=8, conv_pos_groups=4)
_blocks = (
    ConvTransformerBlockCfg(
        conv_layers=(
            ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),
            ConvLayerCfg(48, (5,), (2,), "ln", "relu", 0.0),
        ),
        transformer=_t,
    ),
    ConvTransformerBlockCfg(
        conv_layers=(ConvLayerCfg(48, (5,), (2,), "ln", "relu", 0.0),),
        transformer=_t,
    ),
)

encoder = ST2VecConfig(
    blocks=_blocks,
    num_features=32,
    projector_dim=24,
    predictor_convs=(
        ConvLayerCfg(24, (3,), (1,), "bn", "relu", 0.0, bias=None),
    ),
    n_negatives=8,
    max_shift=2,
    # light masking: toy utterances are 0.8 s (96 spec frames), so the
    # base recipe's 20-frame spans at p=0.5 would erase most of the words
    mask_prob=0.15,
    mask_length=6,
    mask_channel_prob=0.1,
    mask_channel_length=4,
    target_momentum=0.99,
    target_momentum_final=0.999,
    target_momentum_steps=300,
)

model = SpiralModelConfig(
    encoder=encoder,
    labels=DEFAULT_CHAR_LABELS,
    freeze_finetune_updates=0,
    decoder=DecoderConfig(
        conv_layers=(
            ConvLayerCfg(48, (5,), (1,), None, "relu", 0.0),
            ConvLayerCfg(48, (5,), (1,), None, "relu", 0.0),
        ),
        upsample_rate=4,
        upsample_filters=48,
        upsample_dropout=0.0,
    ),
    optim=AdamWParams(
        lr=2e-3,
        sched=SchedParams(name="CosineAnnealing", warmup_steps=20,
                          max_steps=600),
    ),
    train_ds=AudioDatasetConfig(
        manifest_filepath="manifest.json", sample_rate=sample_rate,
        batch_size=8, crop_size=crop_size, shuffle=True, num_workers=2,
        max_duration=0.81,
    ),
    validation_ds=AudioDatasetConfig(
        manifest_filepath="manifest.json", sample_rate=sample_rate,
        batch_size=8, shuffle=False, max_duration=0.81, num_workers=2,
    ),
    test_ds=AudioDatasetConfig(
        manifest_filepath="manifest.json", sample_rate=sample_rate,
        batch_size=8, shuffle=False, max_duration=0.81, num_workers=2,
    ),
)

cfg = RunConfig(
    name=config_name,
    model=model,
    # one device: the quality test measures LEARNING (loss/WER trajectories
    # calibrated for ~15 steps/epoch at batch 8); DP equivalence is covered
    # by the parallelism tests
    trainer=TrainerConfig(devices=1, max_epochs=10, max_steps=None,
                          val_check_interval_epochs=5),
    exp_manager=ExpManagerConfig(name=config_name),
)
