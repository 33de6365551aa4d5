"""Config dataclasses (the reference's structured-config surface).

Mirrors the NeMo config inventory
(SPIRAL/nemo/core/config/*, collections/asr/models/configs/common_config.py):
dataclass-as-experiment-file, composed in python config modules and frozen at
launch. Maps naturally onto frozen pytrees / static jit arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple


@dataclasses.dataclass
class AdamWParams:
    name: str = "adamw"
    lr: float = 1e-3
    eps: float = 1e-6
    betas: Tuple[float, float] = (0.9, 0.98)
    weight_decay: float = 0.01
    sched: Optional["SchedParams"] = None


@dataclasses.dataclass
class AdamParams:
    name: str = "adam"
    lr: float = 1e-3
    eps: float = 1e-8
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.0
    sched: Optional["SchedParams"] = None


@dataclasses.dataclass
class NovogradParams:
    """Reference core/optim/novograd.py defaults."""
    name: str = "novograd"
    lr: float = 1e-2
    eps: float = 1e-8
    betas: Tuple[float, float] = (0.95, 0.25)
    weight_decay: float = 0.0
    sched: Optional["SchedParams"] = None


@dataclasses.dataclass
class SGDParams:
    name: str = "sgd"
    lr: float = 1e-2
    momentum: float = 0.0
    weight_decay: float = 0.0
    sched: Optional["SchedParams"] = None


@dataclasses.dataclass
class SchedParams:
    name: str = "CosineAnnealing"
    warmup_steps: int = 0
    warmup_ratio: Optional[float] = None
    hold_ratio: Optional[float] = None
    max_steps: int = 100000
    min_lr: float = 0.0
    d_model: int = 512  # NoamAnnealing only


@dataclasses.dataclass
class AudioDatasetConfig:
    manifest_filepath: str = ""
    sample_rate: int = 16000
    batch_size: int = 24
    min_duration: float = 0.0
    max_duration: Optional[float] = None
    crop_size: Optional[int] = None
    shuffle: bool = True
    num_workers: int = 4
    noise_manifest: Optional[str] = None
    # tar-shard streaming variant (audio_to_text.py:798+); when set, the
    # manifest provides metadata and audio streams from these tar files
    tarred_audio_filepaths: Optional[str] = None
    shuffle_n: int = 0
    dup_factor: int = 1  # duplicate entries (reference dev_data_dup_factor)


@dataclasses.dataclass
class DecoderConfig:
    """ConvASRDecoder layout (reference ConvASRDecoderConfig,
    modules/conv_asr.py:214-360): conv stack + 1x1 vocab projection, with the
    char recipes adding 4x ProjUpsampling and an appended blank."""
    conv_layers: Any = None          # Tuple[ConvLayerCfg, ...]; None = default
    upsample_rate: Optional[int] = None
    upsample_filters: int = 512
    upsample_norm: Optional[str] = "ln"      # ProjUpsampling norm_type
    upsample_act: Optional[str] = "relu"     # ProjUpsampling act_func
    upsample_dropout: float = 0.1
    blank_pos: str = "vocab_first"   # or 'after_vocab_last'


@dataclasses.dataclass
class NoisePerturbConfig:
    """RandomNoisePerturbation recipe knobs (reference NoisePerturbConfig,
    spiral_base_pretrain_ls960_noise.py:214-223). manifest_path: JSON-lines
    noise manifest(s) (the reference uses a csv; format differs, role same)."""
    manifest_path: str = ""
    min_snr_db: float = 0.0
    max_snr_db: float = 30.0
    ratio: float = 0.5
    target_sr: int = 16000
    cache_noise: bool = True


@dataclasses.dataclass
class TrainerConfig:
    devices: int = -1  # -1: all visible
    max_epochs: int = 100
    max_steps: Optional[int] = None
    accumulate_grad_batches: int = 1
    # sequence parallelism: shard the time axis of activations over a 'seq'
    # mesh axis (parallel.mesh.seq_constrainer); devices must be divisible
    seq_parallel: int = 1
    log_every_n_steps: int = 50
    val_check_interval_epochs: int = 4


@dataclasses.dataclass
class ExpManagerConfig:
    name: str = "exp"
    explicit_log_dir: Optional[str] = None
    resume_if_exists: bool = True
    save_top_k: int = 5


@dataclasses.dataclass
class SpiralModelConfig:
    encoder: Any = None                 # ST2VecConfig
    optim: AdamWParams = dataclasses.field(default_factory=AdamWParams)
    train_ds: AudioDatasetConfig = dataclasses.field(default_factory=AudioDatasetConfig)
    validation_ds: Optional[AudioDatasetConfig] = None
    test_ds: Optional[AudioDatasetConfig] = None
    expected_gpu_num: int = 1
    logit_temp: float = 0.3
    labels: Optional[Sequence[str]] = None
    tokenizer_file: Optional[str] = None
    decoder: Optional[DecoderConfig] = None
    noise_perturb: Optional[NoisePerturbConfig] = None
    freeze_finetune_updates: int = 0
    pretrain_chkpt_path: Optional[str] = None
    use_teacher_encoder: bool = False
    grad_clip: Optional[float] = None
    precision: str = "fp32"  # 'fp32' | 'bf16' (mixed: params/opt fp32, compute bf16)
    # 'rbg' = XLA hardware bit generator (measured ~21 ms/step cheaper than
    # threefry at SPIRAL-base B=24 — dropout mask bits dominate); 'threefry'
    # = jax default splittable stream (bit-reproducible across backends)
    rng_impl: str = "rbg"


@dataclasses.dataclass
class RunConfig:
    name: str = "st2vec"
    model: SpiralModelConfig = dataclasses.field(default_factory=SpiralModelConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    exp_manager: ExpManagerConfig = dataclasses.field(default_factory=ExpManagerConfig)
