"""SPIRAL-base LS-100 CTC finetune config (char labels).

Mirrors the reference recipe
(SPIRAL/examples/asr/conf/spiral/spiral_base_finetune_ls100_char.py): 80k
steps, AdamW 3e-5 polynomial-hold, encoder frozen for the first 2k updates,
lighter masking, finetune-time dropout bumps, and the char CTC head —
4x ProjUpsampling + 3 convs with the blank appended after the vocab."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import dataclasses

from _common import (
    char_decoder,
    finetune_run_config,
    finetune_transformer_overrides,
)
from tpu_speech.models.spiral.st2vec import spiral_base_config
from tpu_speech.text.tokenizers import DEFAULT_CHAR_LABELS

config_name = "ctc_finetune"

_enc = spiral_base_config()
encoder = dataclasses.replace(
    _enc,
    blocks=finetune_transformer_overrides(_enc.blocks),
    mask_prob=0.3,
    mask_length=4,
    mask_channel_prob=0.3,
    mask_channel_length=20,
)

cfg = finetune_run_config(
    config_name, encoder, char_decoder(norm_type=None),
    labels=DEFAULT_CHAR_LABELS,
    batch_size=14, max_duration=24.0, max_steps=80000,
    expected_gpu_num=8, freeze_finetune_updates=2000, max_epochs=320,
)
