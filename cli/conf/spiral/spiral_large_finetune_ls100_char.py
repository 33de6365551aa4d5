"""SPIRAL-large LS-100 CTC finetune, char targets (reference
spiral_large_finetune_ls100_char.py): upsampling char head with appended
blank, heavier masking than base."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import dataclasses

from _common import char_decoder, finetune_run_config, finetune_transformer_overrides
from tpu_speech.models.spiral.st2vec import spiral_large_config
from tpu_speech.text.tokenizers import DEFAULT_CHAR_LABELS

config_name = "ctc_finetune"

_enc = spiral_large_config()
encoder = dataclasses.replace(
    _enc,
    blocks=finetune_transformer_overrides(_enc.blocks, layerdrop_first=0.1),
    mask_prob=0.5, mask_length=4,
    mask_channel_prob=0.3, mask_channel_length=20,
)

cfg = finetune_run_config(
    config_name, encoder, char_decoder(norm_type="ln"),
    labels=DEFAULT_CHAR_LABELS,
    batch_size=18, max_duration=42.0, max_steps=80000,
    expected_gpu_num=8, freeze_finetune_updates=2000, max_epochs=393,
)
