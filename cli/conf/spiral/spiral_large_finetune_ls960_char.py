"""SPIRAL-large LS-960 CTC finetune, char targets (reference
spiral_large_finetune_ls960_char.py): 320k steps on the full 960h set."""

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
    mask_prob=0.5, mask_length=12,
    mask_channel_prob=0.3, mask_channel_length=20,
)

cfg = finetune_run_config(
    config_name, encoder, char_decoder(norm_type="ln"),
    labels=DEFAULT_CHAR_LABELS,
    train_manifest="manifest_json/librivox-train-clean-100.json,manifest_json/librivox-train-clean-360.json,manifest_json/librivox-train-other-500.json",
    batch_size=10, max_duration=26.0, max_steps=320000,
    expected_gpu_num=16, freeze_finetune_updates=4000, max_epochs=380,
)
