"""SPIRAL-large LS-100 CTC finetune, subword targets (reference
spiral_large_finetune_ls100_subword.py)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import dataclasses

from _common import finetune_run_config, finetune_transformer_overrides, subword_decoder
from tpu_speech.models.spiral.st2vec import spiral_large_config

config_name = "ctc_finetune"

_enc = spiral_large_config()
encoder = dataclasses.replace(
    _enc,
    blocks=finetune_transformer_overrides(_enc.blocks, layerdrop_first=0.1),
    mask_prob=0.5, mask_length=4,
    mask_channel_prob=0.3, mask_channel_length=20,
)

cfg = finetune_run_config(
    config_name, encoder, subword_decoder(),
    tokenizer_file="vocab_spm/spm_1k_libri_unigram_bos_mask.model",
    batch_size=18, max_duration=42.0, max_steps=80000,
    expected_gpu_num=8, freeze_finetune_updates=2000, max_epochs=393,
)
