"""SPIRAL-base LS-100 CTC finetune, subword (sentencepiece) targets
(reference spiral_base_finetune_ls100_subword.py): plain 2-conv decoder with
blank_pos='vocab_first'; pass --tokenizer_file with the spm model
(vocab_spm/spm_1k_libri_unigram_bos_mask analog)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import dataclasses

from _common import finetune_run_config, finetune_transformer_overrides, subword_decoder
from tpu_speech.models.spiral.st2vec import spiral_base_config

config_name = "ctc_finetune"

_enc = spiral_base_config()
encoder = dataclasses.replace(
    _enc,
    blocks=finetune_transformer_overrides(_enc.blocks),
    mask_prob=0.3, mask_length=4,
    mask_channel_prob=0.3, mask_channel_length=20,
)

cfg = finetune_run_config(
    config_name, encoder, subword_decoder(),
    tokenizer_file="vocab_spm/spm_1k_libri_unigram_bos_mask.model",
    batch_size=14, max_duration=24.0, max_steps=80000,
    expected_gpu_num=8, freeze_finetune_updates=2000, max_epochs=320,
)
