"""SPIRAL-base LS-100 CTC finetune config, STREAMING mode (char labels).

Beyond-reference: same recipe as spiral_base_finetune_ls100_char.py but the
encoder is built streaming-trainable (encoder.StreamingCfg) — causal convs,
causal positional conv, block-chunked attention (1.28 s chunks, 2 chunks of
left context ≈ 3.84 s attention window), and causal cumulative featurizer
normalization. A model finetuned with this config serves through
StreamingTranscriber / `run_spiral.py --run_mode=test --streaming_eval`
with EXACT train/serve parity (tests/test_streaming.py). The reference
vendors fairseq incremental-state attention but never trains or serves with
it (SPIRAL/nemo/collections/asr/parts/multihead_attention.py:15-465).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import dataclasses

from _common import (
    char_decoder,
    finetune_run_config,
    finetune_transformer_overrides,
)
from tpu_speech.models.spiral.encoder import StreamingCfg
from tpu_speech.models.spiral.st2vec import spiral_base_config
from tpu_speech.text.tokenizers import DEFAULT_CHAR_LABELS

config_name = "ctc_finetune_streaming"

# 128 spec frames (10 ms hop) = 1.28 s per chunk; divisible by the 8x
# conv subsample, so each streaming step emits 16 encoder frames
_STREAM = StreamingCfg(chunk_frames=128, left_chunks=2)

_enc = spiral_base_config(streaming=_STREAM)
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
