"""Tiny STREAMING smoke-test config: the spiral_tiny_test miniature model
rebuilt streaming-trainable (causal convs + chunked attention) so the
streaming finetune/test CLI paths run in seconds. See
spiral_base_finetune_ls100_char_streaming.py for the production recipe."""

import dataclasses
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import spiral_tiny_test as _base
from tpu_speech.models.spiral.encoder import StreamingCfg

config_name = "st2vec_tiny_stream"

# 32 spec frames (0.32 s) per chunk; the tiny encoder subsamples 8x, so a
# streaming step emits 4 encoder frames with 2 chunks of left context
encoder = dataclasses.replace(
    _base.encoder, streaming=StreamingCfg(chunk_frames=32, left_chunks=2)
)

model = dataclasses.replace(_base.model, encoder=encoder)

cfg = dataclasses.replace(
    _base.cfg, name=config_name, model=model,
    exp_manager=dataclasses.replace(_base.cfg.exp_manager, name=config_name),
)
