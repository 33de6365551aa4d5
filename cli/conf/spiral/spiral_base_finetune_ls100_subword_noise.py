"""SPIRAL-base LS-100 subword finetune with RandomNoise multi-condition
training (reference spiral_base_finetune_ls100_subword_noise.py)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import copy

from _common import dns_noise
from spiral_base_finetune_ls100_subword import cfg as _base_cfg, config_name  # noqa: F401

cfg = copy.deepcopy(_base_cfg)
cfg.model.noise_perturb = dns_noise(sample_rate=16000)
cfg.trainer.max_epochs = 380
