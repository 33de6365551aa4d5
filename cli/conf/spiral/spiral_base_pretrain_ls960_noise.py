"""SPIRAL-base LS-960 multi-condition pretraining: the base recipe plus
RandomNoise at SNR 0-30 dB on half the utterances (reference
spiral_base_pretrain_ls960_noise.py:214-223)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import copy

from _common import dns_noise
from spiral_base_pretrain_ls960 import cfg as _base_cfg, config_name  # noqa: F401

cfg = copy.deepcopy(_base_cfg)
cfg.model.noise_perturb = dns_noise(sample_rate=16000)
