"""GE2E speaker-encoder PyTorch checkpoint -> flax params converter.

Torch LSTM parameters (weight_ih_l{k}, weight_hh_l{k}, bias_*) map one-to-one
onto our LSTM module (same (4H, in) layout and i,f,g,o gate order).
Checkpoint format: {'model_state': state_dict} (encoder/inference.py load).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_speaker_encoder(state_dict: Dict, num_layers: int = 3) -> Dict:
    sd = state_dict.get("model_state", state_dict)
    lstm = {}
    for k in range(num_layers):
        lstm[f"w_ih_l{k}"] = _np(sd[f"lstm.weight_ih_l{k}"])
        lstm[f"w_hh_l{k}"] = _np(sd[f"lstm.weight_hh_l{k}"])
        lstm[f"b_ih_l{k}"] = _np(sd[f"lstm.bias_ih_l{k}"])
        lstm[f"b_hh_l{k}"] = _np(sd[f"lstm.bias_hh_l{k}"])
    params = {
        "lstm": lstm,
        "linear": {
            "kernel": _np(sd["linear.weight"]).T,
            "bias": _np(sd["linear.bias"]),
        },
    }
    extras = {}
    if "similarity_weight" in sd:
        extras["similarity_weight"] = _np(sd["similarity_weight"])
        extras["similarity_bias"] = _np(sd["similarity_bias"])
    return {"params": params, **({"ge2e": extras} if extras else {})}
